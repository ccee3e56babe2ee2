"""Wave 39: hashing-trick collision monitor + dedup/sample ordering."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm38  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry_llm38 import (
    _N_BUCKETS,
    _SAMPLE_HEX,
)

SF = "/root/testdata/sf0.001"


class TestFeatureHashCollisionReport:
    def test_pure_python_replay(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        tc = Counter()
        for text in docs.text:
            for w in text.split(" "):
                if w:
                    tc[w] += 1
        by_bucket = defaultdict(list)
        for tok, c in tc.items():
            b = int(hashlib.md5(tok.encode()).hexdigest()[:2], 16)
            by_bucket[b].append((c, tok))
        exp = {}
        for b, items in by_bucket.items():
            top = max(items, key=lambda x: (x[0], [-ord(ch) for ch in x[1]]))
            # rank order is (c DESC, tok ASC): recompute properly
            top_c = sorted(items, key=lambda x: (-x[0], x[1]))[0][0]
            total = sum(c for c, _ in items)
            exp[b] = (len(items), total, top_c,
                      round(1e4 * top_c / total))
        got = {r.bucket: (r.n_distinct_tokens, r.total_count, r.top_count,
                          r.top_share_bp)
               for r in QUERIES["feature_hash_collision_report"](spark, SF)
               .collect()}
        assert got == exp
        # the ~31-token sf0.001 vocab spreads collision-free over 256
        # buckets (every bucket holds exactly its own tokens) — the
        # monitor's job is to REPORT that; collision soup appears at
        # real vocab sizes (the sf1 sweep shows 169 occupied buckets)
        assert sum(v[0] for v in got.values()) == len(tc)
        assert all(0 <= b < _N_BUCKETS for b in got)
        assert all(v[2] <= v[1] for v in got.values())


class TestDedupSampleOrderEffect:
    @staticmethod
    def _union_find(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        return {n: find(n) for n in nodes}

    def test_union_find_replay_and_containment(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
            minhash_lsh_pairs,
        )

        docs_df = spark.read.parquet(f"{SF}/documents.parquet")
        pairs = [(r.d1, r.d2) for r in
                 minhash_lsh_pairs(docs_df, threshold=0.5)
                 .select("d1", "d2").collect()]
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        rows = [(int(r.doc_id), r.source) for r in
                docs.itertuples(index=False)]
        ids = [d for d, _ in rows]
        sampled = {d for d in ids
                   if hashlib.md5(f"ord:{d}".encode()).hexdigest()[0]
                   in _SAMPLE_HEX}
        g = self._union_find(pairs, ids)
        s = self._union_find(
            [(a, b) for a, b in pairs
             if a in sampled and b in sampled], sorted(sampled))
        exp = defaultdict(lambda: [0, 0, 0])
        for d, src in rows:
            a = exp[src]
            a[0] += 1
            a[1] += 1 if (d in sampled and g[d] == d) else 0
            a[2] += 1 if (d in sampled and s.get(d, d) == d) else 0
        got = {r.source: (r.n_docs, r.kept_dedup_first,
                          r.kept_sample_first, r.delta)
               for r in QUERIES["dedup_sample_order_effect"](spark, SF)
               .collect()}
        assert got == {src: (n, ka, kb, kb - ka)
                       for src, (n, ka, kb) in exp.items()}
        # containment theorem: sample-first keeps a superset
        assert all(r[3] >= 0 for r in got.values())
        # and the corpus (clusters crossing the sample boundary) shows
        # a real effect somewhere (4 docs at sf0.001)
        assert sum(r[3] for r in got.values()) > 0
