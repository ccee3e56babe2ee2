"""Wave 23: repetition tail truncation, label balance plan, hash-shard
skew."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from defi_etl_platform_sqlglot_implementation__spark import registry_llm23  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _half_away(v):
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


class TestRepetitionTailTruncation:
    def test_pure_python_replay(self, spark):
        docs = {r.doc_id: r.text.split(" ")
                for r in spark.read.parquet(f"{SF}/documents.parquet")
                .select("doc_id", "text").collect()}
        expected = {}
        for d, toks in docs.items():
            n = len(toks)
            seen, trunc = set(), None
            for p in range(1, max(1, n - 2) + 1):
                s = " ".join(toks[p - 1:p + 2])
                if s in seen:
                    trunc = p
                    break
                seen.add(s)
            retained = (trunc - 1) if trunc else n
            expected[d] = (n, trunc, retained,
                           _half_away(1e4 * retained / n))
        got = {r.doc_id: (r.n_tokens, r.trunc_pos, r.retained_tokens,
                          r.retained_bp)
               for r in QUERIES["repetition_tail_truncation"](spark, SF)
               .collect()}
        assert got == expected
        assert len(got) == len(docs)

    def test_both_regimes_present(self, spark):
        rows = QUERIES["repetition_tail_truncation"](spark, SF).collect()
        assert any(r.trunc_pos is not None for r in rows)   # loops exist
        for r in rows:
            if r.trunc_pos is not None:
                assert 1 <= r.trunc_pos
                assert r.retained_tokens == r.trunc_pos - 1
            else:
                assert r.retained_tokens == r.n_tokens
                assert r.retained_bp == 10000


class TestLabelBalancePlan:
    def test_pure_python_replay(self, spark):
        per = defaultdict(int)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet") \
                .select("label").collect():
            per[r.label] += 1
        total, k = sum(per.values()), len(per)
        expected = {}
        for lbl, n in per.items():
            raw = _half_away(1e4 * total / (k * n))
            expected[lbl] = (n, _half_away(1e4 * n / total),
                             min(raw, 40000), raw > 40000)
        got = {r.label: (r.n, r.share_bp, r.resample_bp, r.capped)
               for r in QUERIES["label_balance_plan"](spark, SF).collect()}
        assert got == expected

    def test_factors_center_on_unity(self, spark):
        rows = QUERIES["label_balance_plan"](spark, SF).collect()
        assert len(rows) >= 2
        # uniform target: over-represented labels downsample, under-
        # represented upsample
        for r in rows:
            ideal = sum(x.n for x in rows) / len(rows)
            if r.n > ideal:
                assert r.resample_bp < 10000
            elif r.n < ideal:
                assert r.resample_bp > 10000


class TestHashShardSkew:
    def test_pure_python_replay(self, spark):
        per = defaultdict(lambda: [0, 0])
        for r in spark.read.parquet(f"{SF}/documents.parquet") \
                .select("doc_id", "text").collect():
            shard = int(hashlib.md5(str(r.doc_id).encode())
                        .hexdigest()[0], 16)
            per[shard][0] += 1
            per[shard][1] += len([x for x in r.text.split(" ") if x])
        total = sum(v[1] for v in per.values())
        expected = {s: (v[0], v[1], _half_away(1e4 * v[1] / total),
                        _half_away(1e4 * 16 * v[1] / total))
                    for s, v in per.items()}
        got = {r.shard: (r.n_docs, r.n_tokens, r.token_share_bp, r.skew_bp)
               for r in QUERIES["hash_shard_skew"](spark, SF).collect()}
        assert got == expected

    def test_shards_cover_and_balance(self, spark):
        rows = QUERIES["hash_shard_skew"](spark, SF).collect()
        assert {r.shard for r in rows} <= set(range(16))
        assert len(rows) >= 8                       # md5 spreads 500 docs
        assert sum(r.n_docs for r in rows) == 500
        # md5 is uniform: no shard should be wildly hot on this corpus
        for r in rows:
            assert 2000 <= r.skew_bp <= 30000
