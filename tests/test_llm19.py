"""Wave 19: cluster-prototype pruning, span-corruption plan, doc prefix
containment."""

from __future__ import annotations

import hashlib
import itertools
import math
from collections import defaultdict


def _half_away(v):
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))

from defi_etl_platform_sqlglot_implementation__spark import registry_llm7  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark import registry_llm19  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


class TestClusterPrototypePruning:
    def test_distances_agree_with_outlier_gate(self, spark):
        """Same assign + micro-quantize device as
        cluster_distance_outliers — the two gates must report the SAME
        (vec_id, cluster_id, dist_micro) triples."""
        prune = {r.vec_id: (r.cluster_id, r.dist_micro)
                 for r in QUERIES["cluster_prototype_pruning"](spark, SF)
                 .collect()}
        outl = {r.vec_id: (r.cluster_id, r.dist_micro)
                for r in QUERIES["cluster_distance_outliers"](spark, SF)
                .collect()}
        assert prune == outl

    def test_keep_quota_and_rank_permutation(self, spark):
        rows = QUERIES["cluster_prototype_pruning"](spark, SF).collect()
        by_cluster = defaultdict(list)
        for r in rows:
            by_cluster[r.cluster_id].append(r)
        assert sum(len(v) for v in by_cluster.values()) == 500
        for cid, members in by_cluster.items():
            n = len(members)
            ranks = sorted(m.rank for m in members)
            assert ranks == list(range(1, n + 1)), cid
            kept = [m for m in members if m.keep == 1]
            assert len(kept) == (n + 1) // 2, cid       # ceil(n/2)
            # the kept set is exactly the lowest ranks (most central)
            assert {m.rank for m in kept} == set(range(1, (n + 1) // 2 + 1))
            # rank order respects (dist ASC, vec_id ASC)
            srt = sorted(members, key=lambda m: (m.dist_micro, m.vec_id))
            assert [m.rank for m in srt] == list(range(1, n + 1)), cid


class TestSpanCorruptionPlan:
    @staticmethod
    def _masked(doc_id, p):
        return hashlib.md5(f"mask:{doc_id}:{p}".encode()).hexdigest()[0] \
            in ("0", "1")

    def test_pure_python_replay(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "text").collect()
        expected = {}
        for r in docs:
            n = len([x for x in r.text.split(" ") if x])
            masked = [p for p in range(1, n + 1) if self._masked(r.doc_id, p)]
            spans = []
            for p in masked:
                if spans and spans[-1][1] == p - 1:
                    spans[-1][1] = p
                else:
                    spans.append([p, p])
            longest = max((b - a + 1 for a, b in spans), default=0)
            bp = _half_away(1e4 * len(masked) / n) if n else None
            expected[r.doc_id] = (n, len(masked), len(spans), longest, bp)
        got = {r.doc_id: (r.n_tokens, r.n_masked, r.n_spans,
                          r.longest_span, r.masked_bp)
               for r in QUERIES["span_corruption_plan"](spark, SF).collect()}
        assert got == expected
        assert len(got) == len(docs)              # one row per doc

    def test_mask_rate_near_eighth(self, spark):
        rows = QUERIES["span_corruption_plan"](spark, SF).collect()
        tot = sum(r.n_tokens for r in rows)
        masked = sum(r.n_masked for r in rows)
        # exact 1/8 Bernoulli: the corpus-level rate concentrates hard
        assert 0.09 < masked / tot < 0.16
        for r in rows:
            assert r.n_spans <= r.n_masked
            assert r.longest_span <= r.n_masked


class TestDocPrefixContainment:
    def test_brute_force_replay(self, spark):
        docs = {r.doc_id: [x for x in r.text.split(" ") if x]
                for r in spark.read.parquet(f"{SF}/documents.parquet")
                .select("doc_id", "text").collect()}
        dom = {d: tk for d, tk in docs.items() if len(tk) >= 4}
        expected = {}
        for a, b in itertools.permutations(dom, 2):
            ta, tb = dom[a], dom[b]
            if len(ta) < len(tb) and tb[:len(ta)] == ta:
                expected[(a, b)] = (len(ta), len(tb),
                                    _half_away(1e4 * len(ta) / len(tb)))
        got = {(r.contained_id, r.container_id):
               (r.n_contained, r.n_container, r.coverage_bp)
               for r in QUERIES["doc_prefix_containment"](spark, SF)
               .collect()}
        assert got == expected
        assert got                              # the corpus has such pairs

    def test_coverage_strictly_below_total(self, spark):
        for r in QUERIES["doc_prefix_containment"](spark, SF).collect():
            assert 4 <= r.n_contained < r.n_container
            assert 0 < r.coverage_bp < 10000
