"""Wave 20: budget-constrained quality selection, boilerplate block
removal, k-means silhouette."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from defi_etl_platform_sqlglot_implementation__spark import registry_llm19  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark import registry_llm20  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
BLOCK = 10


def _half_away(v):
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def _docs(spark):
    return [(r.doc_id, [x for x in r.text.split(" ") if x], r.source)
            for r in spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text", "source").collect()]


class TestQualityTokenBudgetCutoff:
    def test_pure_python_replay(self, spark):
        docs = _docs(spark)
        scored = []
        for d, toks, _ in docs:
            n = len(toks)
            if n >= 1:
                scored.append((d, n, _half_away(1e4 * len(set(toks)) / n)))
        budget = sum(n for _, n, _ in scored) // 2
        scored.sort(key=lambda x: (-x[2], x[0]))
        expected, cum = {}, 0
        for d, n, bp in scored:
            cum += n
            expected[d] = (n, bp, 1 if cum <= budget else 0)
        for d, toks, _ in docs:
            if not toks:
                expected[d] = (0, None, 0)
        got = {r.doc_id: (r.n_tokens, r.uniq_bp, r.keep)
               for r in QUERIES["quality_token_budget_cutoff"](spark, SF)
               .collect()}
        assert got == expected
        assert len(got) == len(docs)            # one row per doc

    def test_budget_is_binding_and_ordered(self, spark):
        rows = QUERIES["quality_token_budget_cutoff"](spark, SF).collect()
        kept = sum(r.n_tokens for r in rows if r.keep == 1)
        total = sum(r.n_tokens for r in rows)
        assert 0 < kept <= total // 2           # binding, never over budget
        # selection is downward-closed in (score DESC, doc_id): no kept
        # doc may sort after a dropped doc with tokens
        ranked = sorted((r for r in rows if r.uniq_bp is not None),
                        key=lambda r: (-r.uniq_bp, r.doc_id))
        seen_drop = False
        for r in ranked:
            if r.keep == 0:
                seen_drop = True
            else:
                assert not seen_drop, r.doc_id


class TestBoilerplateBlockRemoval:
    @staticmethod
    def _blocks(toks):
        n = len(toks)
        out = []
        for i in range(1, math.ceil(n / BLOCK) + 1):
            seg = toks[(i - 1) * BLOCK: i * BLOCK]
            out.append((hashlib.md5(" ".join(seg).encode()).hexdigest(),
                        len(seg)))
        return out

    def test_pure_python_replay(self, spark):
        docs = _docs(spark)
        prev = defaultdict(set)
        for d, toks, src in docs:
            for h, _ in self._blocks(toks):
                prev[(src, h)].add(d)
        boiler = {k for k, v in prev.items() if len(v) >= 2}
        expected = {}
        for d, toks, src in docs:
            blocks = self._blocks(toks)
            hit = [(h, ln) for h, ln in blocks if (src, h) in boiler]
            n = len(toks)
            removed = sum(ln for _, ln in hit)
            expected[d] = (src, n, len(blocks), len(hit), removed,
                           _half_away(1e4 * removed / n) if n else None)
        got = {r.doc_id: (r.source, r.n_tokens, r.n_blocks,
                          r.n_boiler_blocks, r.removed_tokens,
                          r.removed_share_bp)
               for r in QUERIES["boilerplate_block_removal"](spark, SF)
               .collect()}
        assert got == expected
        assert any(v[3] > 0 for v in got.values())   # corpus has boilerplate

    def test_every_occurrence_removed(self, spark):
        """Unlike paragraph dedup there is NO canonical survivor: if a
        (source, hash) is boilerplate, every doc holding it reports it."""
        docs = _docs(spark)
        prev = defaultdict(set)
        for d, toks, src in docs:
            for h, _ in self._blocks(toks):
                prev[(src, h)].add(d)
        rows = {r.doc_id: r for r in
                QUERIES["boilerplate_block_removal"](spark, SF).collect()}
        for (src, h), ds in prev.items():
            if len(ds) >= 2:
                for d in ds:
                    assert rows[d].n_boiler_blocks >= 1, (src, h, d)


class TestKmeansSilhouette:
    def test_distances_agree_with_pruning_gate(self, spark):
        """a_micro must equal cluster_prototype_pruning's dist_micro —
        both run the same trained assign + micro-quantize device."""
        sil = {r.vec_id: (r.cluster_id, r.a_micro)
               for r in QUERIES["kmeans_silhouette"](spark, SF).collect()}
        prune = {r.vec_id: (r.cluster_id, r.dist_micro)
                 for r in QUERIES["cluster_prototype_pruning"](spark, SF)
                 .collect()}
        assert sil == prune

    def test_ratio_and_ordering_invariants(self, spark):
        rows = QUERIES["kmeans_silhouette"](spark, SF).collect()
        assert len(rows) == 500
        for r in rows:
            assert r.second_id != r.cluster_id
            assert 0 <= r.a_micro <= r.b_micro          # runner-up is farther
            g = max(r.a_micro, r.b_micro)
            want = 0 if g == 0 else _half_away(
                1e4 * (r.b_micro - r.a_micro) / g)
            assert r.silhouette_bp == want
            assert 0 <= r.silhouette_bp <= 10000
        # a useful quality signal is non-constant on the driver corpus
        assert len({r.silhouette_bp for r in rows}) > 10
