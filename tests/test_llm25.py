"""Wave 25: curation_pipeline_v3 — the round-8 capstone funnel."""

from __future__ import annotations

from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark import registry_llm20  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark import registry_llm21  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark import registry_llm25  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


class TestCurationPipelineV3:
    def test_stage_flags_agree_with_standalone_gates(self, spark):
        """Each stage predicate must be byte-consistent with the gate it
        composes — the funnel can never disagree with its parts."""
        v3 = {r.doc_id: r for r in
              QUERIES["curation_pipeline_v3"](spark, SF).collect()}
        # boilerplate stage == wave-20 gate's removed share
        for r in QUERIES["boilerplate_block_removal"](spark, SF).collect():
            want = 1 if (r.n_tokens == 0 or r.removed_share_bp < 5000) else 0
            assert v3[r.doc_id].pass_boiler == want, r.doc_id
        # dup stage == wave-21 gate's verdict
        for r in QUERIES["dedup_minhash_incremental"](spark, SF).collect():
            assert v3[r.doc_id].pass_dup == (0 if r.is_dup_on_arrival else 1)

    def test_funnel_semantics(self, spark):
        rows = QUERIES["curation_pipeline_v3"](spark, SF).collect()
        assert len(rows) == 500                     # one row per doc
        kept = [r for r in rows if r.keep == 1]
        assert kept                                 # funnel keeps something
        for r in rows:
            flags = (r.pass_quality, r.pass_boiler, r.pass_dup,
                     r.pass_budget)
            assert r.keep == (1 if all(f == 1 for f in flags) else 0)
            if r.pass_quality == 0:
                assert r.first_fail == "quality"
            elif r.pass_boiler == 0:
                assert r.first_fail == "boilerplate"
            elif r.pass_dup == 0:
                assert r.first_fail == "dup"
            elif r.pass_budget == 0:
                assert r.first_fail == "budget"
            else:
                assert r.first_fail is None
        # a non-survivor of stages 1-3 can never pass the budget stage
        for r in rows:
            if 0 in (r.pass_quality, r.pass_boiler, r.pass_dup):
                assert r.pass_budget == 0
        # budget is binding over the survivor pool
        surv_tokens = sum(r.n_tokens for r in rows
                          if (r.pass_quality, r.pass_boiler, r.pass_dup)
                          == (1, 1, 1))
        kept_tokens = sum(r.n_tokens for r in kept)
        assert 0 < kept_tokens <= surv_tokens // 2

    def test_budget_stage_matches_wave20_device_on_survivors(self, spark):
        """Re-run the wave-20 selection in pure Python over the funnel's
        own stage-1..3 survivors and compare the keep set."""
        import math

        rows = QUERIES["curation_pipeline_v3"](spark, SF).collect()
        docs = {r.doc_id: r.text
                for r in spark.read.parquet(f"{SF}/documents.parquet")
                .select("doc_id", "text").collect()}
        surv = []
        for r in rows:
            if (r.pass_quality, r.pass_boiler, r.pass_dup) == (1, 1, 1):
                toks = [x for x in docs[r.doc_id].split(" ") if x]
                bp = int(math.floor(1e4 * len(set(toks)) / len(toks) + 0.5))
                surv.append((r.doc_id, len(toks), bp))
        budget = sum(n for _, n, _ in surv) // 2
        surv.sort(key=lambda x: (-x[2], x[0]))
        cum, want_keep = 0, set()
        for d, n, _ in surv:
            cum += n
            if cum <= budget:
                want_keep.add(d)
        got_keep = {r.doc_id for r in rows if r.keep == 1}
        assert got_keep == want_keep
