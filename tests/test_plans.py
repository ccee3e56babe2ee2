"""Plan-shape assertions: the SCALE.md properties, machine-checked."""

from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark.plans.introspect import plan_report
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES
from defi_etl_platform_sqlglot_implementation__spark import registry_llm  # noqa: F401

SF = "/root/testdata/sf0.001"


class TestPushdownAndPruning:
    def test_pricing_summary_pushes_shipdate_filter(self, spark):
        rep = plan_report(QUERIES["pricing_summary"](spark, SF))
        assert any("l_shipdate" in f for f in rep.pushed_filters)
        # column pruning: scan must NOT read unused lineitem columns
        assert all("l_orderkey" not in s for s in rep.read_schemas)

    def test_between_scan_pushes_range(self, spark):
        rep = plan_report(QUERIES["block_range_scan"](spark, SF))
        joined = " ".join(rep.pushed_filters)
        assert "GreaterThanOrEqual(o_orderkey,1000" in joined
        assert "LessThanOrEqual(o_orderkey,5000" in joined

    def test_event_filter_pushes_isin(self, spark):
        rep = plan_report(QUERIES["transfer_volume_hourly"](spark, SF))
        assert any("In(event_type" in f for f in rep.pushed_filters)


class TestJoinStrategies:
    def test_dimension_joins_broadcast(self, spark):
        rep = plan_report(QUERIES["region_enrichment"](spark, SF))
        assert rep.broadcast_joins == 2
        assert rep.sortmerge_joins == 0

    def test_similarity_broadcasts_query_side(self, spark):
        # non-equi (vec_id != query_id) condition -> broadcast nested-loop,
        # still broadcasting the small query side, never shuffling the corpus
        rep = plan_report(QUERIES["similarity_topk"](spark, SF))
        assert rep.broadcast_joins + rep.broadcast_nl_joins >= 1
        assert rep.sortmerge_joins == 0


class TestAggregateShapes:
    def test_hash_aggregate_not_sort(self, spark):
        rep = plan_report(QUERIES["block_agg_daily"](spark, SF))
        assert rep.hash_aggregates >= 2  # partial + final
        assert rep.sort_aggregates == 0

    def test_codegen_covers_plan(self, spark):
        # AQE hides codegen spans pre-execution; inspect the static plan
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            rep = plan_report(QUERIES["swap_price_impact"](spark, SF))
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        assert rep.codegen_stages >= 1

    def test_decoder_is_shuffle_free(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.operators.transfers import (
            decode_transfers,
        )
        from defi_etl_platform_sqlglot_implementation__spark.schemas import ENVELOPE

        events = spark.createDataFrame([], ENVELOPE)
        rep = plan_report(decode_transfers(events))
        assert rep.shuffles == 0
