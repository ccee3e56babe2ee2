"""Bucketed co-located joins: the SCALE.md claim that big fact-fact joins
can pre-shuffle once (bucketBy) and then join with zero exchanges."""

import pytest
from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark.plans.introspect import plan_report


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # write orders & lineitem bucketed by the join key into a scratch
    # warehouse; saveAsTable is required for bucket metadata
    sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (spark.read.parquet(f"{sf}/orders.parquet")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("b_orders"))
    (spark.read.parquet(f"{sf}/lineitem.parquet")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("b_lineitem"))
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


class TestBucketedJoin:
    def test_join_without_shuffle(self, spark, warehouse):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            joined = (
                spark.table("b_orders")
                .join(spark.table("b_lineitem"),
                      F.col("o_orderkey") == F.col("l_orderkey"))
                .groupBy("o_orderstatus")
                .agg(F.sum("l_quantity").alias("qty"))
            )
            rep = plan_report(joined)
            # co-located: the join itself adds no Exchange; only the final
            # groupBy on a different key shuffles
            assert rep.sortmerge_joins == 1
            assert rep.exchanges <= 1
            rows = {r["o_orderstatus"]: r["qty"] for r in joined.collect()}
            assert len(rows) >= 2 and all(v > 0 for v in rows.values())
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


class TestPartitionedBronzePruning:
    """Executable form of the SCALE.md bronze claim: silver/bronze written
    partitioned by (event_type, date) lets downstream decode filters prune
    PARTITIONS (directory skip) rather than rows."""

    def test_partition_filter_prunes_directories(self, spark, tmp_path):
        sf = "/root/testdata/sf0.001"
        ev = (spark.read.parquet(f"{sf}/events.parquet")
              .withColumn("event_date",
                          __import__("pyspark.sql.functions",
                                     fromlist=["date_format"]).date_format(
                              "ts", "yyyy-MM-dd")))
        out = str(tmp_path / "bronze")
        (ev.write.mode("overwrite")
           .partitionBy("event_type", "event_date").parquet(out))

        read = spark.read.parquet(out).filter(
            "event_type = 'purchase'")
        plan = read._jdf.queryExecution().executedPlan().toString()
        # the predicate must appear as PartitionFilters on the scan (a
        # directory prune), NOT merely as a post-scan row Filter
        assert "PartitionFilters" in plan
        scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln]
        assert any("event_type" in ln for ln in scan_lines)
        # the scan line itself must carry the pushed partition predicate
        # (inputFiles() reflects the pre-filter relation, so the plan text
        # is the correct evidence of the directory prune)
        assert any("PartitionFilters" in ln and "event_type" in ln
                   for ln in scan_lines)
        # sanity: the data still arrives
        assert read.count() == (
            spark.read.parquet(f"{sf}/events.parquet")
            .filter("event_type = 'purchase'").count())
