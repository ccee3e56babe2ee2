"""Runtime-filter and adaptive-execution plan shapes — the two AQE/runtime
mechanisms that matter most at 100 TB:

* **Runtime bloom-filter pruning**: a selective filter on the build side of
  a shuffle join injects `might_contain(bloom)` on the probe side, so the
  big fact scan discards non-joining rows *before* the shuffle instead of
  shipping them.  (At sf0.1 locally both plans finish in seconds; the
  mechanism is what is being pinned down, thresholds forced low so it
  triggers at test scale.)

* **AQE skew-join splitting**: a hot key that would pin one reducer is
  split into advisory-sized sub-partitions at runtime (probe side
  duplicated), visible as `SortMergeJoin(skew=true)` + `AQEShuffleRead
  ... skewed` in the final adaptive plan.

Both are config-driven Catalyst behavior — the tests pin that our
engine-level session defaults don't break them, and document the exact
confs a 1000-executor deployment would set (see SCALE.md)."""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F


@contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


class TestBloomFilterPruning:
    def test_bloom_injected_on_probe_side(self, spark):
        with _confs(
            spark,
            **{
                "spark.sql.autoBroadcastJoinThreshold": "-1",
                "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
                "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
                "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
            },
        ):
            fact = (
                spark.range(0, 200_000)
                .withColumn("k", F.col("id") % 50_000)
                .withColumn("v", F.col("id") * 2)
            )
            dim = spark.range(0, 50_000).withColumn("k", F.col("id")).filter(
                F.col("k") % 500 == 0
            )
            j = fact.join(dim.select("k"), "k")
            plan = j._jdf.queryExecution().optimizedPlan().toString()
            assert "might_contain" in plan, plan
            # result unchanged by the filter: 100 surviving dim keys × 4 fact rows
            assert j.count() == 400

    def test_bloom_absent_without_selective_build_side(self, spark):
        with _confs(
            spark,
            **{
                "spark.sql.autoBroadcastJoinThreshold": "-1",
                "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            },
        ):
            a = spark.range(0, 10_000).withColumn("k", F.col("id"))
            b = spark.range(0, 10_000).withColumn("k", F.col("id"))
            plan = a.join(b, "k")._jdf.queryExecution().optimizedPlan().toString()
            # no selective predicate on either side -> no bloom worth building
            assert "might_contain" not in plan


class TestSkewJoinSplitting:
    def test_skewed_partition_split_at_runtime(self, spark):
        with _confs(
            spark,
            **{
                "spark.sql.autoBroadcastJoinThreshold": "-1",
                "spark.sql.shuffle.partitions": "8",
                "spark.sql.adaptive.enabled": "true",
                "spark.sql.adaptive.skewJoin.enabled": "true",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "10KB",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes": "10KB",
            },
        ):
            # 99% of rows hash to key 7 -> one reducer partition dwarfs the rest
            skew = (
                spark.range(0, 300_000)
                .withColumn(
                    "k",
                    F.when(F.col("id") % 100 < 99, F.lit(7)).otherwise(F.col("id") % 1000),
                )
                .withColumn("pay", F.concat(F.lit("x" * 80), F.col("id").cast("string")))
            )
            dim = spark.range(0, 2000).select(
                (F.col("id") % 1000).alias("k"), (F.col("id") * 3).alias("d")
            )
            out = skew.join(dim, "k", "inner")
            rows = out.count()

            # re-execute on the DataFrame's own QueryExecution so the final
            # adaptive plan is inspectable
            out2 = skew.join(dim, "k", "inner")
            n = len(out2.collect())
            assert n == rows == 600_000  # 2 dim rows per key (id%1000 twice)
            ep = out2._jdf.queryExecution().executedPlan().toString()
            assert "isFinalPlan=true" in ep
            assert "skew=true" in ep, ep[:2000]
            assert "skewed" in ep  # AQEShuffleRead ... skewed

    def test_skew_split_preserves_results(self, spark):
        # identical results with skew handling on vs off
        def build(onoff: str):
            with _confs(
                spark,
                **{
                    "spark.sql.autoBroadcastJoinThreshold": "-1",
                    "spark.sql.adaptive.skewJoin.enabled": onoff,
                    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
                    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "10KB",
                    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "10KB",
                },
            ):
                skew = spark.range(0, 50_000).withColumn(
                    "k", F.when(F.col("id") % 10 < 9, F.lit(3)).otherwise(F.col("id") % 100)
                )
                dim = spark.range(0, 100).withColumnRenamed("id", "k").withColumn(
                    "d", F.col("k") * 7
                )
                return (
                    skew.join(dim, "k", "inner")
                    .groupBy("k")
                    .agg(F.count("*").alias("n"), F.sum("d").alias("s"))
                    .collect()
                )

        on = {r["k"]: (r["n"], r["s"]) for r in build("true")}
        off = {r["k"]: (r["n"], r["s"]) for r in build("false")}
        assert on == off
