"""Secondary-sort mapInPandas scan: cross-batch key carry, window-SQL
equivalence, and tiny-Arrow-batch stress (forces keys to straddle batch
boundaries)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark.operators.secondary_sort import (
    ordered_user_features,
)

BASE = 1_700_000_000


def _df(spark, n_users=7, per_user=23):
    rows = []
    eid = 0
    for u in range(n_users):
        for i in range(per_user):
            # irregular spacing + non-monotone insert order
            rows.append((eid, u, BASE + ((i * 37) % per_user) * 60 + u, float((eid * 31) % 97)))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s long, value double"
    ).withColumn("ts", F.timestamp_seconds("ts_s")).drop("ts_s")


def _window_twin(df):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return df.select(
        "user_id", "event_id", "ts",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias("delta_s"),
        F.row_number().over(w).cast("long").alias("seq"),
        F.max("value").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("running_max"),
    )


def _key(r):
    return (r["user_id"], r["event_id"])


class TestSecondarySort:
    def test_matches_window_sql(self, spark):
        df = _df(spark)
        got = {_key(r): r for r in ordered_user_features(df).collect()}
        want = {_key(r): r for r in _window_twin(df).collect()}
        assert set(got) == set(want)
        for k, w_ in want.items():
            g = got[k]
            assert g["delta_s"] == w_["delta_s"], k
            assert g["seq"] == w_["seq"], k
            assert g["running_max"] == w_["running_max"], k

    def test_cross_batch_carry(self, spark):
        # 2-row Arrow batches force every key to span many batches; the
        # carry dict must keep per-key state correct across edges.
        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
        try:
            df = _df(spark, n_users=3, per_user=11)
            got = {_key(r): r for r in ordered_user_features(df, num_partitions=1).collect()}
            want = {_key(r): r for r in _window_twin(df).collect()}
            assert got.keys() == want.keys()
            for k in want:
                assert got[k]["seq"] == want[k]["seq"]
                assert got[k]["delta_s"] == want[k]["delta_s"]
                assert got[k]["running_max"] == want[k]["running_max"]
        finally:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    def test_empty_input(self, spark):
        df = _df(spark).filter(F.lit(False))
        out = ordered_user_features(df)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == [
            "user_id", "event_id", "ts", "delta_s", "seq", "running_max",
        ]

    def test_no_per_group_materialization(self, spark):
        # plan shape: one exchange (repartition by key) + in-partition sort;
        # no Window node, no groupBy — the scan is a streaming pass.
        df = _df(spark)
        plan = ordered_user_features(df)._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan
        assert "Window" not in plan
        assert plan.count("Exchange") == 1
