"""Unit tests for operators/joins.py: as-of join, bucketed range join,
sessionization, stratified sampling — semantics checked on hand-built
frames (plus a plan-shape assertion for the broadcast range join)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark.operators.joins import (
    asof_join,
    range_join_buckets,
    session_stats,
    sessionize,
    stratified_sample,
)


def ts(s: str):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S").replace(tzinfo=timezone.utc)


class TestAsofJoin:
    def test_latest_at_or_before(self, spark):
        left = spark.createDataFrame(
            [(1, ts("2024-01-01 10:00:00"), "e1"),
             (1, ts("2024-01-01 12:00:00"), "e2"),
             (2, ts("2024-01-01 11:00:00"), "e3")],
            "k: long, t: timestamp, eid: string",
        )
        right = spark.createDataFrame(
            [(1, ts("2024-01-01 09:00:00"), 10.0),
             (1, ts("2024-01-01 11:30:00"), 20.0),
             (2, ts("2024-01-01 12:00:00"), 30.0)],
            "k: long, t: timestamp, price: double",
        )
        out = {
            r["eid"]: r["asof_price"]
            for r in asof_join(left, right, "k", "t", "t", ["price"]).collect()
        }
        assert out == {"e1": 10.0, "e2": 20.0, "e3": None}

    def test_inclusive_same_timestamp(self, spark):
        left = spark.createDataFrame(
            [(1, ts("2024-01-01 10:00:00"), "e1")], "k: long, t: timestamp, eid: string"
        )
        right = spark.createDataFrame(
            [(1, ts("2024-01-01 10:00:00"), 5.0)], "k: long, t: timestamp, price: double"
        )
        [row] = asof_join(left, right, "k", "t", "t", ["price"]).collect()
        assert row["asof_price"] == 5.0

    def test_preserves_left_rowcount(self, spark):
        left = spark.range(50).select(
            (F.col("id") % 5).alias("k"),
            F.timestamp_seconds(F.col("id") * 60 + 1_700_000_000).alias("t"),
            F.col("id").alias("eid"),
        )
        right = spark.range(7).select(
            (F.col("id") % 5).alias("k"),
            F.timestamp_seconds(F.col("id") * 600 + 1_700_000_000).alias("t"),
            (F.col("id") * 1.5).alias("price"),
        )
        assert asof_join(left, right, "k", "t", "t", ["price"]).count() == 50


class TestRangeJoinBuckets:
    def _run(self, spark):
        facts = spark.createDataFrame(
            [(ts("2024-01-01 10:15:00"), 1.0),
             (ts("2024-01-01 11:45:00"), 2.0),
             (ts("2024-01-01 23:59:00"), 4.0)],
            "t: timestamp, v: double",
        )
        iv = spark.sql(
            "SELECT ws, ws + interval 2 hours AS we FROM (SELECT explode(sequence("
            "timestamp'2024-01-01 00:00:00', timestamp'2024-01-01 23:00:00', "
            "interval 1 hour)) AS ws)"
        )
        return range_join_buckets(
            facts, iv, "t", "ws", "we",
            bucket=F.date_trunc("hour", F.col("t")),
            interval_buckets=F.expr("sequence(ws, we - interval 1 hour, interval 1 hour)"),
        )

    def test_each_fact_hits_both_overlapping_windows(self, spark):
        out = self._run(spark)
        # every event inside [ws, we) of 2 sliding windows (except edge-of-day)
        per_fact = {r["v"]: 0 for r in out.collect()}
        for r in out.collect():
            per_fact[r["v"]] += 1
        assert per_fact == {1.0: 2, 2.0: 2, 4.0: 2}

    def test_containment_exact(self, spark):
        for r in self._run(spark).collect():
            assert r["ws"] <= r["t"] < r["we"]

    def test_broadcast_in_plan(self, spark):
        plan = self._run(spark)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        ev = spark.createDataFrame(
            [(1, ts("2024-01-01 10:00:00"), 1),
             (1, ts("2024-01-01 10:10:00"), 2),   # same session (10 min)
             (1, ts("2024-01-01 11:00:00"), 3),   # new session (50 min gap)
             (2, ts("2024-01-01 10:00:00"), 4)],
            "u: long, t: timestamp, eid: long",
        )
        out = sessionize(ev, "u", "t", 1800, "eid")
        seqs = {r["eid"]: r["session_seq"] for r in out.collect()}
        assert seqs == {1: 1, 2: 1, 3: 2, 4: 1}

    def test_exact_gap_is_same_session(self, spark):
        ev = spark.createDataFrame(
            [(1, ts("2024-01-01 10:00:00"), 1),
             (1, ts("2024-01-01 10:30:00"), 2)],  # exactly 1800s -> NOT new
            "u: long, t: timestamp, eid: long",
        )
        out = sessionize(ev, "u", "t", 1800, "eid")
        assert {r["session_seq"] for r in out.collect()} == {1}

    def test_session_stats_rollup(self, spark):
        ev = spark.createDataFrame(
            [(1, ts("2024-01-01 10:00:00"), 1, 10.0),
             (1, ts("2024-01-01 10:10:00"), 2, 5.0),
             (1, ts("2024-01-01 12:00:00"), 3, 1.0)],
            "u: long, t: timestamp, eid: long, v: double",
        )
        out = session_stats(ev, "u", "t", 1800, "eid", "v")
        rows = {r["session_seq"]: r for r in out.collect()}
        assert rows[1]["n_events"] == 2
        assert rows[1]["session_value"] == 15.0
        assert rows[1]["duration_s"] == 600
        assert rows[2]["n_events"] == 1
        assert rows[2]["duration_s"] == 0


class TestStratifiedSample:
    def test_deterministic_and_sized(self, spark):
        df = spark.range(200).select(
            (F.col("id") % 3).cast("string").alias("stratum"), F.col("id").alias("eid")
        )
        a = stratified_sample(df, "stratum", 10, "eid").collect()
        b = stratified_sample(df, "stratum", 10, "eid").collect()
        assert sorted(r["eid"] for r in a) == sorted(r["eid"] for r in b)
        per = {}
        for r in a:
            per[r["stratum"]] = per.get(r["stratum"], 0) + 1
        assert per == {"0": 10, "1": 10, "2": 10}

    def test_stable_under_growth(self, spark):
        # adding rows can only displace, never reorder, earlier picks:
        # the chosen set from 100 rows ⊇-relation with chosen from 200 rows
        # does not hold in general, but ranks of surviving rows stay ordered.
        df_small = spark.range(100).select(
            F.lit("s").alias("stratum"), F.col("id").alias("eid"))
        df_big = spark.range(200).select(
            F.lit("s").alias("stratum"), F.col("id").alias("eid"))
        small = [r["eid"] for r in stratified_sample(df_small, "stratum", 10, "eid")
                 .orderBy("sample_rank").collect()]
        big = [r["eid"] for r in stratified_sample(df_big, "stratum", 10, "eid")
               .orderBy("sample_rank").collect()]
        surviving = [e for e in small if e in set(big)]
        big_pos = {e: i for i, e in enumerate(big)}
        assert all(big_pos[a] < big_pos[b]
                   for a, b in zip(surviving, surviving[1:]))


class TestSaltedJoin:
    """salted_join: result parity with the plain equi-join."""

    def _frames(self, spark):
        big = spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(300)],  # key 0/1/2, skewed-ish
            ["row_id", "k", "v"],
        )
        small = spark.createDataFrame(
            [(0, "a"), (1, "b"), (2, "c"), (9, "never")], ["k", "label"]
        )
        return big, small

    def test_inner_parity(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.operators.scale import (
            salted_join,
        )
        from pyspark.sql import functions as F

        big, small = self._frames(spark)
        plain = {tuple(r) for r in big.join(small, "k").select("row_id", "label").collect()}
        salted = {tuple(r) for r in
                  salted_join(big, small, ["k"], salt_source=F.col("row_id"))
                  .select("row_id", "label").collect()}
        assert salted == plain and len(plain) == 300

    def test_left_parity_unmatched_null(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.operators.scale import (
            salted_join,
        )
        from pyspark.sql import functions as F

        big, small = self._frames(spark)
        big4 = big.withColumn("k", F.col("k") + 1)  # k=3 rows have no match
        plain = {tuple(r) for r in big4.join(small, "k", "left")
                 .select("row_id", "label").collect()}
        salted = {tuple(r) for r in
                  salted_join(big4, small, ["k"], salt_source=F.col("row_id"),
                              how="left").select("row_id", "label").collect()}
        assert salted == plain

    def test_preexisting_salt_column_rejected(self, spark):
        # a caller-owned _salt column would be silently overwritten then
        # dropped — must error, on either side
        from defi_etl_platform_sqlglot_implementation__spark.operators.scale import (
            salted_join,
        )
        from pyspark.sql import functions as F

        big, small = self._frames(spark)
        with pytest.raises(ValueError, match="_salt"):
            salted_join(big.withColumn("_salt", F.lit(1)), small, ["k"],
                        salt_source=F.col("row_id"))
        with pytest.raises(ValueError, match="_salt"):
            salted_join(big, small.withColumn("_salt", F.lit(1)), ["k"],
                        salt_source=F.col("row_id"))


class TestAsofForward:
    def test_forward_nearest_and_ties(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.operators.joins import (
            asof_join,
        )

        left = spark.createDataFrame(
            [(1, 10, 100), (1, 25, 101), (1, 40, 102), (2, 5, 200)],
            ["k", "ts", "lid"],
        )
        right = spark.createDataFrame(
            [(1, 10, 1.0), (1, 30, 2.0), (2, 1, 9.0)], ["k", "ts", "price"]
        )
        out = {r["lid"]: r["asof_price"]
               for r in asof_join(left, right, key="k", left_ts="ts",
                                  right_ts="ts", value_cols=["price"],
                                  direction="forward").collect()}
        assert out[100] == 1.0   # coincident ts=10 is inclusive
        assert out[101] == 2.0   # next at-or-after 25 is ts=30
        assert out[102] is None  # nothing at or after 40
        assert out[200] is None  # key 2 has only an earlier row

    def test_bad_direction_raises(self, spark):
        import pytest as _pytest

        from defi_etl_platform_sqlglot_implementation__spark.operators.joins import (
            asof_join,
        )

        df = spark.range(1).withColumnRenamed("id", "k")
        with _pytest.raises(ValueError):
            asof_join(df, df, key="k", left_ts="k", right_ts="k",
                      value_cols=[], direction="sideways")
