"""Stream-stream interval join: watermarked streaming run must equal the
batch run of the same expression (which itself is DuckDB-oracled via the
``view_purchase_attribution`` registry entry)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark.streaming.stream_join import (
    view_purchase_join,
)

BASE = 1_700_000_000


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, r["user"], r["type"], float(r.get("value", 0.0)), r["ts"]) for i, r in enumerate(rows)],
        "event_id long, user_id long, event_type string, value double, ts_s long",
    ).withColumn("ts", F.timestamp_seconds("ts_s")).drop("ts_s")


def _fixture_rows():
    rows = []
    # user 1: view at t0, purchases at +10m (in), +29m59s (in), +30m (edge,
    # inclusive), +31m (out)
    rows.append({"user": 1, "type": "view", "ts": BASE})
    for dt in (600, 1799, 1800, 1860):
        rows.append({"user": 1, "type": "purchase", "value": dt * 1.0, "ts": BASE + dt})
    # user 2: purchase BEFORE the view (excluded: strict >), one after
    rows.append({"user": 2, "type": "purchase", "value": 5.0, "ts": BASE - 60})
    rows.append({"user": 2, "type": "view", "ts": BASE})
    rows.append({"user": 2, "type": "purchase", "value": 7.0, "ts": BASE + 120})
    # user 3: two views share one purchase (both attribute)
    rows.append({"user": 3, "type": "view", "ts": BASE})
    rows.append({"user": 3, "type": "view", "ts": BASE + 300})
    rows.append({"user": 3, "type": "purchase", "value": 9.0, "ts": BASE + 600})
    # user 4: purchase by a different user in-window (no cross-user match)
    rows.append({"user": 4, "type": "view", "ts": BASE})
    return rows


class TestBatchSemantics:
    def test_edges(self, spark):
        ev = _events(spark, _fixture_rows())
        out = view_purchase_join(
            ev.filter(F.col("event_type") == "view"),
            ev.filter(F.col("event_type") == "purchase"),
            max_delta_seconds=1800,
        ).collect()
        by_user = {}
        for r in out:
            by_user.setdefault(r["user_id"], []).append(r["delta_s"])
        assert sorted(by_user[1]) == [600, 1799, 1800]  # 1860 excluded, 1800 inclusive
        assert by_user[2] == [120]  # pre-view purchase excluded (strict >)
        assert sorted(by_user[3]) == [300, 600]  # both views attribute
        assert 4 not in by_user  # no cross-user attribution

    def test_empty_sides(self, spark):
        ev = _events(spark, _fixture_rows())
        empty = ev.filter(F.lit(False))
        assert (
            view_purchase_join(empty, ev.filter(F.col("event_type") == "purchase"), 1800).count()
            == 0
        )
        out = view_purchase_join(ev.filter(F.col("event_type") == "view"), empty, 1800)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == [
            "user_id", "view_id", "purchase_id", "view_ts", "purchase_ts",
            "purchase_value", "delta_s",
        ]


class TestStreamingParity:
    def test_streaming_matches_batch(self, spark, tmp_path):
        rows = _fixture_rows()
        ev = _events(spark, rows)
        want = sorted(
            (
                (r["user_id"], r["view_id"], r["purchase_id"], r["delta_s"], r["purchase_value"])
                for r in view_purchase_join(
                    ev.filter(F.col("event_type") == "view"),
                    ev.filter(F.col("event_type") == "purchase"),
                    1800,
                ).collect()
            )
        )

        # file-source streams: same rows as json lines, two filtered streams
        src = tmp_path / "stream_src"
        src.mkdir()
        lines = [
            json.dumps({"event_id": i, "user_id": r["user"], "event_type": r["type"],
                        "value": float(r.get("value", 0.0)), "ts_s": r["ts"]})
            for i, r in enumerate(rows)
        ]
        (src / "part0.json").write_text("\n".join(lines))

        raw = (
            spark.readStream.schema(
                "event_id long, user_id long, event_type string, value double, ts_s long"
            )
            .json(str(src))
            .withColumn("ts", F.timestamp_seconds("ts_s"))
            .drop("ts_s")
        )
        joined = view_purchase_join(
            raw.filter(F.col("event_type") == "view"),
            raw.filter(F.col("event_type") == "purchase"),
            max_delta_seconds=1800,
            watermark="2 hours",
        )
        q = (
            joined.writeStream.format("memory")
            .queryName("stream_join_test")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            got = sorted(
                (r["user_id"], r["view_id"], r["purchase_id"], r["delta_s"], r["purchase_value"])
                for r in spark.sql("SELECT * FROM stream_join_test").collect()
            )
        finally:
            q.stop()
        assert got == want
        assert len(got) == 6

    def test_streaming_requires_time_bound_for_state_cleanup(self, spark):
        # the range condition is what makes state bounded; document that an
        # unbounded stream-stream inner join without it is still *accepted*
        # by Spark (state grows forever) — our operator always passes the
        # bound, so just assert the plan carries the interval condition.
        ev = _events(spark, _fixture_rows())
        out = view_purchase_join(
            ev.filter(F.col("event_type") == "view"),
            ev.filter(F.col("event_type") == "purchase"),
            max_delta_seconds=1800,
        )
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "1800" in plan or "30 minutes" in plan
