"""session_window streaming twin vs the oracled batch sessionization:
identical session membership, bounds, counts, and sums."""

from __future__ import annotations

from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark.operators.joins import session_stats
from defi_etl_platform_sqlglot_implementation__spark.streaming.sessions import (
    session_window_stats,
)

SF = "/root/testdata/sf0.001"


def _events(spark):
    from defi_etl_platform_sqlglot_implementation__spark.registry import t

    return t(spark, SF, "events")


def _key(rows):
    return {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]),
         r["n_events"], round(r["session_value"], 6))
        for r in rows
    }


class TestSessionWindowBatchParity:
    def test_matches_batch_sessionize(self, spark):
        ev = _events(spark)
        sw = session_window_stats(ev, "user_id", "ts", 1800, "value").collect()
        batch = session_stats(ev, "user_id", "ts", 1800, "event_id", "value").collect()
        assert _key(sw) == _key(batch)

    def test_streaming_mode_runs_with_watermark(self, spark, tmp_path):
        # the same expression as a real stream: file source, availableNow,
        # append mode (sessions finalize as the watermark passes them)
        src = str(tmp_path / "sess_in")
        ev = _events(spark).select("user_id", "ts", "value").limit(2000)
        ev.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(
            ev.schema
        ).parquet(src)
        out = session_window_stats(stream, "user_id", "ts", 1800, "value",
                                   watermark="30 minutes")
        q = (out.writeStream.format("memory").queryName("sess_test")
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM sess_test").collect()
        # append mode emits only watermark-closed sessions; every emitted
        # row must agree with the batch result for that (user, start)
        batch = {
            (r["user_id"], str(r["session_start"])):
            (r["n_events"], round(r["session_value"], 6))
            for r in session_window_stats(
                _events(spark).select("user_id", "ts", "value").limit(2000),
                "user_id", "ts", 1800, "value").collect()
        }
        assert len(got) > 0
        for r in got:
            k = (r["user_id"], str(r["session_start"]))
            assert batch[k] == (r["n_events"], round(r["session_value"], 6))
