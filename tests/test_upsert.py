"""Keyed upsert sink: latest-wins merge, idempotent replay, streaming wire."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark.streaming.upsert import (
    foreach_batch_upsert,
    latest_per_key,
    upsert_snapshot,
)


@pytest.fixture()
def snapdir():
    d = tempfile.mkdtemp(prefix="upsert-test-")
    path = f"{d}/snapshot"
    yield path
    shutil.rmtree(d, ignore_errors=True)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k: long, v: string, seq: long")


class TestLatestPerKey:
    def test_max_seq_wins(self, spark):
        df = _batch(spark, [(1, "old", 1), (1, "new", 2), (2, "only", 5)])
        out = {r["k"]: r["v"] for r in latest_per_key(df, ["k"], "seq").collect()}
        assert out == {1: "new", 2: "only"}


class TestUpsertSnapshot:
    def test_insert_then_update(self, spark, snapdir):
        upsert_snapshot(_batch(spark, [(1, "a", 1), (2, "b", 1)]), snapdir, ["k"], "seq")
        upsert_snapshot(_batch(spark, [(2, "b2", 2), (3, "c", 2)]), snapdir, ["k"], "seq")
        out = {r["k"]: (r["v"], r["seq"])
               for r in spark.read.parquet(snapdir).collect()}
        assert out == {1: ("a", 1), 2: ("b2", 2), 3: ("c", 2)}

    def test_replay_is_idempotent(self, spark, snapdir):
        b = _batch(spark, [(1, "x", 7), (2, "y", 7)])
        upsert_snapshot(b, snapdir, ["k"], "seq")
        first = sorted(map(tuple, spark.read.parquet(snapdir).collect()))
        upsert_snapshot(b, snapdir, ["k"], "seq")  # crash-replay of same batch
        second = sorted(map(tuple, spark.read.parquet(snapdir).collect()))
        assert first == second

    def test_recovers_interrupted_swap(self, spark, snapdir):
        import os

        upsert_snapshot(_batch(spark, [(1, "a", 1)]), snapdir, ["k"], "seq")
        # simulate a crash between the two swap renames: live dir gone,
        # merged data stranded under .__tmp_upsert__
        os.rename(snapdir, f"{snapdir}.__tmp_upsert__")
        upsert_snapshot(_batch(spark, [(2, "b", 2)]), snapdir, ["k"], "seq")
        out = {r["k"]: r["v"] for r in spark.read.parquet(snapdir).collect()}
        assert out == {1: "a", 2: "b"}

    def test_stale_seq_does_not_downgrade(self, spark, snapdir):
        upsert_snapshot(_batch(spark, [(1, "v5", 5)]), snapdir, ["k"], "seq")
        upsert_snapshot(_batch(spark, [(1, "v3", 3)]), snapdir, ["k"], "seq")
        [r] = spark.read.parquet(snapdir).collect()
        assert (r["v"], r["seq"]) == ("v5", 5)


class TestStreamingWire:
    def test_foreach_batch_upsert_from_stream(self, spark, snapdir):
        ckpt = tempfile.mkdtemp(prefix="upsert-ckpt-")
        try:
            stream = (
                spark.readStream.format("rate")
                .option("rowsPerSecond", "500").load()
                .select((F.col("value") % 5).alias("k"),
                        F.col("value").cast("string").alias("v"),
                        F.col("value").alias("seq"))
            )
            q = (stream.writeStream
                 .foreachBatch(foreach_batch_upsert(snapdir, ["k"], "seq"))
                 .option("checkpointLocation", ckpt)
                 .trigger(processingTime="1 seconds")
                 .start())
            try:
                import time

                # A rate source never drains, so processAllAvailable() would
                # block forever; poll the snapshot until every key landed.
                deadline = time.time() + 90
                while time.time() < deadline:
                    try:
                        if spark.read.parquet(snapdir).count() >= 5:
                            break
                    except Exception:
                        pass
                    time.sleep(1)
            finally:
                q.stop()
            rows = spark.read.parquet(snapdir).collect()
            assert len(rows) > 0
            # exactly one row per key; v mirrors seq so latest-wins is visible
            assert len(rows) == len({r["k"] for r in rows})
            assert all(r["v"] == str(r["seq"]) for r in rows)
            assert all(r["seq"] % 5 == r["k"] for r in rows)
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)
