"""Streaming embedding-drift twin (wave 35): parity against the
DuckDB-oracled ``embedding_batch_drift`` gate, three ways — driver-loop
replay over the gate's rank spine, a real readStream/foreachBatch run,
and the single-batch edge (no previous batch -> no rows)."""

from __future__ import annotations

import json
import os
import time

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm22  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
N_EB = 4


def _batch_gate(spark):
    return {(r.batch, r.dim): (r.n_cur, r.sum_cur_micro, r.n_prev,
                               r.sum_prev_micro, r.drifted)
            for r in QUERIES["embedding_batch_drift"](spark, SF).collect()}


def _spine_batches(spark):
    """The gate's rank-based 4-batch split, as row lists in order."""
    rows = sorted(spark.read.parquet(f"{SF}/embeddings.parquet")
                  .select("vec_id", "embedding").collect(),
                  key=lambda r: r.vec_id)
    n = len(rows)
    return [[r for i, r in enumerate(rows) if i * N_EB // n == b]
            for b in range(N_EB)]


class TestStreamingDrift:
    def test_driver_loop_parity_over_spine(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.streaming.drift import (
            DriftState,
        )

        batches = _spine_batches(spark)
        state = DriftState()
        got = {}
        for b, chunk in enumerate(batches):
            df = spark.createDataFrame(
                chunk, "vec_id long, embedding array<float>")
            out = state.update(df).collect()
            if b == 0:
                assert out == []          # no previous batch yet
            for r in out:
                got[(b, r.dim)] = (r.n_cur, r.sum_cur_micro, r.n_prev,
                                   r.sum_prev_micro, r.drifted)
        assert got == _batch_gate(spark)

    def test_single_batch_emits_nothing(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.streaming.drift import (
            DriftState,
        )

        e = spark.read.parquet(f"{SF}/embeddings.parquet") \
            .select("vec_id", "embedding")
        state = DriftState()
        assert state.update(e).count() == 0
        # ...but the state holds the corpus moments: a second identical
        # batch shows zero drift on every dimension
        out = state.update(e).collect()
        assert len(out) == 64
        assert all(r.drifted == 0 and r.n_cur == r.n_prev
                   and r.sum_cur_micro == r.sum_prev_micro for r in out)

    def test_real_stream_foreachbatch_parity(self, spark, tmp_path):
        from defi_etl_platform_sqlglot_implementation__spark.streaming.drift import (
            DriftState,
            drift_ingest_stream,
        )

        batches = _spine_batches(spark)
        src = tmp_path / "vec_stream"
        src.mkdir()
        t0 = time.time()
        for b, chunk in enumerate(batches):
            f = src / f"part{b}.json"
            f.write_text("\n".join(
                json.dumps({"vec_id": r.vec_id,
                            "embedding": [float(x) for x in r.embedding]})
                for r in chunk))
            # pin micro-batch order explicitly (file source orders by
            # mtime; same-ms writes can tie — the test_llm22 convention)
            os.utime(f, (t0 - 80 + 10 * b, t0 - 80 + 10 * b))

        stream = (spark.readStream
                  .schema("vec_id long, embedding array<float>")
                  .option("maxFilesPerTrigger", 1).json(str(src)))
        sink: list = []
        q = (drift_ingest_stream(stream, DriftState(), sink)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        pdf = pd.concat(sink, ignore_index=True)
        got = {(int(r.batch_id), int(r.dim)):
               (int(r.n_cur), int(r.sum_cur_micro), int(r.n_prev),
                int(r.sum_prev_micro), int(r.drifted))
               for r in pdf.itertuples()}
        assert got == _batch_gate(spark)
