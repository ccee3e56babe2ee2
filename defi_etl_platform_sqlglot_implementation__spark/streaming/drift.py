"""Streaming embedding-drift monitor: each arriving micro-batch of
vectors is compared, per dimension, against the moments of the PREVIOUS
batch — the between-encoder-versions / between-crawl-snapshots check a
feature store runs at ingest time.

The batch twin is ``embedding_batch_drift`` (registry_llm22 — fully
DuckDB-oracled): when vectors arrive in vec_id-rank order over the
gate's 4-batch spine, the union of per-batch drift rows equals the
batch gate row-for-row (the streaming-near-dup / streaming-debounce
convention: the streaming surface is pytest-verified against a batch
expression that is itself driver-oracled).

Shape per micro-batch:

1. reduce the batch to per-dimension integer micro-moments (posexplode
   + round(x·1e6) — the ``embedding_dim_stats`` decimal(38,0) device);
   64 rows regardless of batch size, one map-side-combinable aggregate;
2. if a previous batch exists, join the two 64-row moment frames on dim
   and emit (dim, n_cur, sum_cur_micro, n_prev, sum_prev_micro,
   drifted) with the batch gate's pure-INTEGER cross-multiplied mean
   inequality |s_c·n_p − s_p·n_c| > tau·n_c·n_p — no float compare can
   flip a flag;
3. state REPLACES (the monitor compares consecutive batches, it does
   not accumulate) — the 64-row moment frame is collected to a plain
   driver dict (dim -> (count, exact-int sum)), so a long-running
   ingest holds constant state, constant lineage, and retains NOTHING
   on the executors between batches.  (ADVICE r9 #3: the previous form
   disk-checkpointed each batch's 64-row frame, and ``disk_ckpt``
   blocks cannot be released before session end — one unreleasable
   checkpoint accrued per micro-batch.  Collecting 64 rows is the
   sanctioned driver-sized class; the drift inequality then runs in
   arbitrary-precision Python ints, the same exact-integer semantics
   as the decimal(38,0) column arithmetic it replaces.)

State = 64 rows independent of corpus size — exactly the per-key
aggregate ``applyInPandasWithState`` would hold; the explicit
foreachBatch fold is used for the same reason as streaming/near_dup.py
(transformWithState's protobuf dependency is absent in this container —
see VERDICT r6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..registry_llm22 import _DRIFT_TAU


def _batch_moments(batch: DataFrame) -> DataFrame:
    """(dim, bn, bs): per-dimension count and exact decimal(38,0) sum of
    micro-quantized coordinates — the embedding_dim_stats device."""
    return (
        batch.select(F.posexplode("embedding").alias("dim", "x"))
        .select("dim",
                F.round(F.col("x").cast("double") * 1e6).cast("long")
                .alias("q"))
        .groupBy("dim")
        .agg(F.count("*").alias("bn"),
             F.sum(F.col("q").cast("decimal(38,0)")).alias("bs"))
    )


_OUT_SCHEMA = ("dim long, n_cur long, sum_cur_micro long, "
               "n_prev long, sum_prev_micro long, drifted int")


class DriftState:
    """Previous-batch per-dimension moments held as a DRIVER dict
    (dim -> (count, exact-int micro-sum) — 64 entries, the sanctioned
    driver-sized class); ``update(batch)`` returns the drift rows of
    the arriving batch vs the previous one (empty for the first batch)
    and replaces the state with the batch's moments.  No executor-side
    state survives between batches (ADVICE r9 #3: the earlier
    disk-checkpointed frame accrued one unreleasable checkpoint per
    micro-batch)."""

    def __init__(self, tau: int = _DRIFT_TAU):
        self.tau = tau
        self._prev: dict[int, tuple[int, int]] | None = None

    def update(self, batch_embeddings: DataFrame) -> DataFrame:
        spark = batch_embeddings.sparkSession
        # one distributed reduce to 64 rows, then a driver-sized collect;
        # decimal(38,0) sums arrive as exact Decimal -> exact Python int
        cur = {int(r["dim"]): (int(r["bn"]), int(r["bs"]))
               for r in _batch_moments(batch_embeddings).collect()}
        rows = []
        if self._prev is not None:
            for dim in sorted(set(cur) & set(self._prev)):
                n_c, s_c = cur[dim]
                n_p, s_p = self._prev[dim]
                # the batch gate's pure-integer cross-multiplied mean
                # inequality, in arbitrary-precision Python ints — bit-
                # identical to the decimal(38,0) column form it replaces
                drifted = int(abs(s_c * n_p - s_p * n_c)
                              > self.tau * n_c * n_p)
                rows.append((dim, n_c, s_c, n_p, s_p, drifted))
        out = spark.createDataFrame(rows, _OUT_SCHEMA)
        self._prev = cur
        return out


def drift_ingest_stream(stream_embeddings: DataFrame, state: DriftState,
                        sink: list):
    """foreachBatch ingest loop: per micro-batch, drift rows vs the
    previous batch are appended to ``sink`` (as pandas frames) and the
    batch's moments replace the state.  Returns the DataStreamWriter,
    ready for ``.start()`` with a checkpoint dir."""
    def _fb(batch_df: DataFrame, batch_id: int) -> None:
        pdf = state.update(batch_df).toPandas()
        pdf["batch_id"] = batch_id
        sink.append(pdf)

    return stream_embeddings.writeStream.foreachBatch(_fb) \
        .outputMode("update")
