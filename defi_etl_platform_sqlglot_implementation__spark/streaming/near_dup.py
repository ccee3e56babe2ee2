"""Streaming near-dup ingest dedup: each arriving micro-batch of
documents is checked against an incrementally-maintained MinHash-LSH
index, emitting a dup-on-arrival verdict per document.

The batch twin is ``dedup_minhash_incremental`` (registry_llm21 — fully
DuckDB-oracled): its verdict rows are exactly what this stream emits,
batch by batch, when documents arrive in doc-id order (the llm14 batch
spine).  The parity tests drive BOTH surfaces over the same spine and
compare row-for-row (the view_purchase_attribution /
streaming-decontamination convention: the streaming surface is
pytest-verified against a batch expression that is itself
driver-oracled).

Shape per micro-batch (all built-ins, no Python in the hot path):

1. per-doc distinct shingle arrays + row-local minhash signatures
   (``operators.dedup.token_shingles`` / ``minhash_signatures`` — the
   exact device the batch gates use);
2. banded bucket keys (the ``minhash_lsh_pairs`` banding, restated here
   for the index side — the parity tests pin the two constructions
   together: if they ever drifted, the per-batch verdict union would
   stop equalling the oracled batch gate);
3. candidates = index-banded x batch-banded (one equi-join on
   (band, bucket)) PLUS the intra-batch ordered self-join — the
   arriving batch is small, the index side is pre-banded and persisted,
   so the per-batch cost is O(batch x bucket-collisions), never
   index x index;
4. exact-Jaccard verify via the persisted shingle-array table (two
   doc-id equi-joins), then one groupBy(arriving doc) -> verdict.

State = the shingle-array + banded-signature tables of everything
ingested, exactly what a production dedup-at-ingest index service holds;
state merges are disk-checkpointed (the connected_components lineage
convention) so a long-running ingest cannot grow an unbounded plan.

Ordering contract: "earlier" is the doc-id order (d1 < d2), matching the
batch twin.  Verdicts equal the batch gate whenever arrival order is
doc-id-monotone (the spine); out-of-order arrival still yields
id-consistent verdicts, but a doc whose smaller-id partner arrives later
is — correctly, for an ingest path — not flagged at its own arrival.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _banded(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(doc_id, band, bucket) rows from a signature frame — the
    ``minhash_lsh_pairs`` banding (operators/dedup.py), restated for
    the incremental index; pinned against it by the parity tests."""
    rows = num_hashes // bands
    band_cols = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"h{b * rows + r}") for r in range(rows)])
            .alias("bucket"),
        )
        for b in range(bands)
    ])
    return sig.select("doc_id", F.explode(band_cols).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"))


class NearDupIndex:
    """Incrementally-maintained MinHash-LSH dedup index.

    ``update(batch_docs)`` returns one verdict row per arriving doc —
    (doc_id, first_dup_of, n_earlier_dups, is_dup_on_arrival) — and
    folds the batch into the index."""

    def __init__(self, threshold: float = 0.5, n: int = 3,
                 num_hashes: int = 32, bands: int = 16):
        self.threshold = threshold
        self.n = n
        self.num_hashes = num_hashes
        self.bands = bands
        self._arr: DataFrame | None = None      # (doc_id, sharr)
        self._banded: DataFrame | None = None   # (doc_id, band, bucket)

    def update(self, batch_docs: DataFrame,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
        from ..operators.dedup import minhash_signatures, token_shingles
        from ..operators.materialize import disk_ckpt

        arr_b = disk_ckpt(batch_docs.select(
            F.col(id_col).alias("doc_id"),
            token_shingles(text_col, self.n).alias("sharr")))
        banded_b = disk_ckpt(_banded(
            minhash_signatures(arr_b, self.num_hashes),
            self.num_hashes, self.bands))

        def _cand(left: DataFrame) -> DataFrame:
            return (
                left.alias("a")
                .join(banded_b.alias("b"),
                      (F.col("a.band") == F.col("b.band"))
                      & (F.col("a.bucket") == F.col("b.bucket"))
                      & (F.col("a.doc_id") < F.col("b.doc_id")))
                .select(F.col("a.doc_id").alias("d1"),
                        F.col("b.doc_id").alias("d2"))
            )

        cand = _cand(banded_b)                       # intra-batch pairs
        arr_all = arr_b
        if self._banded is not None:
            cand = cand.unionAll(_cand(self._banded))  # index x batch
            arr_all = self._arr.unionAll(arr_b)
        cand = cand.distinct()

        a = arr_all.select(F.col("doc_id").alias("d1"),
                           F.col("sharr").alias("_sa"))
        b = arr_b.select(F.col("doc_id").alias("d2"),
                         F.col("sharr").alias("_sb"))
        verified = (
            cand.join(a, "d1").join(b, "d2")
            .select(
                "d1", "d2",
                (F.size(F.array_intersect("_sa", "_sb")).cast("double")
                 / (F.size("_sa") + F.size("_sb")
                    - F.size(F.array_intersect("_sa", "_sb")))
                 ).alias("jaccard"))
            .filter(F.col("jaccard") >= self.threshold)
        )
        per = verified.groupBy(F.col("d2").alias("doc_id")).agg(
            F.min("d1").cast("long").alias("first_dup_of"),
            F.count("*").cast("long").alias("n_earlier_dups"))
        verdicts = (
            batch_docs.select(F.col(id_col).alias("doc_id"))
            .join(per, "doc_id", "left")
            .select(
                "doc_id", "first_dup_of",
                F.coalesce("n_earlier_dups", F.lit(0)).cast("long")
                .alias("n_earlier_dups"),
                F.col("first_dup_of").isNotNull()
                .alias("is_dup_on_arrival"))
        )
        # fold the batch into the index (checkpointed: constant-depth
        # lineage however many batches arrive)
        self._arr = (arr_all if self._arr is not None else arr_b)
        self._arr = disk_ckpt(self._arr)
        self._banded = disk_ckpt(
            self._banded.unionAll(banded_b)
            if self._banded is not None else banded_b)
        return verdicts


def near_dup_ingest_stream(stream_docs: DataFrame, index: NearDupIndex,
                           sink: list):
    """foreachBatch ingest loop: per micro-batch, verdicts are computed
    against the index-so-far, appended to ``sink`` (as pandas frames),
    and the batch is folded into the index — the production
    dedup-at-ingest shape (the index is explicit state, exactly what an
    index service holds; Structured Streaming's own operators cannot
    express a stream-vs-accumulated-self join).  Returns the
    DataStreamWriter, ready for ``.start()`` with a checkpoint dir."""
    def _fb(batch_df: DataFrame, batch_id: int) -> None:
        pdf = index.update(batch_df).toPandas()
        pdf["batch_id"] = batch_id
        sink.append(pdf)

    return stream_docs.writeStream.foreachBatch(_fb).outputMode("update")
