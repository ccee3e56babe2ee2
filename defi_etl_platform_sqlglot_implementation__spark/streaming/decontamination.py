"""Streaming decontamination: eval-set contamination that accumulates as
TRAIN documents stream in.

The batch twin is ``decontamination_incremental`` (registry_llm14 — fully
DuckDB-oracled): its per-batch cumulative rows are exactly the state this
stream holds after each micro-batch, and its final row is the converged
state the parity test compares against (the view_purchase_attribution
pattern: the streaming surface is pytest-verified against a batch
expression that is itself driver-oracled).

Shape (all built-ins, no Python in the hot path):

1. explode the train stream into distinct word 4-grams per doc
   (registry_llm2's slice-based construction — O(words) per doc);
2. ``dropDuplicates(["s"])`` — STATEFUL first-occurrence dedup of train
   shingles, so re-arrivals of a shingle in later micro-batches cannot
   recount (exactly the MIN(first_batch) collapse of the batch twin);
3. stream-static equi-join against the (small, broadcastable) distinct
   eval (doc_id, shingle) table;
4. streaming groupBy eval doc -> running matched-shingle count.

100 TB notes: the static side is an EVAL benchmark set — tiny by
construction (the thing you are protecting), so the join broadcasts; the
stateful-dedup state is the distinct train shingle set, the same state
any streaming decontaminator must hold — bound it in production with a
TTL watermark on a shingle-first-seen timestamp or swap stage 2 for the
Bloom prefilter device (registry_llm2's contamination_bloom_prefilter),
which trades exactness for O(bits) state; both leave stages 3-4
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_shingles_stream(train_docs: DataFrame,
                          text_col: str = "text") -> DataFrame:
    """Streaming (s) rows: distinct word 4-grams of each arriving train
    doc, then stateful cross-batch dedup — each shingle survives exactly
    once, in the first micro-batch that carries it."""
    toked = train_docs.withColumn("toks", F.split(text_col, " "))
    sh = toked.select(
        F.explode(
            F.expr(
                "array_distinct(transform("
                " sequence(1, greatest(1, size(toks) - 3),"
                " 1), i -> concat_ws(' ', slice(toks, i, 4))))"
            )
        ).alias("s")
    )
    return sh.dropDuplicates(["s"])


def eval_shingle_pairs(eval_docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Static distinct (doc_id, s) pairs of the eval split — the
    benchmark fingerprint the stream is checked against."""
    toked = eval_docs.withColumn("toks", F.split(text_col, " "))
    return toked.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "array_distinct(transform("
                " sequence(1, greatest(1, size(toks) - 3),"
                " 1), i -> concat_ws(' ', slice(toks, i, 4))))"
            )
        ).alias("s"),
    ).distinct()


def contamination_stream(train_docs: DataFrame,
                         eval_pairs: DataFrame) -> DataFrame:
    """Streaming (doc_id, n_matched): cumulative count of distinct train
    shingles hitting each eval doc's shingle set.  Run with
    ``outputMode("complete")`` (a pure running aggregation) — after all
    train micro-batches the sink equals the batch twin's final state:
    ``sum(n_matched)`` = decontamination_incremental's
    ``matched_pairs_cum`` at the last batch, and the row count =
    ``docs_contaminated_cum`` there (zero-hit docs never join in)."""
    novel = train_shingles_stream(train_docs)
    hits = novel.join(F.broadcast(eval_pairs), "s")
    return hits.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_matched"))
