"""Coverage wave 21 — production-loop composites: arrival-ordered
incremental near-dup dedup, a multi-epoch source repetition plan, and
contrastive positive/hard-negative mining.

- ``dedup_minhash_incremental``: the near-dup twin of the exact
  ``dedup_incremental`` gate — production dedup compares each ARRIVING
  document against the already-indexed corpus (no retroactive
  re-clustering), so the verdict is the arrival-ordered reduction of
  the LSH-verified pair inventory: doc d is a dup-on-arrival iff some
  verified pair (e, d) has e arriving earlier, and its index match is
  the EARLIEST such e.  Batches follow the llm14 spine
  (doc_id * N // n_docs), which is monotone in doc_id, so arrival
  order == doc_id order and the reduction is one groupBy over the
  pair stream.  Non-transitive BY DESIGN: an index lookup sees
  direct matches only — the transitive closure is ``dedup_clusters``'
  job, not the ingest path's.

- ``epoch_repetition_plan``: how many EPOCHS of each source a
  temperature-smoothed mixture implies (the Llama/GPT "small sources
  repeat, big sources subsample" table): demanded tokens per source =
  round(budget * w_temp) with budget = 2x the corpus and the w_temp
  chain byte-shared with ``source_temperature_weights``; epochs in
  basis points (1e4 = one epoch), served tokens capped at 4 epochs,
  shortfall = demand the cap refuses.  All integer past the one
  sqrt/divide chain the green weights gate already proves bit-exact.

- ``contrastive_pair_mining``: positive/hard-negative mining for
  embedding training, the realistic recipe — mine from the top-k
  shortlist, not a corpus scan: per standing query (vec_id < 5), the
  highest-ranked SAME-label neighbor in its exact cosine top-10 is the
  positive, the highest-ranked DIFFERENT-label neighbor the hard
  negative, and margin_micro = round((cos_pos - cos_neg) * 1e6) prices
  the separation (negative margin = a hard negative OUTRANKS every
  positive).  One row per query; NULLs when the shortlist lacks a
  class.

Scale shapes: incremental dedup adds one groupBy(doc) + one left join
over the (banded, never all-pairs) LSH pair stream; the epoch plan is
|sources|-row arithmetic after one hash aggregate; mining is two
conditional MIN aggregates + two rank-keyed join-backs over the top-k
lists (k rows per query, never the corpus).

Reference scope: composes the reference's aggregation surface
(src/transform/etl_pipeline.py groupbys) with the LLM-pipeline
extension; no counterpart file exists — cited per SURVEY §6 as a scale
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm import _SHINGLES_CTE, _dot_chain
from .registry_llm9 import _PER_SRC_DEN_CTES, _per_src_den
from .registry_llm14 import _N_BATCHES

_MAX_EPOCHS = 4          # repetition cap: serve at most 4 passes of a source
_BUDGET_EPOCHS = 2       # token budget = 2x the corpus (forces both regimes)


# =========================================================================
# incremental near-dup dedup — arrival-ordered LSH verdicts
# =========================================================================

_INC_SQL = f"""
    WITH {_SHINGLES_CTE},
    vp AS (
        SELECT d1, d2
        FROM ipair
        JOIN sz sa ON sa.doc_id = d1
        JOIN sz sb ON sb.doc_id = d2
        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 5e-1
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    per AS (
        SELECT d2 AS doc_id, CAST(MIN(d1) AS BIGINT) AS first_dup_of,
               CAST(COUNT(*) AS BIGINT) AS n_earlier_dups
        FROM vp GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(d.doc_id * {_N_BATCHES} // n.n_docs AS BIGINT) AS batch,
           per.first_dup_of,
           COALESCE(per.n_earlier_dups, 0) AS n_earlier_dups,
           per.first_dup_of IS NOT NULL AS is_dup_on_arrival
    FROM documents d CROSS JOIN n
    LEFT JOIN per USING (doc_id)
"""


@register("dedup_minhash_incremental", _INC_SQL)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival-ordered incremental near-dup dedup — see module
    docstring.  The pair stream is ``minhash_lsh_pairs`` (banded
    signatures, exact-Jaccard verify — the ``dedup_minhash_lsh``
    device, whose agreement with the brute-force oracle that this
    oracle replays is its own green gate); pairs are emitted d1 < d2,
    and the llm14 batch spine is doc_id-monotone, so "the earlier
    endpoint" is always d1 and the verdict is one groupBy(d2)."""
    from .operators.dedup import minhash_lsh_pairs

    docs = t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    per = pairs.groupBy(F.col("d2").alias("doc_id")).agg(
        F.min("d1").cast("long").alias("first_dup_of"),
        F.count("*").cast("long").alias("n_earlier_dups"))
    n = docs.agg(F.count("*").alias("n_docs"))
    return (
        docs.select("doc_id")
        .crossJoin(F.broadcast(n))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.expr(f"(doc_id * {_N_BATCHES}) div n_docs").cast("long")
            .alias("batch"),
            "first_dup_of",
            F.coalesce("n_earlier_dups", F.lit(0)).cast("long")
            .alias("n_earlier_dups"),
            F.col("first_dup_of").isNotNull().alias("is_dup_on_arrival"))
    )


# =========================================================================
# multi-epoch source repetition plan — the mixture made executable
# =========================================================================

_EPOCH_SQL = f"""
    WITH {_PER_SRC_DEN_CTES},
    plan AS (
        SELECT source, n_tokens,
               CAST(round((CAST({_BUDGET_EPOCHS} AS DOUBLE)
                           * CAST(tot AS DOUBLE))
                          * (sqrt(CAST(n_tokens AS DOUBLE)) / sq_tot))
                    AS BIGINT) AS demand_tokens
        FROM per_src, den
    )
    SELECT source, n_tokens, demand_tokens,
           CASE WHEN n_tokens = 0 THEN CAST(NULL AS BIGINT)
                ELSE CAST(round(1e4 * demand_tokens / n_tokens) AS BIGINT)
           END AS epochs_bp,
           demand_tokens > {_MAX_EPOCHS} * n_tokens AS capped,
           least(demand_tokens, {_MAX_EPOCHS} * n_tokens) AS served_tokens,
           demand_tokens - least(demand_tokens, {_MAX_EPOCHS} * n_tokens)
               AS shortfall_tokens
    FROM plan
"""


@register("epoch_repetition_plan", _EPOCH_SQL)
def epoch_repetition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch repetition plan — see module docstring.  The
    sqrt-temperature weight chain (sqrt(n_tokens)/sq_tot with the
    source-ordered fold denominator) is the ``source_temperature_weights``
    device verbatim, so the plan can never disagree with the published
    mixture; the budget multiply and round happen in the same order on
    both engines."""
    per_src, den = _per_src_den(t(spark, sf_dir, "documents"))
    plan = per_src.crossJoin(F.broadcast(den)).select(
        "source", "n_tokens",
        F.round((F.lit(float(_BUDGET_EPOCHS)) * F.col("tot").cast("double"))
                * (F.sqrt(F.col("n_tokens").cast("double"))
                   / F.col("sq_tot"))).cast("long").alias("demand_tokens"))
    served = F.least(F.col("demand_tokens"),
                     F.lit(_MAX_EPOCHS) * F.col("n_tokens"))
    return plan.select(
        "source", "n_tokens", "demand_tokens",
        F.when(F.col("n_tokens") == 0, F.lit(None).cast("long"))
        .otherwise(
            F.round(F.lit(1e4) * F.col("demand_tokens")
                    / F.col("n_tokens")).cast("long"))
        .alias("epochs_bp"),
        (F.col("demand_tokens") > F.lit(_MAX_EPOCHS) * F.col("n_tokens"))
        .alias("capped"),
        served.cast("long").alias("served_tokens"),
        (F.col("demand_tokens") - served).cast("long")
        .alias("shortfall_tokens"))


# =========================================================================
# contrastive positive / hard-negative mining from the exact top-k lists
# =========================================================================

_MINE_SQL = f"""
    WITH q AS (SELECT vec_id AS query_id, embedding
               FROM embeddings WHERE vec_id < 5),
    p AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               ({_dot_chain('q', 'e')})
               / (sqrt({_dot_chain('q', 'q')})
                  * sqrt({_dot_chain('e', 'e')})) AS cosine
        FROM q, embeddings e
        WHERE e.vec_id != q.query_id
    ),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id)
                        AS rank
          FROM p),
    t10 AS (
        SELECT r.query_id, r.neighbor_id, r.cosine, r.rank,
               CAST(el.label AS INT) AS n_label
        FROM r JOIN embeddings el ON el.vec_id = r.neighbor_id
        WHERE r.rank <= 10
    ),
    ql AS (SELECT vec_id AS query_id, CAST(label AS INT) AS query_label
           FROM embeddings WHERE vec_id < 5),
    j AS (SELECT t10.*, ql.query_label FROM t10 JOIN ql USING (query_id)),
    pr AS (
        SELECT query_id,
               MIN(CASE WHEN n_label = query_label THEN rank END) AS pos_rank,
               MIN(CASE WHEN n_label <> query_label THEN rank END) AS neg_rank
        FROM j GROUP BY query_id
    )
    SELECT ql.query_id, ql.query_label,
           jp.neighbor_id AS positive_id,
           CAST(pr.pos_rank AS BIGINT) AS pos_rank,
           jn.neighbor_id AS negative_id,
           CAST(pr.neg_rank AS BIGINT) AS neg_rank,
           CASE WHEN jp.cosine IS NOT NULL AND jn.cosine IS NOT NULL
                THEN CAST(round((jp.cosine - jn.cosine) * 1000000) AS BIGINT)
                ELSE NULL END AS margin_micro
    FROM ql
    LEFT JOIN pr USING (query_id)
    LEFT JOIN j jp ON jp.query_id = ql.query_id AND jp.rank = pr.pos_rank
    LEFT JOIN j jn ON jn.query_id = ql.query_id AND jn.rank = pr.neg_rank
"""


@register("contrastive_pair_mining", _MINE_SQL)
def contrastive_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive positive/hard-negative mining from the exact cosine
    top-10 shortlists — see module docstring.  Composes
    ``cosine_topk`` (the ``similarity_topk`` device: broadcast
    standing queries, bit-exact fold-order cosines, neighbor-id
    tie-break) with two label equi-joins, two conditional MIN
    aggregates, and two rank-keyed join-backs — the shortlist has k
    rows per query, so everything past the topk is constant-size."""
    from .operators.similarity import cosine_topk

    e = t(spark, sf_dir, "embeddings")
    top = cosine_topk(e, e.filter(F.col("vec_id") < 5), k=10)
    labels = e.select(F.col("vec_id"), F.col("label").cast("int"))
    ql = (labels.filter(F.col("vec_id") < 5)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("label").alias("query_label")))
    j = (top.join(labels.select(F.col("vec_id").alias("neighbor_id"),
                                F.col("label").alias("n_label")),
                  "neighbor_id")
         .join(F.broadcast(ql), "query_id"))
    pr = j.groupBy("query_id").agg(
        F.min(F.when(F.col("n_label") == F.col("query_label"),
                     F.col("rank"))).cast("long").alias("pos_rank"),
        F.min(F.when(F.col("n_label") != F.col("query_label"),
                     F.col("rank"))).cast("long").alias("neg_rank"))
    jp = j.select("query_id", F.col("rank").alias("pos_rank"),
                  F.col("neighbor_id").alias("positive_id"),
                  F.col("cosine").alias("pos_cos"))
    jn = j.select("query_id", F.col("rank").alias("neg_rank"),
                  F.col("neighbor_id").alias("negative_id"),
                  F.col("cosine").alias("neg_cos"))
    return (
        ql.join(pr, "query_id", "left")
        .join(jp, ["query_id", "pos_rank"], "left")
        .join(jn, ["query_id", "neg_rank"], "left")
        .select(
            "query_id", "query_label",
            "positive_id", "pos_rank", "negative_id", "neg_rank",
            F.when(F.col("pos_cos").isNotNull()
                   & F.col("neg_cos").isNotNull(),
                   F.round((F.col("pos_cos") - F.col("neg_cos")) * 1e6)
                   .cast("long"))
            .alias("margin_micro"))
    )
