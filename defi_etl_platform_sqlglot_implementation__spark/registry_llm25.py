"""Coverage wave 25 — the round-8 capstone composite:
``curation_pipeline_v3``, chaining this round's NEW stages into one
executable per-document funnel with stage attribution.

Stage order (each stage sees only the previous stage's survivors in
spirit; predicates 1-3 are per-doc and independent, stage 4 — the token
budget — is computed over the survivors of 1-3, which is the real
semantics: you spend the budget on CLEAN data):

1. ``quality``  — integer floor rules: >= 5 tokens and distinct-token
   ratio >= 2500 bp (the repetition-soup floor).
2. ``boilerplate`` — after CCNet-style per-source block removal
   (the wave-20 device: 10-token blocks, >= 2 distinct docs of the same
   source, EVERY occurrence removed), the doc must retain more than
   half its tokens (removed_share_bp < 5000).
3. ``dup`` — not a dup-on-arrival under the wave-21 ingest reduction
   (an earlier doc pairs with it at exact Jaccard >= 0.5 through the
   LSH inventory).
4. ``budget`` — among survivors of 1-3, rank by distinct-token ratio
   (doc_id tie-break) and keep while cumulative tokens stay within
   HALF the survivors' tokens (the wave-20 selection device, re-scoped
   to the cleaned pool).

Output: one row per document — doc_id, n_tokens, the four stage flags,
``first_fail`` ('quality' | 'boilerplate' | 'dup' | 'budget' | NULL),
and ``keep``.  Every stage predicate is byte-consistent with its
standalone gate (same module constants, same devices), so the funnel
can never disagree with the per-stage gates it composes.

Scale: the union of the component shapes — nothing new is added beyond
one final row-local CASE; the budget stage's only ordered state is the
score-domain spine over survivors.

Reference scope: composes the reference's aggregation surface with the
LLM-pipeline extension; no counterpart file exists — cited per SURVEY
§6 as a scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm import _SHINGLES_CTE
from .registry_llm20 import _BLOCK, _PREV_MIN, _TOKS_DUCK, _TOKS_SPARK

_MIN_TOKENS = 5
_MIN_UNIQ_BP = 2500
_MAX_BOILER_BP = 5000


_V3_SQL = f"""
    WITH {_SHINGLES_CTE},
    tk AS (
        SELECT doc_id, source, {_TOKS_DUCK} AS toks,
               CAST(len({_TOKS_DUCK}) AS BIGINT) AS n_tokens
        FROM documents
    ),
    q AS (
        SELECT doc_id, source, n_tokens,
               CASE WHEN n_tokens >= 1
                    THEN CAST(round(1e4 * len(list_distinct(toks))
                              / n_tokens) AS BIGINT) END AS uniq_bp,
               CASE WHEN n_tokens >= {_MIN_TOKENS}
                         AND round(1e4 * len(list_distinct(toks))
                                   / n_tokens) >= {_MIN_UNIQ_BP}
                    THEN 1 ELSE 0 END AS pass_quality
        FROM tk
    ),
    blk AS (
        SELECT doc_id, source,
               md5(array_to_string(
                   toks[(i - 1) * {_BLOCK} + 1 : i * {_BLOCK}], ' '))
                   AS block_hash,
               least({_BLOCK}, n_tokens - (i - 1) * {_BLOCK}) AS blk_len
        FROM tk,
             unnest(range(1, CAST(ceil(n_tokens / {_BLOCK}.0) AS BIGINT) + 1))
                 AS tt(i)
    ),
    prev AS (
        SELECT source, block_hash FROM blk GROUP BY 1, 2
        HAVING COUNT(DISTINCT doc_id) >= {_PREV_MIN}
    ),
    boiler AS (
        SELECT b.doc_id, CAST(SUM(b.blk_len) AS BIGINT) AS removed_tokens
        FROM blk b JOIN prev USING (source, block_hash) GROUP BY 1
    ),
    bo AS (
        SELECT q.doc_id,
               CASE WHEN q.n_tokens = 0 THEN 1
                    WHEN round(1e4 * COALESCE(boiler.removed_tokens, 0)
                               / q.n_tokens) < {_MAX_BOILER_BP}
                    THEN 1 ELSE 0 END AS pass_boiler
        FROM q LEFT JOIN boiler USING (doc_id)
    ),
    vp AS (
        SELECT d2 FROM ipair
        JOIN sz sa ON sa.doc_id = d1
        JOIN sz sb ON sb.doc_id = d2
        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 5e-1
        GROUP BY 1
    ),
    du AS (
        SELECT q.doc_id,
               CASE WHEN vp.d2 IS NULL THEN 1 ELSE 0 END AS pass_dup
        FROM q LEFT JOIN vp ON vp.d2 = q.doc_id
    ),
    st AS (
        SELECT q.doc_id, q.n_tokens, q.uniq_bp,
               q.pass_quality, bo.pass_boiler, du.pass_dup
        FROM q JOIN bo USING (doc_id) JOIN du USING (doc_id)
    ),
    surv AS (
        SELECT doc_id, n_tokens, uniq_bp FROM st
        WHERE pass_quality = 1 AND pass_boiler = 1 AND pass_dup = 1
    ),
    b AS (SELECT CAST(SUM(n_tokens) AS BIGINT) // 2 AS budget FROM surv),
    c AS (
        SELECT doc_id,
               SUM(n_tokens) OVER (ORDER BY uniq_bp DESC, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM surv
    ),
    bu AS (
        SELECT c.doc_id,
               CASE WHEN c.cum <= b.budget THEN 1 ELSE 0 END AS pass_budget
        FROM c CROSS JOIN b
    )
    SELECT st.doc_id, st.n_tokens,
           CAST(st.pass_quality AS INT) AS pass_quality,
           CAST(st.pass_boiler AS INT) AS pass_boiler,
           CAST(st.pass_dup AS INT) AS pass_dup,
           CAST(COALESCE(bu.pass_budget, 0) AS INT) AS pass_budget,
           CASE WHEN st.pass_quality = 0 THEN 'quality'
                WHEN st.pass_boiler = 0 THEN 'boilerplate'
                WHEN st.pass_dup = 0 THEN 'dup'
                WHEN COALESCE(bu.pass_budget, 0) = 0 THEN 'budget'
           END AS first_fail,
           CAST(CASE WHEN st.pass_quality = 1 AND st.pass_boiler = 1
                          AND st.pass_dup = 1
                          AND COALESCE(bu.pass_budget, 0) = 1
                     THEN 1 ELSE 0 END AS INT) AS keep
    FROM st LEFT JOIN bu USING (doc_id)
"""


@register("curation_pipeline_v3", _V3_SQL)
def curation_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 capstone funnel — see module docstring.  Composes the
    wave-20/21 devices with their exact module constants; the budget
    stage re-runs the wave-20 spine decomposition over the stage-1..3
    survivors (no global doc sort)."""
    from .operators.dedup import minhash_lsh_pairs
    from .operators.materialize import scoped_persist

    docs = t(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id", "source", F.expr(_TOKS_SPARK).alias("toks")).select(
        "doc_id", "source", "toks",
        F.size("toks").cast("long").alias("n_tokens"))
    q = scoped_persist(tk.select(
        "doc_id", "source", "toks", "n_tokens",
        F.when(F.col("n_tokens") >= 1,
               F.round(F.lit(1e4) * F.size(F.array_distinct("toks"))
                       / F.col("n_tokens")).cast("long")).alias("uniq_bp"),
        F.when((F.col("n_tokens") >= _MIN_TOKENS)
               & (F.round(F.lit(1e4) * F.size(F.array_distinct("toks"))
                          / F.col("n_tokens")) >= _MIN_UNIQ_BP), 1)
        .otherwise(0).alias("pass_quality")))
    blk = (
        q.filter(F.col("n_tokens") >= 1)
        .select("doc_id", "source", "toks", "n_tokens",
                F.explode(F.sequence(
                    F.lit(1),
                    F.ceil(F.col("n_tokens") / F.lit(float(_BLOCK)))
                    .cast("int"))).alias("i"))
        .select("doc_id", "source",
                F.md5(F.concat_ws(" ", F.expr(
                    f"slice(toks, (i - 1) * {_BLOCK} + 1, {_BLOCK})")))
                .alias("block_hash"),
                F.least(F.lit(_BLOCK).cast("long"),
                        F.col("n_tokens") - (F.col("i") - 1) * _BLOCK)
                .alias("blk_len"))
    )
    prev = (blk.groupBy("source", "block_hash")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= _PREV_MIN).select("source", "block_hash"))
    boiler = (blk.join(prev, ["source", "block_hash"])
              .groupBy("doc_id")
              .agg(F.sum("blk_len").cast("long").alias("removed_tokens")))
    bo = q.join(boiler, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("n_tokens") == 0, 1)
        .when(F.round(F.lit(1e4)
                      * F.coalesce("removed_tokens", F.lit(0))
                      / F.col("n_tokens")) < _MAX_BOILER_BP, 1)
        .otherwise(0).alias("pass_boiler"))
    dups = (minhash_lsh_pairs(docs, threshold=0.5)
            .select("d2").distinct()
            .withColumnRenamed("d2", "doc_id")
            .withColumn("_dup", F.lit(1)))
    st = scoped_persist(
        q.select("doc_id", "n_tokens", "uniq_bp", "pass_quality")
        .join(bo, "doc_id")
        .join(dups, "doc_id", "left")
        .withColumn("pass_dup",
                    F.when(F.col("_dup").isNull(), 1).otherwise(0))
        .drop("_dup"))
    surv = st.filter((F.col("pass_quality") == 1)
                     & (F.col("pass_boiler") == 1)
                     & (F.col("pass_dup") == 1)) \
        .select("doc_id", "n_tokens", "uniq_bp")
    budget = surv.agg(F.sum("n_tokens").alias("tt")).select(
        F.expr("tt div 2").cast("long").alias("budget"))
    spine = surv.groupBy("uniq_bp").agg(F.sum("n_tokens").alias("s_tokens"))
    w_spine = (Window.orderBy(F.desc("uniq_bp"))
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    spine = spine.withColumn(
        "cum_before",
        (F.sum("s_tokens").over(w_spine) - F.col("s_tokens")).cast("long")
    ).select("uniq_bp", "cum_before")
    w_in = (Window.partitionBy("uniq_bp").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    bu = (surv.join(F.broadcast(spine), "uniq_bp")
          .withColumn("wcum", F.sum("n_tokens").over(w_in))
          .crossJoin(F.broadcast(budget))
          .select("doc_id",
                  F.when(F.col("cum_before") + F.col("wcum")
                         <= F.col("budget"), 1).otherwise(0)
                  .alias("pass_budget")))
    return st.join(bu, "doc_id", "left").select(
        "doc_id", "n_tokens",
        F.col("pass_quality").cast("int").alias("pass_quality"),
        F.col("pass_boiler").cast("int").alias("pass_boiler"),
        F.col("pass_dup").cast("int").alias("pass_dup"),
        F.coalesce("pass_budget", F.lit(0)).cast("int").alias("pass_budget"),
        F.when(F.col("pass_quality") == 0, "quality")
        .when(F.col("pass_boiler") == 0, "boilerplate")
        .when(F.col("pass_dup") == 0, "dup")
        .when(F.coalesce("pass_budget", F.lit(0)) == 0, "budget")
        .alias("first_fail"),
        F.when((F.col("pass_quality") == 1) & (F.col("pass_boiler") == 1)
               & (F.col("pass_dup") == 1)
               & (F.coalesce("pass_budget", F.lit(0)) == 1), 1)
        .otherwise(0).cast("int").alias("keep"))
