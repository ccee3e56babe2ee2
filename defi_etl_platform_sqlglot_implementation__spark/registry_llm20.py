"""Coverage wave 20 — selection and cleaning knobs:
budget-constrained quality selection, per-source boilerplate block
removal, and silhouette cluster-quality scoring.

- ``quality_token_budget_cutoff``: the data-SELECTION step quality
  classifiers feed (DCLM / FineWeb-Edu style "take the best docs until
  the token budget is spent"): docs are ranked by a deterministic
  integer quality score (distinct-token ratio in basis points — the
  repetition-penalizing proxy, ties broken by doc_id), and kept while
  the cumulative token count stays within half the corpus's tokens.
  The Spark plan needs NO global sort: per-score token sums cumsum over
  the (score-domain-sized, <= 10^4 + 1 rows) score spine, and each doc's
  global cumulative position is cum_before(score) + its within-score
  running sum — a window partitioned BY score, so the only ordered
  state is bounded by the score domain, not the corpus.  Zero-token
  docs keep their row (NULL score, keep = 0).

- ``boilerplate_block_removal``: CCNet-style duplicated-text removal
  keyed per source — a 10-token paragraph block (the registry_llm14
  paragraph granularity, ceil blocks, partial tail included) is
  boilerplate when its hash appears in >= 2 DISTINCT documents of the
  SAME source; unlike paragraph dedup (keep first occurrence) this
  removes EVERY occurrence — headers/footers/licence walls have no
  canonical copy worth keeping.  Per doc: block counts, removed token
  count (partial tails at their true length), and the removed share in
  basis points.

- ``kmeans_silhouette``: cluster-quality pricing of the TRAINED
  micro-k-means — per vector a = micro-quantized cosine distance to its
  own centroid, b = to the second-nearest centroid (both via the
  bit-exact assignment fold, so a <= b by construction), and the
  simplified silhouette s_bp = round(1e4 * (b - a) / greatest(a, b))
  computed from the two BIGINTs identically on both engines (0 when
  both distances are 0).  The knob this prices: a low-silhouette
  cluster leaks near-dups across the blocking boundary — the
  semdedup_recall gates measure the consequence, this gate localizes
  the cause per vector.

Scale shapes: selection is two hash aggregations + one score-domain
spine + score-partitioned windows (no global sort); boilerplate is one
shuffle keyed on the 16-byte block hash + one per-doc aggregate;
silhouette is the map-only Arrow top-2 assignment (codebook in the
closure) + row-local integer math.

Reference scope: composes the reference's aggregation surface
(src/transform/etl_pipeline.py groupbys) with the LLM-pipeline
extension; no counterpart file exists — cited per SURVEY §6 as a scale
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, t

_BLOCK = 10       # tokens per boilerplate block (= llm14 paragraph size)
_PREV_MIN = 2     # boilerplate = block in >= 2 distinct docs of a source

_TOKS_DUCK = "list_filter(string_split(text, ' '), x -> x <> '')"
_TOKS_SPARK = "filter(split(text, ' '), x -> x != '')"


# =========================================================================
# budget-constrained quality selection — keep best docs to half the tokens
# =========================================================================

_BUDGET_SQL = f"""
    WITH tk AS (
        SELECT doc_id, {_TOKS_DUCK} AS toks,
               len({_TOKS_DUCK}) AS n_tokens
        FROM documents
    ),
    s AS (
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(round(1e4 * len(list_distinct(toks)) / n_tokens)
                    AS BIGINT) AS uniq_bp
        FROM tk WHERE n_tokens >= 1
    ),
    b AS (SELECT CAST(SUM(n_tokens) AS BIGINT) // 2 AS budget FROM s),
    c AS (
        SELECT doc_id, n_tokens, uniq_bp,
               SUM(n_tokens) OVER (ORDER BY uniq_bp DESC, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM s
    )
    SELECT c.doc_id, c.n_tokens, c.uniq_bp,
           CAST(CASE WHEN c.cum <= b.budget THEN 1 ELSE 0 END AS INT) AS keep
    FROM c CROSS JOIN b
    UNION ALL
    SELECT doc_id, CAST(0 AS BIGINT), CAST(NULL AS BIGINT), CAST(0 AS INT)
    FROM tk WHERE n_tokens = 0
"""


@register("quality_token_budget_cutoff", _BUDGET_SQL)
def quality_token_budget_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained quality selection — see module docstring.
    The oracle states the semantics as ONE global cumulative sum over
    (score DESC, doc_id); the Spark plan decomposes it into a
    score-domain spine cumsum + score-partitioned within-windows, which
    is identical because within one score the global running sum is
    cum_before(score) + the within-score running sum."""
    docs = t(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id", F.expr(_TOKS_SPARK).alias("toks")).select(
        "doc_id", "toks", F.size("toks").cast("long").alias("n_tokens"))
    sel = tk.filter(F.col("n_tokens") >= 1).select(
        "doc_id", "n_tokens",
        F.round(F.lit(1e4) * F.size(F.array_distinct("toks"))
                / F.col("n_tokens")).cast("long").alias("uniq_bp"))
    budget = sel.agg(F.sum("n_tokens").alias("tt")).select(
        F.expr("tt div 2").cast("long").alias("budget"))
    # score spine: one row per distinct score (<= 10^4 + 1 of them) —
    # the ONLY globally-ordered state, bounded by the score domain
    spine = sel.groupBy("uniq_bp").agg(
        F.sum("n_tokens").alias("s_tokens"))
    w_spine = (Window.orderBy(F.desc("uniq_bp"))
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    spine = spine.withColumn(
        "cum_before",
        (F.sum("s_tokens").over(w_spine) - F.col("s_tokens")).cast("long")
    ).select("uniq_bp", "cum_before")
    w_in = (Window.partitionBy("uniq_bp").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    kept = (
        sel.join(F.broadcast(spine), "uniq_bp")
        .withColumn("wcum", F.sum("n_tokens").over(w_in))
        .crossJoin(F.broadcast(budget))
        .select(
            "doc_id", "n_tokens", "uniq_bp",
            F.when(F.col("cum_before") + F.col("wcum") <= F.col("budget"),
                   1).otherwise(0).cast("int").alias("keep"))
    )
    empty = tk.filter(F.col("n_tokens") == 0).select(
        "doc_id", F.lit(0).cast("long").alias("n_tokens"),
        F.lit(None).cast("long").alias("uniq_bp"),
        F.lit(0).cast("int").alias("keep"))
    return kept.unionAll(empty)


# =========================================================================
# per-source boilerplate block removal — remove EVERY high-prevalence block
# =========================================================================

_BOILER_SQL = f"""
    WITH tk AS (
        SELECT doc_id, source, {_TOKS_DUCK} AS toks,
               len({_TOKS_DUCK}) AS n_tokens
        FROM documents
    ),
    blk AS (
        SELECT doc_id, source,
               md5(array_to_string(
                   toks[(i - 1) * {_BLOCK} + 1 : i * {_BLOCK}], ' '))
                   AS block_hash,
               least({_BLOCK}, n_tokens - (i - 1) * {_BLOCK}) AS blk_len
        FROM tk,
             unnest(range(1, CAST(ceil(n_tokens / {_BLOCK}.0) AS BIGINT) + 1))
                 AS t(i)
    ),
    prev AS (
        SELECT source, block_hash
        FROM blk GROUP BY 1, 2
        HAVING COUNT(DISTINCT doc_id) >= {_PREV_MIN}
    ),
    per AS (
        SELECT b.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_boiler_blocks,
               CAST(SUM(b.blk_len) AS BIGINT) AS removed_tokens
        FROM blk b JOIN prev USING (source, block_hash)
        GROUP BY 1
    )
    SELECT tk.doc_id, tk.source, CAST(tk.n_tokens AS BIGINT) AS n_tokens,
           CAST(ceil(tk.n_tokens / {_BLOCK}.0) AS BIGINT) AS n_blocks,
           COALESCE(per.n_boiler_blocks, 0) AS n_boiler_blocks,
           COALESCE(per.removed_tokens, 0) AS removed_tokens,
           CASE WHEN tk.n_tokens > 0
                THEN CAST(round(1e4 * COALESCE(per.removed_tokens, 0)
                                / tk.n_tokens) AS BIGINT)
                ELSE NULL END AS removed_share_bp
    FROM tk LEFT JOIN per USING (doc_id)
"""


@register("boilerplate_block_removal", _BOILER_SQL)
def boilerplate_block_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-source boilerplate removal — see module
    docstring.  Every occurrence of a block whose hash appears in
    >= {_PREV_MIN} distinct docs of the same source is removed (no
    canonical copy kept, unlike paragraph dedup), and the partial tail
    block counts at its true length."""
    docs = t(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id", "source", F.expr(_TOKS_SPARK).alias("toks")).select(
        "doc_id", "source", "toks",
        F.size("toks").cast("long").alias("n_tokens"))
    blk = (
        tk.filter(F.col("n_tokens") >= 1)
        .select(
            "doc_id", "source", "toks", "n_tokens",
            F.explode(F.sequence(
                F.lit(1),
                F.ceil(F.col("n_tokens") / F.lit(float(_BLOCK)))
                .cast("int"))).alias("i"))
        .select(
            "doc_id", "source",
            F.md5(F.concat_ws(" ", F.expr(
                f"slice(toks, (i - 1) * {_BLOCK} + 1, {_BLOCK})")))
            .alias("block_hash"),
            F.least(F.lit(_BLOCK).cast("long"),
                    F.col("n_tokens") - (F.col("i") - 1) * _BLOCK)
            .alias("blk_len"))
    )
    prev = (blk.groupBy("source", "block_hash")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= _PREV_MIN)
            .select("source", "block_hash"))
    per = (blk.join(prev, ["source", "block_hash"])
           .groupBy("doc_id")
           .agg(F.count("*").cast("long").alias("n_boiler_blocks"),
                F.sum("blk_len").cast("long").alias("removed_tokens")))
    return tk.join(per, "doc_id", "left").select(
        "doc_id", "source", "n_tokens",
        F.ceil(F.col("n_tokens") / F.lit(float(_BLOCK))).cast("long")
        .alias("n_blocks"),
        F.coalesce("n_boiler_blocks", F.lit(0)).cast("long")
        .alias("n_boiler_blocks"),
        F.coalesce("removed_tokens", F.lit(0)).cast("long")
        .alias("removed_tokens"),
        F.when(F.col("n_tokens") > 0,
               F.round(F.lit(1e4)
                       * F.coalesce("removed_tokens", F.lit(0))
                       / F.col("n_tokens")).cast("long"))
        .alias("removed_share_bp"))


# =========================================================================
# silhouette cluster-quality scoring over the trained micro-k-means
# =========================================================================

def _silhouette_sql() -> str:
    from .registry_llm3 import _KM_ITERS, _km_ctes, _vchain

    cos = (f"({_vchain('e.embedding', 'c.ce')})"
           f" / (sqrt({_vchain('e.embedding', 'e.embedding')})"
           f" * sqrt({_vchain('c.ce', 'c.ce')}))")
    return f"""
    WITH {_km_ctes()},
    r2 AS (
        SELECT vec_id, cid, cs, rn FROM (
            SELECT e.vec_id, c.cid, {cos} AS cs,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {cos} DESC, c.cid) AS rn
            FROM embeddings e, tc{_KM_ITERS} c
        ) WHERE rn <= 2
    ),
    pv AS (
        SELECT vec_id,
               MAX(CASE WHEN rn = 1 THEN cid END) AS cluster_id,
               MAX(CASE WHEN rn = 1 THEN cs END) AS cs1,
               MAX(CASE WHEN rn = 2 THEN cid END) AS second_id,
               MAX(CASE WHEN rn = 2 THEN cs END) AS cs2
        FROM r2 GROUP BY vec_id
    ),
    q AS (
        SELECT vec_id,
               CAST(cluster_id AS BIGINT) AS cluster_id,
               CAST(second_id AS BIGINT) AS second_id,
               CAST(round((1 - cs1) * 1000000) AS BIGINT) AS a_micro,
               CAST(round((1 - cs2) * 1000000) AS BIGINT) AS b_micro
        FROM pv
    )
    SELECT vec_id, cluster_id, second_id, a_micro, b_micro,
           CASE WHEN greatest(a_micro, b_micro) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(round(1e4 * (b_micro - a_micro)
                                / greatest(a_micro, b_micro)) AS BIGINT)
           END AS silhouette_bp
    FROM q
    """


@register("kmeans_silhouette", _silhouette_sql())
def kmeans_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette over the TRAINED micro-k-means — see
    module docstring.  Distances to the nearest and second-nearest
    centroids come from ONE map-only Arrow projection
    (assign_clusters_top2 — the assign_clusters fold extended by the
    runner-up), micro-quantized with the cluster_distance_outliers
    device; the ratio is computed from the two BIGINTs with the same
    round() on both engines."""
    from .operators.similarity import assign_clusters_top2, kmeans_micro
    from .registry_llm3 import _KM_ITERS, _KM_K

    e = t(spark, sf_dir, "embeddings")
    cents = kmeans_micro(e, k=_KM_K, iters=_KM_ITERS)
    a2 = assign_clusters_top2(
        e, cents.select(F.col("centroid_id").alias("vec_id"), "embedding"))
    q = a2.select(
        "vec_id",
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("second_id").cast("long").alias("second_id"),
        F.round((F.lit(1.0) - F.col("csim")) * 1e6).cast("long")
        .alias("a_micro"),
        F.round((F.lit(1.0) - F.col("csim2")) * 1e6).cast("long")
        .alias("b_micro"))
    g = F.greatest(F.col("a_micro"), F.col("b_micro"))
    return q.select(
        "vec_id", "cluster_id", "second_id", "a_micro", "b_micro",
        F.when(g == 0, F.lit(0).cast("long"))
        .otherwise(F.round(F.lit(1e4) * (F.col("b_micro") - F.col("a_micro"))
                           / g).cast("long"))
        .alias("silhouette_bp"))
