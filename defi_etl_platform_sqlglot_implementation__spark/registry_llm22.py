"""Coverage wave 22 — corpus-evolution monitors: held-out n-gram novelty
profiling and per-batch embedding drift detection.

- ``ngram_novelty_profile``: the generalization-surface twin of
  contamination checking — per held-out (val/test) document, the share
  of its distinct 3-token shingles that appear in NO training document.
  Contamination gates ask "did eval text leak INTO train?"; this asks
  the complementary curation question "how much of the held-out text is
  genuinely novel vs reassembled train n-grams?" — the memorization /
  novelty signal eval-set builders report.  Shingles are the
  ``_SHINGLES_CTE`` device (raw split, 3-token windows, per-doc
  distinct — byte-shared with the Jaccard dedup family), the split is
  the llm6 md5 spine, and novelty_bp is the established integer-ratio
  round.

- ``embedding_batch_drift``: data-drift monitoring over the ingest
  spine — vectors arrive in 4 id-ordered RANK-based batches
  ((rank-1) * 4 // n_vecs with rank = ROW_NUMBER() OVER (ORDER BY
  vec_id); VERDICT r8 #3 — the old id-VALUE quartile spine went empty
  on sparse/sharded id domains, and at 100 TB ids are never dense),
  each batch reduces to per-dimension integer micro-moment
  sums (the ``embedding_dim_stats`` decimal/HUGEINT device), and
  consecutive batches are compared per dimension with the
  cross-multiplied mean inequality |s_cur * n_prev - s_prev * n_cur| >
  tau * n_cur * n_prev (tau = 10000 micro = a 0.01 mean shift) — an
  INTEGER inequality, so no float comparison can flip a drift flag
  cross-engine.  One row per (batch >= 1, dim): the monitor a feature
  store runs between encoder versions or corpus snapshots.

Scale shapes: novelty is one distinct over train shingles + one
shingle-keyed equi-join + one per-doc aggregate (all linear in tokens);
drift is one posexplode + one (batch, dim)-keyed hash aggregate to
4 x 64 rows + a dim-keyed self-join of that tiny frame.

Reference scope: composes the reference's aggregation surface
(src/transform/etl_pipeline.py groupbys) with the LLM-pipeline
extension; no counterpart file exists — cited per SURVEY §6 as a scale
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm import _SHINGLES_CTE
from .registry_llm6 import _SPLIT_CASE_DUCK, _split_col

_N_EB = 4              # embedding ingest batches
_DRIFT_TAU = 10000     # micro mean-shift threshold (= 0.01)


# =========================================================================
# held-out n-gram novelty — the generalization surface
# =========================================================================

_NOVELTY_SQL = f"""
    WITH {_SHINGLES_CTE},
    spl AS (
        SELECT doc_id, {_SPLIT_CASE_DUCK.format(id="doc_id")} AS split
        FROM documents
    ),
    tr AS (
        SELECT DISTINCT sh.s
        FROM sh JOIN spl USING (doc_id)
        WHERE spl.split = 'train'
    ),
    hd AS (
        SELECT sh.doc_id, spl.split, sh.s
        FROM sh JOIN spl USING (doc_id)
        WHERE spl.split <> 'train'
    )
    SELECT hd.doc_id, hd.split,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN tr.s IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel,
           CAST(round(1e4 * SUM(CASE WHEN tr.s IS NULL THEN 1 ELSE 0 END)
                      / COUNT(*)) AS BIGINT) AS novelty_bp
    FROM hd LEFT JOIN tr ON hd.s = tr.s
    GROUP BY 1, 2
"""


@register("ngram_novelty_profile", _NOVELTY_SQL)
def ngram_novelty_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out n-gram novelty — see module docstring.  The shingle
    construction is ``token_shingles`` (hash-exact against
    _SHINGLES_CTE via the green dedup_minhash_lsh gate), so this gate
    can never disagree with the dedup family about what a shingle is.
    COUNT(*) is per-doc DISTINCT shingles by construction (the array is
    distinct before explode), and it is always >= 1 (the greatest(1, .)
    clamp emits one shingle even for short docs) — no zero division."""
    from .operators.dedup import token_shingles

    docs = t(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(token_shingles("text", 3)).alias("s"))
    spl = docs.select("doc_id", _split_col("doc_id").alias("split"))
    tr = (sh.join(spl, "doc_id").filter(F.col("split") == "train")
          .select("s").distinct().withColumn("_seen", F.lit(1)))
    hd = sh.join(spl, "doc_id").filter(F.col("split") != "train")
    novel = F.sum(F.when(F.col("_seen").isNull(), 1).otherwise(0))
    return (
        hd.join(tr, "s", "left")
        .groupBy("doc_id", "split")
        .agg(F.count("*").cast("long").alias("n_shingles"),
             novel.cast("long").alias("n_novel"),
             F.round(F.lit(1e4) * novel / F.count("*")).cast("long")
             .alias("novelty_bp"))
    )


# =========================================================================
# per-batch embedding drift — integer cross-moment mean comparison
# =========================================================================

_DRIFT_SQL = f"""
    WITH n AS (SELECT COUNT(*) AS n_vecs FROM embeddings),
    rk AS (
        SELECT vec_id,
               ROW_NUMBER() OVER (ORDER BY vec_id) AS rnk
        FROM embeddings
    ),
    el AS (
        SELECT (rk.rnk - 1) * {_N_EB} // n.n_vecs AS batch,
               r.i - 1 AS dim,
               CAST(round(CAST(e.embedding[r.i] AS DOUBLE) * 1000000)
                    AS BIGINT) AS q
        FROM embeddings e JOIN rk USING (vec_id) CROSS JOIN n,
             (SELECT unnest(range(1, 65)) AS i) r
    ),
    st AS (
        SELECT batch, dim,
               CAST(COUNT(*) AS HUGEINT) AS bn,
               CAST(SUM(q) AS HUGEINT) AS bs
        FROM el GROUP BY 1, 2
    )
    SELECT CAST(c.batch AS BIGINT) AS batch,
           CAST(c.dim AS BIGINT) AS dim,
           CAST(c.bn AS BIGINT) AS n_cur,
           CAST(c.bs AS BIGINT) AS sum_cur_micro,
           CAST(p.bn AS BIGINT) AS n_prev,
           CAST(p.bs AS BIGINT) AS sum_prev_micro,
           CAST(CASE WHEN abs(c.bs * p.bn - p.bs * c.bn)
                          > {_DRIFT_TAU} * c.bn * p.bn
                     THEN 1 ELSE 0 END AS INT) AS drifted
    FROM st c JOIN st p ON p.dim = c.dim AND p.batch = c.batch - 1
"""


@register("embedding_batch_drift", _DRIFT_SQL)
def embedding_batch_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch embedding drift — see module docstring.  Accumulators
    run in decimal(38,0) on Spark / HUGEINT on DuckDB (the
    embedding_dim_stats device) so the cross-moment products stay exact
    far past any realistic corpus; the drift flag is a pure integer
    inequality.

    Domain note (VERDICT r8 #3): batches are RANK-based — batch =
    (rank-1) * N // n_vecs with rank the id-order ordinal — so the
    spine is dense and the consecutive-batch join non-empty on ANY id
    domain, dense or sparse/sharded (the old value-quartile spine
    returned an empty — silent — monitor on the key-shifted sf1
    corpus).  The rank needs no global row window on Spark: the
    wave-20 spine decomposition over the monotone coarse key
    vec_id div 1024 (per-shard counts -> cum_before over the tiny
    shard spine -> within-shard row_number) equals ROW_NUMBER() OVER
    (ORDER BY vec_id) exactly, because the shard key is monotone in
    vec_id.  Production callers batch by ingest time/file and
    substitute their own batch column."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "embeddings")
    n = e.agg(F.count("*").alias("n_vecs"))
    ids = e.select("vec_id").withColumn(
        "shard", F.expr("vec_id div 1024"))
    spine = ids.groupBy("shard").agg(F.count("*").alias("cnt"))
    w_spine = (Window.orderBy("shard")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    spine = spine.withColumn(
        "cum_before", F.sum("cnt").over(w_spine) - F.col("cnt"))
    w_in = Window.partitionBy("shard").orderBy("vec_id")
    ranked = (
        ids.withColumn("rn", F.row_number().over(w_in))
        .join(F.broadcast(spine.select("shard", "cum_before")), "shard")
        .select("vec_id",
                (F.col("cum_before") + F.col("rn")).alias("rnk"))
    )
    el = (
        e.join(ranked, "vec_id")
        .crossJoin(F.broadcast(n))
        .select(
            F.expr(f"((rnk - 1) * {_N_EB}) div n_vecs").alias("batch"),
            F.posexplode("embedding").alias("dim", "x"))
        .select(
            "batch", "dim",
            F.round(F.col("x").cast("double") * 1e6).cast("long").alias("q"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731 — headroom casts
    st = el.groupBy("batch", "dim").agg(
        F.count("*").alias("bn"),
        F.sum(dec(F.col("q"))).alias("bs"))
    c = st.select(F.col("batch"), F.col("dim"),
                  F.col("bn").alias("n_c"), F.col("bs").alias("s_c"))
    p = st.select((F.col("batch") + 1).alias("batch"), F.col("dim"),
                  F.col("bn").alias("n_p"), F.col("bs").alias("s_p"))
    return (
        c.join(p, ["batch", "dim"])
        .select(
            F.col("batch").cast("long").alias("batch"),
            F.col("dim").cast("long").alias("dim"),
            F.col("n_c").cast("long").alias("n_cur"),
            F.col("s_c").cast("long").alias("sum_cur_micro"),
            F.col("n_p").cast("long").alias("n_prev"),
            F.col("s_p").cast("long").alias("sum_prev_micro"),
            F.when(F.abs(F.col("s_c") * dec(F.col("n_p"))
                         - F.col("s_p") * dec(F.col("n_c")))
                   > F.lit(_DRIFT_TAU) * dec(F.col("n_c")) * F.col("n_p"), 1)
            .otherwise(0).cast("int").alias("drifted"))
    )
