"""Coverage wave 7 — training-data QC and audit operators (round 5).

Four gates:

- cross-split contamination audit (true near-dup pairs straddling the
  deterministic train/val/test boundary — the eval-leakage check),
- OOV rate against a corpus top-K vocabulary (the tokenizer-coverage
  knob),
- cluster-distance outliers (per-vector cosine distance to its TRAINED
  k-means centroid vs the cluster mean, integer inequality),
- histogram-based token-length percentile clipping (p05/p95 thresholds
  from a value-count reduction, no global row sort).

Scale notes per gate; the shared discipline: quadratic cores bounded
(the leakage audit reuses the capped/oracle-declared exact-Jaccard
pairs), everything else is hash aggregates, broadcast joins, or a
domain-bounded histogram window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.materialize import scoped_persist
from .registry import register, t
from .registry_llm import _SHINGLES_CTE
from .registry_llm6 import _NTOK_DUCK, _NTOK_SPARK, _SPLIT_CASE_DUCK, _split_col

_VOCAB_K = 16


# =========================================================================
# cross-split contamination — near-dup pairs that straddle the split
# =========================================================================

@register(
    "split_leakage_pairs",
    f"""
    WITH {_SHINGLES_CTE},
    p AS (
        SELECT d1, d2, inter, sa.n AS n1, sb.n AS n2
        FROM ipair
        JOIN sz sa ON sa.doc_id = d1
        JOIN sz sb ON sb.doc_id = d2
        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 5e-1
    ),
    sp AS (SELECT doc_id, {_SPLIT_CASE_DUCK.format(id="doc_id")} AS split
           FROM documents)
    SELECT p.d1, p.d2, s1.split AS split_1, s2.split AS split_2,
           CAST(round(1e4 * p.inter / (p.n1 + p.n2 - p.inter)) AS BIGINT)
               AS jaccard_bp
    FROM p
    JOIN sp s1 ON s1.doc_id = p.d1
    JOIN sp s2 ON s2.doc_id = p.d2
    WHERE s1.split <> s2.split
    """,
)
def split_leakage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-contamination audit: every TRUE near-dup pair (exact 3-gram
    Jaccard >= 0.5) whose two documents land in DIFFERENT md5 splits —
    a val/test document with a train-side near-duplicate inflates eval
    scores, so this list must be empty (or acted on) before training.
    Composes the deterministic split (registry_llm6._split_col) with the
    exact pair core; the split columns attach via two equi-joins on
    doc_id, and the pair core carries the same quadratic-guard contract
    as every Jaccard gate (oracle=True here = declared exact; the scale
    path feeds LSH candidates instead)."""
    from .operators.dedup import ngram_jaccard_pairs

    docs = t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, oracle=True)
    sp = docs.select("doc_id", _split_col().alias("split"))
    s1 = sp.select(F.col("doc_id").alias("sp_d1"), F.col("split").alias("split_1"))
    s2 = sp.select(F.col("doc_id").alias("sp_d2"), F.col("split").alias("split_2"))
    return (
        pairs.join(s1, F.col("d1") == F.col("sp_d1"))
        .join(s2, F.col("d2") == F.col("sp_d2"))
        .filter(F.col("split_1") != F.col("split_2"))
        .select(
            "d1", "d2", "split_1", "split_2",
            F.round(F.lit(1e4) * F.col("inter")
                    / (F.col("n1") + F.col("n2") - F.col("inter")))
            .cast("long").alias("jaccard_bp"),
        )
    )


# =========================================================================
# OOV rate vs corpus top-K vocabulary
# =========================================================================

@register(
    "oov_rate",
    f"""
    WITH toks AS (
        SELECT doc_id, tok
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        WHERE tok <> ''
    ),
    wc AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1),
    vocab AS (SELECT tok FROM wc ORDER BY c DESC, tok LIMIT {_VOCAB_K}),
    pm AS (
        SELECT t.doc_id, COUNT(*) AS n_tokens,
               SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS n_oov
        FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
        GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(pm.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(pm.n_oov, 0) AS BIGINT) AS n_oov,
           CASE WHEN pm.n_tokens > 0
                THEN CAST(round(1e4 * pm.n_oov / pm.n_tokens) AS BIGINT)
                ELSE NULL END AS oov_bp
    FROM documents d LEFT JOIN pm ON pm.doc_id = d.doc_id
    """,
)
def oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage QC: per document, the share (basis points) of
    whitespace tokens OUTSIDE the corpus top-{16} vocabulary (count
    DESC, token ASC tie-break — fully deterministic). High-OOV docs are
    the ones a fixed vocabulary tokenizes worst; the same two-pass shape
    prices any candidate vocab size. Pass 1 is one hash aggregate to a
    vocab that is TINY by construction (top-K), so pass 2 attaches it
    with a broadcast join — no shuffle touches the token table twice;
    zero-token docs keep their row (NULL rate) per the corpus-wide
    one-row-per-doc contract."""
    docs = t(spark, sf_dir, "documents")
    toks = (docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
            .filter(F.col("tok") != ""))
    vocab = (toks.groupBy("tok").count()
             .orderBy(F.desc("count"), F.asc("tok")).limit(_VOCAB_K)
             .select("tok", F.lit(1).alias("in_vocab")))
    pm = (toks.join(F.broadcast(vocab), "tok", "left")
          .groupBy("doc_id")
          .agg(F.count("*").alias("n_tokens"),
               F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
               .alias("n_oov")))
    return docs.select("doc_id").join(pm, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
        F.when(F.col("n_tokens") > 0,
               F.round(F.lit(1e4) * F.col("n_oov") / F.col("n_tokens"))
               .cast("long")).alias("oov_bp"),
    )


# =========================================================================
# cluster-distance outliers — assignment-quality QC on the trained k-means
# =========================================================================

def _cluster_distance_sql() -> str:
    from .registry_llm3 import _KM_ITERS, _km_ctes, _vchain

    cos = (f"({_vchain('e.embedding', 'c.ce')})"
           f" / (sqrt({_vchain('e.embedding', 'e.embedding')})"
           f" * sqrt({_vchain('c.ce', 'c.ce')}))")
    return f"""
    WITH {_km_ctes()},
    ad AS (
        SELECT vec_id, cid,
               CAST(round((1 - cs) * 1000000) AS BIGINT) AS dist_micro
        FROM (
            SELECT e.vec_id, c.cid, {cos} AS cs,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {cos} DESC, c.cid) AS rn
            FROM embeddings e, tc{_KM_ITERS} c
        ) WHERE rn = 1
    ),
    cl AS (SELECT cid, COUNT(*) AS n_c, SUM(dist_micro) AS s_c
           FROM ad GROUP BY 1)
    SELECT ad.vec_id, CAST(ad.cid AS BIGINT) AS cluster_id, ad.dist_micro,
           CAST(CASE WHEN ad.dist_micro * cl.n_c > 2 * cl.s_c
                     THEN 1 ELSE 0 END AS INT) AS is_far
    FROM ad JOIN cl USING (cid)
    """


@register("cluster_distance_outliers", _cluster_distance_sql())
def cluster_distance_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assignment-quality QC over the TRAINED micro-k-means: each
    vector's cosine distance to its own centroid, micro-quantized
    (round((1-cos)*1e6) BIGINT), flagged when it exceeds 2x its
    cluster's mean distance — the integer inequality
    dist*n_c > 2*sum_dist so no float threshold crosses engines. Far
    vectors are the ones cluster blocking serves worst (dedup recall,
    IVF probe quality both degrade there); the flag rate is the signal
    to raise k or nprobe. Shape: the standard broadcast argmax assign
    (k x dim centroid state) + one per-cluster hash aggregate joined
    back on cid — nothing quadratic, centroid training replayed by the
    oracle's unrolled CTEs (kmeans_micro contract)."""
    from .operators.similarity import assign_clusters, kmeans_micro
    from .registry_llm3 import _KM_ITERS, _KM_K

    e = t(spark, sf_dir, "embeddings")
    cents = kmeans_micro(e, k=_KM_K, iters=_KM_ITERS)
    a = assign_clusters(
        e, cents.select(F.col("centroid_id").alias("vec_id"), "embedding"),
        keep_sim=True)
    # the assignment feeds BOTH the per-cluster aggregate and the final
    # join; the query-scoped persist evaluates the k x dim cosine argmax
    # once (the semdedup precedent), instead of once per plan branch —
    # and is released when the next driver-contract query starts
    d = scoped_persist(a.select(
        "vec_id", "cluster_id",
        F.round((F.lit(1.0) - F.col("csim")) * 1e6).cast("long")
        .alias("dist_micro")))
    cl = d.groupBy("cluster_id").agg(F.count("*").alias("n_c"),
                                     F.sum("dist_micro").alias("s_c"))
    return d.join(cl, "cluster_id").select(
        "vec_id", F.col("cluster_id").cast("long").alias("cluster_id"),
        "dist_micro",
        F.when(F.col("dist_micro") * F.col("n_c") > 2 * F.col("s_c"), 1)
        .otherwise(0).cast("int").alias("is_far"),
    )


# =========================================================================
# token-length percentile clip — histogram thresholds, no global row sort
# =========================================================================

@register(
    "doc_length_percentile_clip",
    f"""
    WITH tk AS (SELECT doc_id, {_NTOK_DUCK} AS n_tokens FROM documents),
    vc AS (SELECT n_tokens AS v, COUNT(*) AS c FROM tk GROUP BY 1),
    cum AS (
        SELECT v, SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(c) OVER () AS n
        FROM vc
    ),
    th AS (
        SELECT MIN(CASE WHEN cum >= (n + 19) // 20 THEN v END) AS p05,
               MIN(CASE WHEN cum >= (19 * n + 19) // 20 THEN v END) AS p95
        FROM cum
    )
    SELECT tk.doc_id, CAST(tk.n_tokens AS BIGINT) AS n_tokens,
           CAST(th.p05 AS BIGINT) AS p05, CAST(th.p95 AS BIGINT) AS p95,
           CASE WHEN tk.n_tokens < th.p05 THEN 'short'
                WHEN tk.n_tokens > th.p95 THEN 'long'
                ELSE 'keep' END AS verdict
    FROM tk, th
    """,
)
def doc_length_percentile_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative length filter: clip documents below the corpus 5th or
    above the 95th token-count percentile (discrete: the value at rank
    ceil(p*n) = the smallest value whose cumulative count reaches it —
    pure integer arithmetic, (n+19)//20, no float percentile crosses
    engines). The thresholds come from a VALUE-COUNT histogram, so the
    only window runs over the distinct-length table (domain-bounded,
    broadcastable) — never a global row sort; at 100 TB that histogram
    is a few thousand rows regardless of corpus size. Threshold attach
    is a single-row broadcast cross join."""
    docs = t(spark, sf_dir, "documents")
    tk = docs.select("doc_id", F.expr(_NTOK_SPARK).cast("long").alias("n_tokens"))
    vc = tk.groupBy(F.col("n_tokens").alias("v")).agg(F.count("*").alias("c"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    cum = (vc.withColumn("cum", F.sum("c").over(w))
           .withColumn("n", F.sum("c").over(
               Window.rowsBetween(Window.unboundedPreceding,
                                  Window.unboundedFollowing))))
    th = cum.agg(
        F.min(F.when(F.col("cum") >= F.expr("(n + 19) div 20"), F.col("v")))
        .alias("p05"),
        F.min(F.when(F.col("cum") >= F.expr("(19 * n + 19) div 20"),
                     F.col("v"))).alias("p95"))
    return tk.crossJoin(F.broadcast(th)).select(
        "doc_id", "n_tokens",
        F.col("p05").cast("long").alias("p05"),
        F.col("p95").cast("long").alias("p95"),
        F.when(F.col("n_tokens") < F.col("p05"), "short")
        .when(F.col("n_tokens") > F.col("p95"), "long")
        .otherwise("keep").alias("verdict"),
    )
