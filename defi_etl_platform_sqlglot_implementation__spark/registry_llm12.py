"""Coverage wave 12 — scalar quantization (int8) with exact error pricing.

``embedding_sq8_error`` completes the vector-compression trio next to
IVF (cluster routing, similarity.py) and PQ (codeword distances,
ann_pq): per-dimension affine int8 quantization — code =
round((x − min_d) · 255/(max_d − min_d)) — with the reconstruction
error priced exactly: per-dim code range, pico-quantized (1e-12)
squared-error sums and max absolute error, the report a vector-store
compression decision is read from.

Float policy: min/max of float32 values are exact in double; the scale
division, affine transform, and reconstruction are single
correctly-rounded double ops in IDENTICAL evaluation order on both
engines, so every intermediate double is bit-identical (the float32
lesson: the element is CAST to DOUBLE before any arithmetic); the
round() finishes all act on non-negative values where HALF_UP ==
half-away-from-zero, and the emitted error columns are order-free
BIGINT sums/maxes. Dead dimensions (max == min) quantize to code 0 and
reconstruct exactly (error 0) instead of dividing by zero.

Scale: one posexplode + a dim-keyed aggregate (map-side combinable,
output cardinality = dim), one broadcast attach of the 64-row per-dim
stats back to the element stream, then the same dim-keyed aggregate
again — two passes over the element stream, nothing quadratic, state
bounded by the dimensionality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, t

_DIM = 64
_LEVELS = 255.0     # int8 affine range: codes 0..255


@register(
    "embedding_sq8_error",
    f"""
    WITH el AS (
        SELECT r.i - 1 AS dim, CAST(e.embedding[r.i] AS DOUBLE) AS x
        FROM embeddings e, (SELECT unnest(range(1, {_DIM + 1})) AS i) r
    ),
    st AS (
        SELECT dim, MIN(x) AS mn, MAX(x) AS mx,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM el GROUP BY dim
    ),
    q AS (
        SELECT el.dim, st.n, st.mn, st.mx, el.x,
               CASE WHEN st.mx > st.mn
                    THEN CAST(round((el.x - st.mn)
                                    * ({_LEVELS} / (st.mx - st.mn)))
                              AS BIGINT)
                    ELSE 0 END AS code
        FROM el JOIN st USING (dim)
    ),
    r2 AS (
        SELECT dim, n, mn, mx, code,
               x - (CASE WHEN mx > mn
                         THEN mn + CAST(code AS DOUBLE)
                                   / ({_LEVELS} / (mx - mn))
                         ELSE mn END) AS err
        FROM q
    )
    SELECT CAST(dim AS BIGINT) AS dim, n, mn, mx,
           CAST(MIN(code) AS BIGINT) AS code_min,
           CAST(MAX(code) AS BIGINT) AS code_max,
           CAST(SUM(CAST(round(1.0e12 * (err * err)) AS BIGINT))
                AS BIGINT) AS sum_sq_err_pico,
           CAST(MAX(CAST(round(1.0e12 * abs(err)) AS BIGINT))
                AS BIGINT) AS max_abs_err_pico
    FROM r2
    GROUP BY dim, n, mn, mx
    """,
)
def embedding_sq8_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension int8 scalar quantization error report — see module
    docstring for the float policy. Emitted mn/mx are exact float32
    values widened to double (raw-double comparable); codes and error
    sums are BIGINT."""
    e = t(spark, sf_dir, "embeddings")
    el = e.select(F.posexplode("embedding").alias("dim", "xf")) \
          .select("dim", F.col("xf").cast("double").alias("x"))
    st = el.groupBy("dim").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx"),
        F.count("*").cast("long").alias("n"),
    )
    scale = F.lit(_LEVELS) / (F.col("mx") - F.col("mn"))
    code = F.when(
        F.col("mx") > F.col("mn"),
        F.round((F.col("x") - F.col("mn")) * scale),
    ).otherwise(F.lit(0)).cast("long")
    joined = el.join(F.broadcast(st), "dim").withColumn("code", code)
    recon = F.when(
        F.col("mx") > F.col("mn"),
        F.col("mn") + F.col("code").cast("double") / scale,
    ).otherwise(F.col("mn"))
    err = F.col("x") - recon
    return (
        joined.withColumn("err", err)
        .groupBy(F.col("dim").cast("long").alias("dim"), "n", "mn", "mx")
        .agg(
            F.min("code").cast("long").alias("code_min"),
            F.max("code").cast("long").alias("code_max"),
            F.sum(F.round(F.lit(1.0e12) * (F.col("err") * F.col("err")))
                  .cast("long")).cast("long").alias("sum_sq_err_pico"),
            F.max(F.round(F.lit(1.0e12) * F.abs("err")).cast("long"))
             .cast("long").alias("max_abs_err_pico"),
        )
    )


# =========================================================================
# held-out bigram perplexity — train-split LM scored on val/test
# =========================================================================

# the split CASE is the llm6 _SPLIT_CASE_DUCK fragment (one definition
# shared across the stratified summary, the leakage audit, the
# decontamination report, and this gate — they can never disagree)
from .registry_llm6 import _SPLIT_CASE_DUCK as _SPLIT

_HELDOUT_SQL = f"""
    WITH tf AS (
        SELECT doc_id,
               {_SPLIT.format(id='doc_id')} AS split,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ),
    pos AS (
        SELECT doc_id, split, toks, unnest(range(1, len(toks))) AS i
        FROM tf WHERE len(toks) >= 2
    ),
    bg AS (SELECT doc_id, split, toks[i] AS a, toks[i + 1] AS b FROM pos),
    cab AS (SELECT a, b, COUNT(*) AS n_ab FROM bg
            WHERE split = 'train' GROUP BY 1, 2),
    ca  AS (SELECT a, COUNT(*) AS n_a FROM bg
            WHERE split = 'train' GROUP BY 1),
    vt AS (
        SELECT CAST(COUNT(DISTINCT tk) AS BIGINT) AS v
        FROM (SELECT unnest(toks) AS tk FROM tf WHERE split = 'train')
    ),
    bstats AS (
        SELECT split,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(CAST(round(ln(
                   CAST(COALESCE(cab.n_ab, 0) + 1 AS DOUBLE)
                   / CAST(COALESCE(ca.n_a, 0) + vt.v AS DOUBLE)) * 1e6)
                   AS BIGINT)) AS BIGINT) AS lp_micro_total,
               CAST(SUM(CASE WHEN cab.n_ab IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS unseen_bigrams
        FROM bg
        LEFT JOIN cab USING (a, b)
        LEFT JOIN ca USING (a)
        CROSS JOIN vt
        WHERE split <> 'train'
        GROUP BY split
    ),
    dc AS (
        SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM tf WHERE split <> 'train' GROUP BY split
    )
    SELECT dc.split, dc.n_docs,
           COALESCE(b.n_bigrams, 0) AS n_bigrams,
           COALESCE(b.lp_micro_total, 0) AS lp_micro_total,
           COALESCE(b.unseen_bigrams, 0) AS unseen_bigrams
    FROM dc
    LEFT JOIN bstats b USING (split)
"""


@register("heldout_bigram_perplexity", _HELDOUT_SQL)
def heldout_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The eval step for the LM-data pipeline: a Laplace-smoothed bigram
    LM is trained on the TRAIN split only (the llm6 md5 split device, so
    this gate can never disagree with the split assignment) and scored
    on every val/test bigram — per split, ALL held-out docs counted
    (zero-bigram docs included, so n_docs matches the split assignment),
    the order-free micro-nat total log-probability (mean-per-bigram and
    perplexity are one division away, left to the reader of the report
    to keep the gate integer-exact), and the unseen-bigram count (the
    coverage number that explains the score). Laplace p(b|a) =
    (c(a,b)+1)/(c(a)+V_train) with V_train the train-split vocabulary;
    bigrams and V use the SAME token definition (non-empty split tokens,
    the _NTOK convention), so unseen bigrams cost -ln(c(a)+V), never
    -inf.

    Scale: the train-count tables are Zipf-bounded; the held-out stream
    is ~25% of the corpus; two LEFT equi-joins + one broadcast scalar +
    a 2-group aggregate — the doc_bigram_logprob shape with a split
    filter."""
    from .registry_llm6 import _split_col

    docs = t(spark, sf_dir, "documents").withColumn("split", _split_col())
    tf = docs.select(
        "doc_id", "split",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("toks"))
    bg = tf.filter(F.size("toks") >= 2).select(
        "doc_id", "split",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS a,"
                "             element_at(toks, i + 1) AS b))"
            )
        ).alias("p"),
    ).select("doc_id", "split", F.col("p.a").alias("a"),
             F.col("p.b").alias("b"))
    tr = bg.filter(F.col("split") == "train")
    cab = tr.groupBy("a", "b").agg(F.count("*").alias("n_ab"))
    ca = tr.groupBy("a").agg(F.count("*").alias("n_a"))
    vt = (
        tf.filter(F.col("split") == "train")
        .select(F.explode("toks").alias("tk"))
        .agg(F.countDistinct("tk").cast("long").alias("v"))
    )
    lp = F.round(F.log(
        (F.coalesce(F.col("n_ab"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("n_a"), F.lit(0)) + F.col("v")).cast("double")
    ) * 1e6).cast("long")
    bstats = (
        bg.filter(F.col("split") != "train")
        .join(cab, ["a", "b"], "left")
        .join(ca, "a", "left")
        .crossJoin(F.broadcast(vt))
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(lp).cast("long").alias("lp_micro_total"),
            F.sum(F.when(F.col("n_ab").isNull(), 1).otherwise(0))
             .cast("long").alias("unseen_bigrams"),
        )
    )
    dc = (tf.filter(F.col("split") != "train")
          .groupBy("split").agg(F.count("*").cast("long").alias("n_docs")))
    return (
        dc.join(bstats, "split", "left")
        .select(
            "split", "n_docs",
            F.coalesce("n_bigrams", F.lit(0)).cast("long")
             .alias("n_bigrams"),
            F.coalesce("lp_micro_total", F.lit(0)).cast("long")
             .alias("lp_micro_total"),
            F.coalesce("unseen_bigrams", F.lit(0)).cast("long")
             .alias("unseen_bigrams"),
        )
    )
