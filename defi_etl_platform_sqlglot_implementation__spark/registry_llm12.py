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
