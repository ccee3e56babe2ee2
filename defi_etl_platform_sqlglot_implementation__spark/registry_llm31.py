"""Coverage wave 31 — corpus statistics and the ingest-dedup monitor:

- ``zipf_fit_by_source``: the Zipf rank-frequency fit, the datasheet
  staple for spotting unnatural token distributions (templated/
  machine-generated text flattens the curve; a crawler loop steepens
  it).  Per source, token types are ranked by (count DESC, token) and
  an OLS line is fit to (x, y) = (ln rank, ln count) in MILLI-nats:
  slope_micro = round(1e6 · (n·Σxy − Σx·Σy) / (n·Σxx − Σx·Σx)) — the
  sums are exact BIGINTs on the milli-quantized logs (cross-engine
  identical by the proven ln round device), and the final op is ONE
  correctly-rounded double division of two exact integers (the ccnet
  device).  Headroom: n·Σxy stays < 2^53 for ≤ ~3·10^4 types/source at
  milli quantization (the vocabulary is Zipf-bounded — document-scale,
  not corpus-scale); past that, re-scale the quantum.  Degenerate
  single-type sources emit NULL slope (den = 0) on both engines.

- ``ngram_entropy_curve``: per-(source, n ∈ {1,2,3}) Shannon entropy of
  the n-gram distribution in micro-nats — the diversity complement of
  ``distinct_ngram_diversity`` (distinct-n counts collisions; entropy
  weighs them): H = ln N − (Σ c·ln c)/N, computed as
  A − round(B/N) with A = round(ln(N)·1e6), B = Σ c·round(ln(c)·1e6)
  exact BIGINT — one ln round per distinct gram + one final division.
  0 ≤ H ≤ ln(distinct) up to quantization (pinned).

- ``dedup_rate_by_batch``: the production dashboard over the ingest
  spine — per arrival batch (the llm14 8-batch doc-id spine): arrivals,
  dup-on-arrival count, batch dup rate bp, and the CUMULATIVE dup rate
  bp (what an operator alarms on: a rising curve means the crawl is
  re-visiting).  Composes the oracled ``dedup_minhash_incremental``
  verdicts (byte-shared — this gate can never disagree with it); the
  only new state is an 8-row ordered window.

Scale: the Zipf/entropy streams are Zipf-bounded hash aggregates; the
per-source rank window hash-partitions by source (within one source it
is vocabulary-sized, not corpus-sized).  The batch monitor adds one
8-row window to the incremental verdict plan.

Reference scope: composes the reference's aggregation surface with the
LLM-pipeline extension; no counterpart file exists — cited per SURVEY
§6 as a scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm21 import _INC_SQL
from .registry_llm30 import _NGRAM_NS, _TOKS_DUCK, _TOKS_SPARK, _ngram_branch_duck


# =========================================================================
# Zipf rank-frequency fit per source
# =========================================================================

_ZIPF_SQL = f"""
    WITH tok AS (
        SELECT source, unnest({_TOKS_DUCK}) AS tk FROM documents
    ),
    cnt AS (SELECT source, tk, CAST(COUNT(*) AS BIGINT) AS c
            FROM tok GROUP BY 1, 2),
    rk AS (
        SELECT source, c,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY c DESC, tk) AS r
        FROM cnt
    ),
    xy AS (
        SELECT source,
               CAST(round(ln(CAST(r AS DOUBLE)) * 1e3) AS BIGINT) AS x,
               CAST(round(ln(CAST(c AS DOUBLE)) * 1e3) AS BIGINT) AS y,
               c
        FROM rk
    ),
    s AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM xy GROUP BY 1
    )
    SELECT source, n_types, n_tokens,
           CASE WHEN n_types * sxx - sx * sx = 0 THEN NULL
                ELSE CAST(round(1e6
                     * CAST(n_types * sxy - sx * sy AS DOUBLE)
                     / CAST(n_types * sxx - sx * sx AS DOUBLE))
                     AS BIGINT) END AS slope_micro
    FROM s
"""


@register("zipf_fit_by_source", _ZIPF_SQL)
def zipf_fit_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf OLS slope — see module docstring for the
    milli-log device and the 2^53 headroom bound."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(F.expr(_TOKS_SPARK)).alias("tk"))
    cnt = tok.groupBy("source", "tk").agg(
        F.count("*").cast("long").alias("c"))
    w = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("tk"))
    xy = cnt.withColumn("r", F.row_number().over(w)).select(
        "source", "c",
        F.round(F.log(F.col("r").cast("double")) * 1e3)
        .cast("long").alias("x"),
        F.round(F.log(F.col("c").cast("double")) * 1e3)
        .cast("long").alias("y"))
    s = xy.groupBy("source").agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"))
    num = F.col("n_types") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_types") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "source", "n_types", "n_tokens",
        F.when(den == 0, F.lit(None).cast("long"))
        .otherwise(F.round(F.lit(1e6) * num.cast("double")
                           / den.cast("double")).cast("long"))
        .alias("slope_micro"))


# =========================================================================
# n-gram entropy curve per source
# =========================================================================

_ENTROPY_SQL = f"""
    WITH tk AS (
        SELECT source, {_TOKS_DUCK} AS toks FROM documents
    ),
    grams AS ({" UNION ALL ".join(_ngram_branch_duck(n) for n in _NGRAM_NS)}),
    cnt AS (SELECT source, n, g, CAST(COUNT(*) AS BIGINT) AS c
            FROM grams GROUP BY 1, 2, 3),
    agg AS (
        SELECT source, n,
               CAST(SUM(c) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(SUM(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1e6)
                                 AS BIGINT)) AS BIGINT) AS b
        FROM cnt GROUP BY 1, 2
    )
    SELECT source, n, total AS total_ngrams, n_distinct AS distinct_ngrams,
           CAST(round(ln(CAST(total AS DOUBLE)) * 1e6) AS BIGINT)
           - CAST(round(CAST(b AS DOUBLE) / total) AS BIGINT)
               AS entropy_micro
    FROM agg
"""


@register("ngram_entropy_curve", _ENTROPY_SQL)
def ngram_entropy_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, n) n-gram Shannon entropy in micro-nats — see
    module docstring; shares the wave-30 gram branches byte-for-byte."""
    docs = t(spark, sf_dir, "documents")
    tk = docs.select("source", F.expr(_TOKS_SPARK).alias("toks"))
    branches = []
    for n in _NGRAM_NS:
        if n == 1:
            gram = "x -> element_at(toks, x)"
        else:
            gram = f"x -> array_join(slice(toks, x, {n}), ' ')"
        branches.append(
            tk.filter(F.size("toks") >= n).select(
                "source",
                F.lit(n).cast("long").alias("n"),
                F.explode(F.expr(
                    f"transform(sequence(1, size(toks) - {n - 1}), {gram})"
                )).alias("g")))
    grams = branches[0]
    for b in branches[1:]:
        grams = grams.unionByName(b)
    cnt = grams.groupBy("source", "n", "g").agg(
        F.count("*").cast("long").alias("c"))
    lnc = F.round(F.log(F.col("c").cast("double")) * 1e6).cast("long")
    agg = cnt.groupBy("source", "n").agg(
        F.sum("c").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_distinct"),
        F.sum(F.col("c") * lnc).cast("long").alias("b"))
    return agg.select(
        "source", "n",
        F.col("total").alias("total_ngrams"),
        F.col("n_distinct").alias("distinct_ngrams"),
        (F.round(F.log(F.col("total").cast("double")) * 1e6).cast("long")
         - F.round(F.col("b").cast("double") / F.col("total")).cast("long"))
        .alias("entropy_micro"))


# =========================================================================
# dedup rate by ingest batch — the dashboard over the arrival spine
# =========================================================================

_RATE_SQL = f"""
    SELECT batch,
           CAST(COUNT(*) AS BIGINT) AS arrivals,
           CAST(SUM(CASE WHEN is_dup_on_arrival THEN 1 ELSE 0 END)
                AS BIGINT) AS dups,
           CAST(round(1e4 * SUM(CASE WHEN is_dup_on_arrival THEN 1 ELSE 0
                                     END) / COUNT(*)) AS BIGINT) AS dup_bp,
           CAST(round(1e4 * SUM(SUM(CASE WHEN is_dup_on_arrival THEN 1
                                         ELSE 0 END))
                          OVER (ORDER BY batch)
                      / SUM(COUNT(*)) OVER (ORDER BY batch))
                AS BIGINT) AS cum_dup_bp
    FROM ({_INC_SQL}) base
    GROUP BY 1
"""


@register("dedup_rate_by_batch", _RATE_SQL)
def dedup_rate_by_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch + cumulative dup-on-arrival rate — composes the
    oracled ``dedup_minhash_incremental`` verdicts byte-for-byte (this
    gate can never disagree with it); the cumulative window is over the
    8-row batch summary, not the corpus."""
    from .registry_llm21 import dedup_minhash_incremental

    base = dedup_minhash_incremental(spark, sf_dir)
    per = base.groupBy("batch").agg(
        F.count("*").cast("long").alias("arrivals"),
        F.sum(F.col("is_dup_on_arrival").cast("long"))
        .cast("long").alias("dups"))
    w = (Window.orderBy("batch")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return per.select(
        "batch", "arrivals", "dups",
        F.round(F.lit(1e4) * F.col("dups") / F.col("arrivals"))
        .cast("long").alias("dup_bp"),
        F.round(F.lit(1e4) * F.sum("dups").over(w)
                / F.sum("arrivals").over(w))
        .cast("long").alias("cum_dup_bp"))
