"""Coverage wave 37 (round 9) — the MinHash K knob, chunk-granular
contamination, normalization impact, and the DP-release mechanism.

- ``minhash_k_error_sweep``: the OTHER MinHash dial.  The band sweep
  (wave 17) prices (bands, rows) at fixed K; this prices K itself —
  per K ∈ {4, 8, 16}, the estimator error |est − exact| over the
  true (Jaccard >= 0.5) pair inventory, as mean/max basis points.  ONE
  16-hash md5 signature family serves all three points (K-prefix
  property: the K-hash estimate uses hashes i < K), so the sweep costs
  one signature build + one bounded pair join — the
  ``minhash_estimate_error`` device (K = 8 there) generalized to the
  curve a deployment reads before sizing signatures.

- ``chunk_level_contamination``: eval leakage at the RAG-chunk
  granularity — doc-level decontamination (split_decontamination_
  report) misses an eval chunk embedded inside an otherwise-novel
  train doc, and chunk stores retrieve CHUNKS.  Per (split != train,
  source): chunk occurrences, contaminated occurrences (the 64/48
  chunk-hash appears in ANY train doc — the chunk_dedup_report window
  contract), contamination bp.

- ``normalization_impact_report``: what the robust-dedup normalizer
  actually changes — per source: docs, docs whose normalized form
  differs from the raw text, total char delta, changed share bp.  The
  datasheet that justifies (or retires) the normalize-then-LSH stage
  (dedup_minhash_normalized); normalizer byte-shared with
  registry_llm14's ``_NORM_*`` device.

- ``dp_laplace_counts``: the differential-privacy release mechanism
  for per-source counts — Laplace(b=2) noise via the inverse-CDF
  transform −b·sign(u−½)·ln(1−2|u−½|) of a uniform u.  Here u is the
  md5 12-hex integer device keyed on the source (DETERMINISTIC by
  design: the gate pins the mechanism's transform exactly cross-engine
  — a production release substitutes real randomness for u; with a
  fixed u the output is a reproducible fixture, NOT a privacy
  guarantee, and says so).  Noise in micro counts; epsilon = 1/b per
  count under sensitivity 1.

Scale shapes: the K sweep joins the (already bounded) true-pair
inventory against the 16-row-per-doc signature table; chunk
contamination is one chunk explode + a broadcast-able train-hash
membership join; normalization impact is row-local regex + one
aggregate; the DP release is |sources| rows of arithmetic.

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
from .registry_llm14 import _NORM_DUCK, _NORM_SPARK
from .registry_llm34 import _hex12_to_int, _U_DEN
from .registry_llm35 import _CHUNK_SIZE, _CHUNK_STRIDE

_K_SWEEP = (4, 8, 16)
_K_MAX = max(_K_SWEEP)
_DP_SCALE = 2.0  # Laplace b; epsilon = 1/b per count at sensitivity 1


# =========================================================================
# minhash_k_error_sweep — estimator error vs signature size
# =========================================================================

def _k_sweep_sql() -> str:
    per_k = "\n        UNION ALL\n        ".join(
        f"""SELECT {k} AS k, d1, d2, jb,
               CAST(round(abs(1e4 * m{k} / {k}.0 - jb_raw)) AS BIGINT)
                   AS err_bp
        FROM m"""
        for k in _K_SWEEP
    )
    m_cols = ", ".join(
        f"SUM(CASE WHEN a.i < {k} AND a.h = b.h THEN 1 ELSE 0 END) AS m{k}"
        for k in _K_SWEEP
    )
    return f"""
    WITH {_SHINGLES_CTE},
    sig AS (
        SELECT doc_id, ix.i,
               MIN(substr(md5(CAST(ix.i AS VARCHAR) || '|' || s), 1, 16))
                   AS h
        FROM sh CROSS JOIN (SELECT unnest(range(0, {_K_MAX})) AS i) ix
        GROUP BY 1, 2
    ),
    p AS (
        SELECT d1, d2, inter, sa.n AS n1, sb.n AS n2
        FROM ipair
        JOIN sz sa ON sa.doc_id = d1
        JOIN sz sb ON sb.doc_id = d2
        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 5e-1
    ),
    m AS (
        SELECT p.d1, p.d2,
               CAST(round(1e4 * p.inter / (p.n1 + p.n2 - p.inter))
                    AS BIGINT) AS jb,
               1e4 * p.inter / (p.n1 + p.n2 - p.inter) AS jb_raw,
               {m_cols}
        FROM p
        JOIN sig a ON a.doc_id = p.d1
        JOIN sig b ON b.doc_id = p.d2 AND b.i = a.i
        GROUP BY 1, 2, 3, 4
    ),
    pts AS (
        {per_k}
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(round(AVG(err_bp)) AS BIGINT) AS mean_err_bp,
           CAST(MAX(err_bp) AS BIGINT) AS max_err_bp
    FROM pts GROUP BY 1
"""


@register("minhash_k_error_sweep", _k_sweep_sql())
def minhash_k_error_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator error vs K — see module docstring.  One 16-hash
    engine-neutral family (the minhash_estimate_error device), the
    K-point estimate = agreement over hashes i < K; per-pair err_bp is
    rounded BEFORE the mean (order-free integers), the mean is one
    AVG + round over a bounded pair set."""
    from .operators.dedup import ngram_jaccard_pairs, shingle_table

    docs = t(spark, sf_dir, "documents")
    sh = shingle_table(docs)
    sig = (
        sh.select("doc_id", "s",
                  F.explode(F.sequence(F.lit(0), F.lit(_K_MAX - 1)))
                  .alias("i"))
        .groupBy("doc_id", "i")
        .agg(F.min(F.substring(
            F.md5(F.concat(F.col("i").cast("string"), F.lit("|"),
                           F.col("s"))), 1, 16)).alias("h"))
    )
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, oracle=True).select(
        "d1", "d2", "inter", "n1", "n2")
    a = sig.select(F.col("doc_id").alias("d1"), "i",
                   F.col("h").alias("ha"))
    b = sig.select(F.col("doc_id").alias("d2b"),
                   F.col("i").alias("ib"), F.col("h").alias("hb"))
    agg = [F.sum(F.when((F.col("i") < k)
                        & (F.col("ha") == F.col("hb")), 1).otherwise(0))
           .alias(f"m{k}") for k in _K_SWEEP]
    jraw = F.lit(1e4) * F.col("inter") / (F.col("n1") + F.col("n2")
                                          - F.col("inter"))
    m = (
        pairs.join(a, "d1")
        .join(b, (F.col("d2") == F.col("d2b"))
              & (F.col("i") == F.col("ib")))
        .groupBy("d1", "d2", "inter", "n1", "n2")
        .agg(*agg)
        .withColumn("jb_raw", jraw)
    )
    pts = None
    for k in _K_SWEEP:
        part = m.select(
            F.lit(k).cast("long").alias("k"),
            F.round(F.abs(F.lit(1e4) * F.col(f"m{k}") / float(k)
                          - F.col("jb_raw"))).cast("long").alias("err_bp"))
        pts = part if pts is None else pts.unionByName(part)
    return pts.groupBy("k").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(F.avg("err_bp")).cast("long").alias("mean_err_bp"),
        F.max("err_bp").cast("long").alias("max_err_bp"))


# =========================================================================
# chunk_level_contamination — eval chunks seen verbatim in train
# =========================================================================

_CHUNK_CONTAM_SQL = f"""
    WITH toked AS (
        SELECT doc_id, source,
               {_SPLIT_CASE_DUCK.format(id='doc_id')} AS split,
               string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    ch AS (
        SELECT doc_id, source, split,
               md5(array_to_string(
                   toks[i * {_CHUNK_STRIDE} + 1
                        : i * {_CHUNK_STRIDE} + {_CHUNK_SIZE}], ' ')) AS h
        FROM toked,
             unnest(range(0, CAST(floor((n_tokens - 1)
                                        / {_CHUNK_STRIDE}.0) AS BIGINT)
                             + 1)) AS t(i)
    ),
    trh AS (SELECT DISTINCT h FROM ch WHERE split = 'train')
    SELECT c.split, c.source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN trh.h IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           CAST(round(1e4 * SUM(CASE WHEN trh.h IS NOT NULL
                                     THEN 1 ELSE 0 END) / COUNT(*))
                AS BIGINT) AS contaminated_bp
    FROM ch c LEFT JOIN trh USING (h)
    WHERE c.split <> 'train'
    GROUP BY 1, 2
"""


@register("chunk_level_contamination", _CHUNK_CONTAM_SQL)
def chunk_level_contamination(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """Chunk-granular eval contamination — see module docstring.
    Chunk windows byte-share the chunk_dedup_report / doc_chunks 64/48
    contract; the split is the llm6 md5 spine.  The train-hash set is
    a distinct membership join (Bloom-able at 100 TB — the
    contamination_bloom_gated device applies verbatim)."""
    docs = t(spark, sf_dir, "documents").withColumn("split", _split_col())
    toked = docs.select("doc_id", "source", "split",
                        F.split("text", " ").alias("toks")) \
        .withColumn("n_tokens", F.size("toks"))
    ch = (
        toked.select(
            "doc_id", "source", "split",
            F.explode(F.sequence(
                F.lit(0),
                F.floor((F.col("n_tokens") - 1) / _CHUNK_STRIDE)
                .cast("long"))).alias("i"))
        .join(toked.select("doc_id", "toks"), "doc_id")
        .select(
            "doc_id", "source", "split",
            F.md5(F.array_join(
                F.slice("toks", F.col("i") * _CHUNK_STRIDE + 1,
                        _CHUNK_SIZE), " ")).alias("h"))
    )
    trh = (ch.filter(F.col("split") == "train").select("h").distinct()
           .withColumn("_seen", F.lit(1)))
    hit = F.sum(F.when(F.col("_seen").isNotNull(), 1).otherwise(0))
    return (
        ch.filter(F.col("split") != "train")
        .join(trh, "h", "left")
        .groupBy("split", "source")
        .agg(F.count("*").cast("long").alias("n_chunks"),
             hit.cast("long").alias("n_contaminated"),
             F.round(F.lit(1e4) * hit / F.count("*")).cast("long")
             .alias("contaminated_bp"))
    )


# =========================================================================
# normalization_impact_report — what the robust normalizer changes
# =========================================================================

_NORM_IMPACT_SQL = f"""
    WITH n AS (
        SELECT doc_id, source, text,
               {_NORM_DUCK.format(x='text')} AS ntext
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN ntext <> text THEN 1 ELSE 0 END) AS BIGINT)
               AS n_changed,
           CAST(SUM(length(text) - length(ntext)) AS BIGINT)
               AS char_delta,
           CAST(round(1e4 * SUM(CASE WHEN ntext <> text THEN 1 ELSE 0 END)
                      / COUNT(*)) AS BIGINT) AS changed_bp
    FROM n GROUP BY 1
"""


@register("normalization_impact_report", _NORM_IMPACT_SQL)
def normalization_impact_report(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    """Normalizer impact datasheet — see module docstring.  The
    normalizer is registry_llm14's ``_NORM_*`` device verbatim
    (case-fold, digit-fold, punctuation->space, space-collapse, trim),
    so this report prices exactly the transform
    dedup_minhash_normalized runs.  Row-local regex + one aggregate."""
    docs = t(spark, sf_dir, "documents")
    n = docs.select(
        "source", "text",
        F.expr(_NORM_SPARK.format(x="text")).alias("ntext"))
    changed = F.sum(F.when(F.col("ntext") != F.col("text"), 1)
                    .otherwise(0))
    return n.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        changed.cast("long").alias("n_changed"),
        F.sum(F.length("text") - F.length("ntext")).cast("long")
        .alias("char_delta"),
        F.round(F.lit(1e4) * changed / F.count("*")).cast("long")
        .alias("changed_bp"))


# =========================================================================
# dp_laplace_counts — the DP count-release mechanism, pinned exactly
# =========================================================================

_DP_SQL = f"""
    WITH c AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS true_count
        FROM documents GROUP BY 1
    ),
    u AS (
        SELECT source, true_count,
               ({_hex12_to_int("md5('dp:' || source)")} + 1) / {_U_DEN!r}
                   AS uu
        FROM c
    )
    SELECT source, true_count,
           CAST(round(-{_DP_SCALE!r}
                      * (CASE WHEN uu >= 0.5 THEN 1 ELSE -1 END)
                      * ln(1.0 - 2.0 * abs(uu - 0.5)) * 1e6) AS BIGINT)
               AS noise_micro,
           true_count * 1000000
           + CAST(round(-{_DP_SCALE!r}
                        * (CASE WHEN uu >= 0.5 THEN 1 ELSE -1 END)
                        * ln(1.0 - 2.0 * abs(uu - 0.5)) * 1e6) AS BIGINT)
               AS noisy_count_micro
    FROM u
"""


@register("dp_laplace_counts", _DP_SQL)
def dp_laplace_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace count-release mechanism — see module docstring.  The
    uniform is DETERMINISTIC (md5 of the source key) so the transform
    is pinned exactly cross-engine; a production release substitutes
    real randomness — with a fixed u this is a reproducible mechanism
    fixture, NOT a privacy guarantee.  |sources| rows of arithmetic."""
    docs = t(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("true_count"))
    hex12 = F.substring(F.md5(F.concat(F.lit("dp:"), F.col("source"))),
                        1, 12)
    uu = (F.conv(hex12, 16, 10).cast("long") + 1) / F.lit(_U_DEN)
    sign = F.when(uu >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = F.round(-F.lit(_DP_SCALE) * sign
                    * F.log(1.0 - 2.0 * F.abs(uu - 0.5)) * 1e6) \
        .cast("long")
    return c.select(
        "source", "true_count",
        noise.alias("noise_micro"),
        (F.col("true_count") * 1_000_000 + noise).cast("long")
        .alias("noisy_count_micro"))
