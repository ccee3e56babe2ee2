"""Coverage wave 11 — the SAMPLING stage: temperature targets made real.

``source_temperature_weights`` (wave 9) prices the mixture; these gates
EXECUTE it — the step between "we want w_s of the tokens from source s"
and an actual materialized training corpus:

- source_sampling_plan: per-source sampling schedule — the temperature
  target in tokens, the keep rate (capped at 1) for down-sampled sources
  and the epoch count for up-sampled ones, all emitted as integers
  (basis points / counts) so the gate is float-free;
- deterministic_downsample: the per-document keep decision — a salted
  md5 hash of the doc id compared against the source's rate threshold,
  so the sample is reproducible run-to-run, independent of partitioning
  and row order, and any engine computing the same hash draws the same
  sample (the property that makes a 100 TB sample auditable).

Scale shapes: the plan is one hash aggregate to |sources| rows plus a
fold over that tiny list (the wave-9 denominator device); the
downsample is a row-local hash + one broadcast attach of the per-source
rates — no shuffle of the corpus at all. The hash-threshold compare is
done on fixed-width lowercase hex strings (the llm6 min-hex device), so
neither engine ever parses hex to integers.

Why md5-Bernoulli and not Spark's ``sample()``: ``sample`` draws from a
partition-seeded RNG — the set changes with partitioning, retries, and
engine, so no oracle can replay it and no audit can reproduce it. The
hash draw is the version a production pipeline can defend: keep(doc) is
a pure function of the doc id.

Reference scope: sampling composes the reference's aggregation surface
(src/transform/etl_pipeline.py groupbys) with the LLM-pipeline mixing
knob; no counterpart file exists — cited per SURVEY §6 as a scale
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm9 import _PER_SRC_DEN_CTES, _per_src_den

# 2^32 — the hash space of the first 8 md5 hex chars
_HASH_SPACE = 4294967296
_SALT = "samp:"

# Shared per-source rate pipeline (DuckDB side). ratio_s =
# ((sqrt(tok_s)/sq_tot) * tot) / tok_s with EXACTLY this parenthesization
# on both engines — sqrt/divide/multiply are IEEE-correctly-rounded over
# bit-identical inputs, so the doubles agree bit-for-bit and the integer
# finishes (ROUND to basis points, FLOOR to epochs) agree exactly.
# per_src/den are the wave-9 device imported from registry_llm9 — ONE
# definition, so the executed plan can never disagree with the published
# source_temperature_weights. The n_tokens > 0 guard keeps a zero-token
# source at ratio 0 (nothing to sample) instead of 0/0 = NaN, which
# DuckDB's BIGINT cast would reject while Spark silently NULLs.
_RATE_CTES_DUCK = f"""
    {_PER_SRC_DEN_CTES},
    plan AS (
        SELECT source, n_docs, n_tokens,
               CASE WHEN n_tokens > 0
                    THEN CAST(ROUND(1.0e4
                         * (((sqrt(CAST(n_tokens AS DOUBLE)) / sq_tot)
                             * CAST(tot AS DOUBLE))
                            / CAST(n_tokens AS DOUBLE))) AS BIGINT)
                    ELSE 0 END AS ratio_bp
        FROM per_src, den
    )
"""


def _rate_df(docs: DataFrame) -> DataFrame:
    """Spark twin of the _RATE_CTES_DUCK plan CTE: (source, n_docs,
    n_tokens, ratio_bp) — ratio_bp = round(1e4 * temperature-target /
    actual tokens), exact integer finish over bit-identical doubles."""
    per_src, den = _per_src_den(docs)
    ratio = (
        (F.sqrt(F.col("n_tokens").cast("double")) / F.col("sq_tot"))
        * F.col("tot").cast("double")
    ) / F.col("n_tokens").cast("double")
    return per_src.crossJoin(F.broadcast(den)).select(
        "source", "n_docs", "n_tokens",
        F.when(F.col("n_tokens") > 0,
               F.round(F.lit(1.0e4) * ratio).cast("long"))
         .otherwise(F.lit(0)).cast("long").alias("ratio_bp"),
    )


# =========================================================================
# per-source sampling schedule
# =========================================================================

@register(
    "source_sampling_plan",
    f"""
    WITH {_RATE_CTES_DUCK}
    SELECT source, n_docs, n_tokens, ratio_bp,
           LEAST(10000, ratio_bp) AS keep_rate_bp,
           ratio_bp // 10000 AS full_epochs,
           CASE WHEN ratio_bp >= 10000 THEN ratio_bp % 10000
                ELSE ratio_bp END AS partial_epoch_bp
    FROM plan
    """,
)
def source_sampling_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling schedule from the temperature (alpha=1/2)
    mixture: ratio_bp = round(1e4 * target_tokens / actual_tokens).
    Down-sampled sources (ratio < 1) get keep_rate_bp; up-sampled ones
    get full_epochs complete passes plus a partial_epoch_bp-rate pass —
    the standard way small sources are up-weighted without replacement
    inside an epoch. Float-free output: every emitted column is a BIGINT
    (the doubles inside are the wave-9 bit-identical fold; the ROUND
    finish is the proven half-up device). Scale: one hash aggregate to
    |sources| rows, a fold over that tiny list, nothing touching the
    corpus twice."""
    plan = _rate_df(t(spark, sf_dir, "documents"))
    return plan.select(
        "source", "n_docs", "n_tokens", "ratio_bp",
        F.least(F.lit(10000), F.col("ratio_bp")).cast("long")
            .alias("keep_rate_bp"),
        F.expr("ratio_bp div 10000").cast("long").alias("full_epochs"),
        F.when(F.col("ratio_bp") >= 10000, F.col("ratio_bp") % 10000)
            .otherwise(F.col("ratio_bp")).cast("long")
            .alias("partial_epoch_bp"),
    )


# =========================================================================
# deterministic per-document downsample decision
# =========================================================================

@register(
    "deterministic_downsample",
    f"""
    WITH {_RATE_CTES_DUCK}
    SELECT d.doc_id, d.source,
           CAST(CASE
               WHEN p.ratio_bp >= 10000 THEN 1
               WHEN substr(md5('{_SALT}' || CAST(d.doc_id AS VARCHAR)), 1, 8)
                    < printf('%08x', p.ratio_bp * {_HASH_SPACE} // 10000)
                   THEN 1
               ELSE 0
           END AS BIGINT) AS keep
    FROM documents d
    JOIN plan p USING (source)
    """,
)
def deterministic_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized sampling decision: keep doc iff the first 8 hex
    chars of md5('samp:'||doc_id) fall below the source's rate threshold
    floor(rate_bp * 2^32 / 1e4), compared as FIXED-WIDTH lowercase hex
    strings (lexicographic == numeric for fixed-width hex — the llm6
    min-hex device; neither engine parses hex to int). Salted so the
    draw is independent of the llm6 split assignment. Up-sampled sources
    (ratio >= 1) keep everything; their extra epochs are the plan
    gate's schedule. Scale: row-local hash + broadcast rate attach —
    the corpus is never shuffled; the decision is a pure function of
    doc_id, so retries, repartitions, and re-runs draw the SAME sample."""
    docs = t(spark, sf_dir, "documents")
    plan = _rate_df(docs).select("source", "ratio_bp")
    thresh_hex = F.format_string(
        "%08x", F.expr(f"ratio_bp * {_HASH_SPACE} div 10000"))
    h8 = F.substring(
        F.md5(F.concat(F.lit(_SALT), F.col("doc_id").cast("string"))), 1, 8)
    return (
        docs.select("doc_id", "source")
        .join(F.broadcast(plan), "source")
        .select(
            "doc_id", "source",
            F.when(F.col("ratio_bp") >= 10000, F.lit(1))
             .when(h8 < thresh_hex, F.lit(1))
             .otherwise(F.lit(0)).cast("long").alias("keep"),
        )
    )


# =========================================================================
# DSIR-style importance weights — p_target / p_base bigram LM ratio
# =========================================================================

_DSIR_TARGET = "src0"   # the "high-quality domain" proxy corpus

_DSIR_SQL = f"""
    WITH tf AS (
        SELECT doc_id, source,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ),
    pos AS (
        SELECT doc_id, source, toks, unnest(range(1, len(toks))) AS i
        FROM tf WHERE len(toks) >= 2
    ),
    bg AS (SELECT doc_id, source, toks[i] AS a, toks[i + 1] AS b FROM pos),
    cab_b AS (SELECT a, b, COUNT(*) AS n_ab FROM bg GROUP BY 1, 2),
    ca_b  AS (SELECT a, COUNT(*) AS n_a FROM bg GROUP BY 1),
    cab_t AS (SELECT a, b, COUNT(*) AS n_ab FROM bg
              WHERE source = '{_DSIR_TARGET}' GROUP BY 1, 2),
    ca_t  AS (SELECT a, COUNT(*) AS n_a FROM bg
              WHERE source = '{_DSIR_TARGET}' GROUP BY 1),
    vb AS (
        SELECT CAST(COUNT(DISTINCT tk) AS BIGINT) AS v
        FROM (SELECT unnest(toks) AS tk FROM tf)
    ),
    vt AS (
        SELECT CAST(COUNT(DISTINCT tk) AS BIGINT) AS v
        FROM (SELECT unnest(toks) AS tk FROM tf
              WHERE source = '{_DSIR_TARGET}')
    ),
    per_doc AS (
        SELECT bg.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(CAST(round(ln(
                   CAST(COALESCE(ct.n_ab, 0) + 1 AS DOUBLE)
                   / CAST(COALESCE(at.n_a, 0) + vt.v AS DOUBLE)) * 1e6)
                   AS BIGINT)) AS BIGINT) AS lp_target_micro,
               CAST(SUM(CAST(round(ln(
                   CAST(cb.n_ab + 1 AS DOUBLE)
                   / CAST(ab.n_a + vb.v AS DOUBLE)) * 1e6)
                   AS BIGINT)) AS BIGINT) AS lp_base_micro
        FROM bg
        JOIN cab_b cb USING (a, b)
        JOIN ca_b ab USING (a)
        LEFT JOIN cab_t ct USING (a, b)
        LEFT JOIN ca_t at USING (a)
        CROSS JOIN vb CROSS JOIN vt
        GROUP BY bg.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_bigrams, 0) AS n_bigrams,
           COALESCE(p.lp_target_micro, 0) AS lp_target_micro,
           COALESCE(p.lp_base_micro, 0) AS lp_base_micro,
           COALESCE(p.lp_target_micro, 0) - COALESCE(p.lp_base_micro, 0)
               AS log_ratio_micro
    FROM documents d
    LEFT JOIN per_doc p USING (doc_id)
"""


@register("dsir_importance_weights", _DSIR_SQL)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data-selection score (Xie et al. 2023, public): per
    document, the log importance ratio ln(p_target/p_base) under two
    Laplace-smoothed bigram LMs — target = the 'src0' domain proxy,
    base = the full corpus. p(b|a) = (c(a,b)+1)/(c(a)+V) with V the
    respective corpus's distinct-token vocabulary, so unseen-in-target
    bigrams score -ln(V_t) instead of -inf. Bigrams and vocabularies use
    the SAME token definition (non-empty split tokens — the _NTOK
    convention), so the Laplace event space and its V cover the same
    tokens. Per-occurrence log-probs are micro-nat quantized (the
    doc_bigram_logprob device) so per-doc sums are order-free BIGINTs,
    hash-exact at any parallelism; log_ratio_micro — derived as the
    difference of the two emitted sums (SUM is linear over BIGINT) — is
    the doc's resampling key. EVERY document appears in the output:
    docs with fewer than two tokens carry the neutral score 0, so a
    downstream resampler joining on this gate never silently drops them.

    Scale: the two count tables are Zipf-bounded far below the corpus
    (target's strictly smaller); two broadcast-able scalars (V_t, V_b);
    two equi-joins back to the per-doc bigram stream plus two LEFT
    attaches for the target counts — the same shape as the base bigram
    gate, run twice. Nothing quadratic, nothing driver-side."""
    docs = t(spark, sf_dir, "documents")
    tf = docs.select(
        "doc_id", "source",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("toks"))
    bg = tf.filter(F.size("toks") >= 2).select(
        "doc_id", "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS a,"
                "             element_at(toks, i + 1) AS b))"
            )
        ).alias("p"),
    ).select("doc_id", "source", F.col("p.a").alias("a"),
             F.col("p.b").alias("b"))
    tgt = bg.filter(F.col("source") == _DSIR_TARGET)
    cab_b = bg.groupBy("a", "b").agg(F.count("*").alias("n_ab_b"))
    ca_b = bg.groupBy("a").agg(F.count("*").alias("n_a_b"))
    cab_t = tgt.groupBy("a", "b").agg(F.count("*").alias("n_ab_t"))
    ca_t = tgt.groupBy("a").agg(F.count("*").alias("n_a_t"))

    def vocab(d: DataFrame, out: str) -> DataFrame:
        return d.select(F.explode("toks").alias("tk"))                 .agg(F.countDistinct("tk").cast("long").alias(out))

    vb = vocab(tf, "v_b")
    vt = vocab(tf.filter(F.col("source") == _DSIR_TARGET), "v_t")

    lp_t = F.round(F.log(
        (F.coalesce(F.col("n_ab_t"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("n_a_t"), F.lit(0)) + F.col("v_t")).cast("double")
    ) * 1e6).cast("long")
    lp_b = F.round(F.log(
        (F.col("n_ab_b") + 1).cast("double")
        / (F.col("n_a_b") + F.col("v_b")).cast("double")
    ) * 1e6).cast("long")
    per_doc = (
        bg.join(cab_b, ["a", "b"]).join(ca_b, "a")
        .join(cab_t, ["a", "b"], "left").join(ca_t, "a", "left")
        .crossJoin(F.broadcast(vb)).crossJoin(F.broadcast(vt))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(lp_t).cast("long").alias("lp_target_micro"),
            F.sum(lp_b).cast("long").alias("lp_base_micro"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long")
             .alias("n_bigrams"),
            F.coalesce("lp_target_micro", F.lit(0)).cast("long")
             .alias("lp_target_micro"),
            F.coalesce("lp_base_micro", F.lit(0)).cast("long")
             .alias("lp_base_micro"),
            (F.coalesce("lp_target_micro", F.lit(0))
             - F.coalesce("lp_base_micro", F.lit(0))).cast("long")
             .alias("log_ratio_micro"),
        )
    )
