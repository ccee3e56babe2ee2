"""Coverage wave 23 — degenerate-text repair and balance monitors:
repetition tail truncation, label-balance resampling, hash-shard skew.

- ``repetition_tail_truncation``: the "cut the looping tail" repair for
  degenerate text (repetition is the signature failure of both scraped
  boilerplate and model generations): per document, the truncation
  point is the FIRST position whose 3-token shingle already occurred
  earlier in the same document — everything before it is kept.
  Positional shingles are ``positional_token_shingles`` (the
  pair-alignment device: same tokenization as the dedup family, minus
  the distinct); the second occurrence per (doc, shingle) comes from
  one ROW_NUMBER window and the truncation point is its per-doc MIN.
  Docs with no repeat keep everything (NULL trunc_pos, 10000 bp).

- ``label_balance_plan``: class-balancing for labeled embedding data —
  per label: count, share in bp, and the uniform-target resampling
  factor resample_bp = round(1e4 * total / (k * n_label)) (1e4 = keep
  as is, above = upsample, below = downsample), capped at 4x with the
  refused remainder flagged — the label twin of the source-level
  ``epoch_repetition_plan``.

- ``hash_shard_skew``: the partition-balance check every distributed
  pipeline runs before a big write — documents hash-sharded 16 ways by
  the first hex digit of md5(doc_id) (the llm6 split device's alphabet,
  all 16 symbols); per shard: docs, tokens, token share bp, and
  skew_bp = round(1e4 * 16 * tokens / total) (1e4 = perfectly
  balanced).  A hot shard here is a hot reducer at 100 TB.

Scale shapes: truncation is one (doc, shingle)-keyed window + one
per-doc MIN (linear in tokens); both balance reports are one hash
aggregate to |labels| / 16 rows + scalar attaches.

Reference scope: composes the reference's aggregation surface
(src/transform/etl_pipeline.py groupbys) with the LLM-pipeline
extension; no counterpart file exists — cited per SURVEY §6 as a scale
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, t

_MAX_RESAMPLE_BP = 40000    # never upsample a label past 4x
_N_SHARDS = 16              # one md5 hex digit


# =========================================================================
# repetition tail truncation — cut at the first repeated 3-gram
# =========================================================================

_TRUNC_SQL = """
    WITH toked AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    pos AS (
        SELECT doc_id, CAST(i AS BIGINT) AS p,
               array_to_string(l[i:i+2], ' ') AS s
        FROM toked,
             unnest(range(1, greatest(1, len(l) - 2) + 1)) AS t(i)
    ),
    occ AS (
        SELECT doc_id, p,
               ROW_NUMBER() OVER (PARTITION BY doc_id, s ORDER BY p) AS rn
        FROM pos
    ),
    tr AS (
        SELECT doc_id, CAST(MIN(p) AS BIGINT) AS trunc_pos
        FROM occ WHERE rn = 2 GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           tr.trunc_pos,
           COALESCE(tr.trunc_pos - 1,
                    CAST(len(string_split(d.text, ' ')) AS BIGINT))
               AS retained_tokens,
           CAST(round(1e4 * COALESCE(tr.trunc_pos - 1,
                                     len(string_split(d.text, ' ')))
                      / len(string_split(d.text, ' '))) AS BIGINT)
               AS retained_bp
    FROM documents d LEFT JOIN tr USING (doc_id)
"""


@register("repetition_tail_truncation", _TRUNC_SQL)
def repetition_tail_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition tail truncation — see module docstring.  Tokenization
    is the raw split (the positional_token_shingles contract: empties
    kept, so n_tokens >= 1 always and the ratio never divides by
    zero); trunc_pos is 1-based, and retained_tokens = trunc_pos - 1
    (everything strictly before the first repeated shingle's start)."""
    from .operators.dedup import positional_token_shingles

    docs = t(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        F.posexplode(positional_token_shingles("text", 3)).alias("p0", "s")
    ).select("doc_id", (F.col("p0") + 1).cast("long").alias("p"), "s")
    w = Window.partitionBy("doc_id", "s").orderBy("p")
    tr = (pos.withColumn("rn", F.row_number().over(w))
          .filter(F.col("rn") == 2)
          .groupBy("doc_id")
          .agg(F.min("p").cast("long").alias("trunc_pos")))
    base = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    retained = F.coalesce(F.col("trunc_pos") - 1, F.col("n_tokens"))
    return base.join(tr, "doc_id", "left").select(
        "doc_id", "n_tokens", "trunc_pos",
        retained.cast("long").alias("retained_tokens"),
        F.round(F.lit(1e4) * retained / F.col("n_tokens")).cast("long")
        .alias("retained_bp"))


# =========================================================================
# label balance plan — uniform-target resampling factors
# =========================================================================

_BALANCE_SQL = f"""
    WITH per AS (
        SELECT CAST(label AS INT) AS label,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM embeddings GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS k FROM per)
    SELECT per.label, per.n,
           CAST(round(1e4 * per.n / tot.total) AS BIGINT) AS share_bp,
           least(CAST(round(1e4 * tot.total / (tot.k * per.n)) AS BIGINT),
                 {_MAX_RESAMPLE_BP}) AS resample_bp,
           CAST(round(1e4 * tot.total / (tot.k * per.n)) AS BIGINT)
               > {_MAX_RESAMPLE_BP} AS capped
    FROM per CROSS JOIN tot
"""


@register("label_balance_plan", _BALANCE_SQL)
def label_balance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-balance resampling plan — see module docstring.  Pure
    integer inputs to one float-quotient round per column (the
    established ratio device); the 4x cap is applied AFTER rounding on
    both engines so the capped flag can never disagree."""
    e = t(spark, sf_dir, "embeddings")
    per = e.groupBy(F.col("label").cast("int").alias("label")).agg(
        F.count("*").cast("long").alias("n"))
    tot = per.agg(F.sum("n").cast("long").alias("total"),
                  F.count("*").cast("long").alias("k"))
    raw = F.round(F.lit(1e4) * F.col("total")
                  / (F.col("k") * F.col("n"))).cast("long")
    return per.crossJoin(F.broadcast(tot)).select(
        "label", "n",
        F.round(F.lit(1e4) * F.col("n") / F.col("total")).cast("long")
        .alias("share_bp"),
        F.least(raw, F.lit(_MAX_RESAMPLE_BP).cast("long"))
        .alias("resample_bp"),
        (raw > _MAX_RESAMPLE_BP).alias("capped"))


# =========================================================================
# hash-shard skew — the pre-write partition balance check
# =========================================================================

_SKEW_SQL = f"""
    WITH sh AS (
        SELECT strpos('0123456789abcdef',
                      substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                   AS shard,
               len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_tokens
        FROM documents
    ),
    per AS (
        SELECT CAST(shard AS BIGINT) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        FROM sh GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM per)
    SELECT per.shard, per.n_docs, per.n_tokens,
           CAST(round(1e4 * per.n_tokens / tot.total) AS BIGINT)
               AS token_share_bp,
           CAST(round(1e4 * {_N_SHARDS} * per.n_tokens / tot.total)
                AS BIGINT) AS skew_bp
    FROM per CROSS JOIN tot
"""


@register("hash_shard_skew", _SKEW_SQL)
def hash_shard_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-shard skew report — see module docstring.  The shard is the
    llm6 md5 hex-digit device (engine-neutral by the green split
    gates); skew_bp = 1e4 means a perfectly balanced shard."""
    docs = t(spark, sf_dir, "documents")
    sh = docs.select(
        (F.expr("instr('0123456789abcdef', "
                "substring(md5(cast(doc_id as string)), 1, 1))") - 1)
        .cast("long").alias("shard"),
        F.expr("size(filter(split(text, ' '), x -> x != ''))")
        .cast("long").alias("n_tokens"))
    per = sh.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"))
    tot = per.agg(F.sum("n_tokens").cast("long").alias("total"))
    return per.crossJoin(F.broadcast(tot)).select(
        "shard", "n_docs", "n_tokens",
        F.round(F.lit(1e4) * F.col("n_tokens") / F.col("total")).cast("long")
        .alias("token_share_bp"),
        F.round(F.lit(1e4) * _N_SHARDS * F.col("n_tokens") / F.col("total"))
        .cast("long").alias("skew_bp"))
