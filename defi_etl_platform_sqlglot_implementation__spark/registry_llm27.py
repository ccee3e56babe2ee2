"""Coverage wave 27 — corpus-composition analytics: CCNet perplexity
partitioning, the cross-source redundancy matrix, and the datasheet
length histogram.

- ``ccnet_perplexity_buckets``: the CCNet head/middle/tail split — the
  step between quality scoring and data selection in the CCNet/RedPajama
  lineage.  The wave-12 Laplace bigram LM (trained on the llm6 md5 train
  split, THE SAME cab/ca/V device as ``heldout_bigram_perplexity``, so
  the two gates can never disagree on a doc's score) scores EVERY doc
  with >=1 bigram; docs are then ranked per language by mean micro-nat
  log-probability (CAST(lp_micro AS DOUBLE)/n_bigrams — one
  correctly-rounded double division of two exact integers, doc_id
  tie-break) and NTILE(3) assigns head(1)/middle(2)/tail(3).  Output per
  (lang, bucket): doc count, bigram count, micro-nat total.  Docs with
  <2 tokens carry no bigram and are out of scope (CCNet drops them too).

- ``source_overlap_matrix``: WHICH sources duplicate each other — the
  near-dup pair inventory (MinHash-LSH banded candidates, exact-Jaccard
  verified at 0.5; pinned equal to the brute-force inventory, the
  ``dedup_minhash_lsh`` contract) keyed by the unordered source pair
  (least/greatest).  Per (src_a, src_b): pair count, distinct docs
  involved, and the pair share in bp of all near-dup pairs.  The
  cross-source rows are the ones a mixture designer acts on (dedup
  BEFORE weighting, or a source's budget double-counts shared text).

- ``doc_length_histogram``: the datasheet staple — per (source,
  floor(log2(tokens))) bucket: doc count and token mass, with the
  bucket's [2^b, 2^(b+1)-1] bounds materialized.  The bucket index is
  the INTEGER device length(bin(n)) - 1 (no float log2 at power-of-two
  boundaries); zero-token docs land in bucket -1 with [0, 0] bounds.

Float policy: the only non-integer ops are the wave-12 ln() micro-nat
round (already cross-engine-proven by ``heldout_bigram_perplexity``),
the ranking division (single correctly-rounded double op on identical
integer inputs), and the share round (1e4 double mult/div in identical
order) — everything emitted is BIGINT or VARCHAR.

Scale: the LM tables are Zipf-bounded and the scoring pass is two
equi-joins + one broadcast scalar (the wave-12 shape); the NTILE window
hash-partitions by lang — within one language it is a single-partition
sort, the documented scale path being the two-pass approx-percentile
cutoff (the quality_token_budget_cutoff spine decomposition), with this
exact form as the oracle-parity reference.  The overlap matrix adds two
source-map equi-joins and two small aggregates to the banded pair
stream (never all-pairs).  The histogram is row-local + one aggregate.

Reference scope: composes the reference's aggregation surface with the
LLM-pipeline extension; no counterpart file exists — cited per SURVEY
§6 as a scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm import _SHINGLES_CTE
from .registry_llm6 import _SPLIT_CASE_DUCK as _SPLIT
from .registry_llm6 import _split_col

# =========================================================================
# CCNet perplexity partitioning — head / middle / tail per language
# =========================================================================

# CTE chain up to the per-doc bucketed frame ``ranked`` — shared
# verbatim by ccnet_perplexity_buckets (bucket aggregate) and
# registry_llm35.ccnet_bucket_dup_matrix (bucket × dup cross), so the
# two gates can never disagree about a head/middle/tail assignment.
_CCNET_RANKED_CTES = f"""tf AS (
        SELECT doc_id, lang,
               {_SPLIT.format(id='doc_id')} AS split,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ),
    pos AS (
        SELECT doc_id, lang, split, toks, unnest(range(1, len(toks))) AS i
        FROM tf WHERE len(toks) >= 2
    ),
    bg AS (SELECT doc_id, lang, split, toks[i] AS a, toks[i + 1] AS b
           FROM pos),
    cab AS (SELECT a, b, COUNT(*) AS n_ab FROM bg
            WHERE split = 'train' GROUP BY 1, 2),
    ca  AS (SELECT a, COUNT(*) AS n_a FROM bg
            WHERE split = 'train' GROUP BY 1),
    vt AS (
        SELECT CAST(COUNT(DISTINCT tk) AS BIGINT) AS v
        FROM (SELECT unnest(toks) AS tk FROM tf WHERE split = 'train')
    ),
    per_doc AS (
        SELECT doc_id, lang,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(CAST(round(ln(
                   CAST(COALESCE(cab.n_ab, 0) + 1 AS DOUBLE)
                   / CAST(COALESCE(ca.n_a, 0) + vt.v AS DOUBLE)) * 1e6)
                   AS BIGINT)) AS BIGINT) AS lp_micro
        FROM bg
        LEFT JOIN cab USING (a, b)
        LEFT JOIN ca USING (a)
        CROSS JOIN vt
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT doc_id, lang, n_bigrams, lp_micro,
               ntile(3) OVER (
                   PARTITION BY lang
                   ORDER BY CAST(lp_micro AS DOUBLE) / n_bigrams DESC,
                            doc_id) AS bucket
        FROM per_doc
    )"""

_CCNET_SQL = f"""
    WITH {_CCNET_RANKED_CTES}
    SELECT lang, CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
           CAST(SUM(lp_micro) AS BIGINT) AS lp_micro_total
    FROM ranked
    GROUP BY 1, 2
"""


def _ccnet_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc (doc_id, lang, n_bigrams, lp_micro, bucket) — the Spark
    twin of ``_CCNET_RANKED_CTES``, shared by ccnet_perplexity_buckets
    and registry_llm35.ccnet_bucket_dup_matrix.  Covers docs with >= 2
    tokens (the bigram domain); bucket 1 = head."""
    docs = t(spark, sf_dir, "documents").withColumn("split", _split_col())
    tf = docs.select(
        "doc_id", "lang", "split",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("toks"))
    bg = tf.filter(F.size("toks") >= 2).select(
        "doc_id", "lang", "split",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS a,"
                "             element_at(toks, i + 1) AS b))"
            )
        ).alias("p"),
    ).select("doc_id", "lang", "split",
             F.col("p.a").alias("a"), F.col("p.b").alias("b"))
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
    per_doc = (
        bg.join(cab, ["a", "b"], "left")
        .join(ca, "a", "left")
        .crossJoin(F.broadcast(vt))
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(lp).cast("long").alias("lp_micro"),
        )
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc(F.col("lp_micro").cast("double") / F.col("n_bigrams")),
        F.asc("doc_id"))
    return per_doc.withColumn("bucket", F.ntile(3).over(w).cast("long"))


@register("ccnet_perplexity_buckets", _CCNET_SQL)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail partition — see module docstring and
    :func:`_ccnet_bucketed` (the shared per-doc bucketing).  Bucket
    1 = head (highest mean log-probability = lowest perplexity)."""
    return (
        _ccnet_bucketed(spark, sf_dir)
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_bigrams").cast("long").alias("n_bigrams"),
            F.sum("lp_micro").cast("long").alias("lp_micro_total"),
        )
    )


# =========================================================================
# cross-source redundancy matrix
# =========================================================================

_OVERLAP_SQL = f"""
    WITH {_SHINGLES_CTE},
    pairs AS (
        SELECT d1, d2
        FROM ipair
        JOIN sz sa ON sa.doc_id = d1
        JOIN sz sb ON sb.doc_id = d2
        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 5e-1
    ),
    sp AS (
        SELECT least(da.source, db.source) AS src_a,
               greatest(da.source, db.source) AS src_b,
               d1, d2
        FROM pairs
        JOIN documents da ON da.doc_id = d1
        JOIN documents db ON db.doc_id = d2
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sp),
    pc AS (
        SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM sp GROUP BY 1, 2
    ),
    dc AS (
        SELECT src_a, src_b,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM (
            SELECT src_a, src_b, d1 AS doc_id FROM sp
            UNION ALL
            SELECT src_a, src_b, d2 AS doc_id FROM sp
        ) GROUP BY 1, 2
    )
    SELECT pc.src_a, pc.src_b, pc.n_pairs, dc.n_docs,
           CAST(round(1e4 * pc.n_pairs / tot.n) AS BIGINT)
               AS pair_share_bp
    FROM pc
    JOIN dc USING (src_a, src_b)
    CROSS JOIN tot
"""


@register("source_overlap_matrix", _OVERLAP_SQL)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-dup redundancy matrix — see module docstring.
    The Spark pair inventory is the banded MinHash-LSH path with exact
    verification (the ``dedup_minhash_lsh`` device); the oracle states
    the brute-force inventory the LSH path is pinned equal to."""
    from .operators.dedup import minhash_lsh_pairs
    from .operators.materialize import scoped_persist

    docs = t(spark, sf_dir, "documents")
    src = docs.select("doc_id", "source")
    pairs = minhash_lsh_pairs(docs, threshold=0.5).select("d1", "d2")
    sp = scoped_persist(
        pairs
        .join(src.withColumnRenamed("doc_id", "d1")
              .withColumnRenamed("source", "s1"), "d1")
        .join(src.withColumnRenamed("doc_id", "d2")
              .withColumnRenamed("source", "s2"), "d2")
        .select(
            F.least("s1", "s2").alias("src_a"),
            F.greatest("s1", "s2").alias("src_b"),
            "d1", "d2"))
    tot = sp.agg(F.count("*").cast("long").alias("n"))
    pc = sp.groupBy("src_a", "src_b").agg(
        F.count("*").cast("long").alias("n_pairs"))
    dc = (
        sp.select("src_a", "src_b", F.col("d1").alias("doc_id"))
        .unionAll(sp.select("src_a", "src_b", F.col("d2").alias("doc_id")))
        .groupBy("src_a", "src_b")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    )
    return (
        pc.join(dc, ["src_a", "src_b"])
        .crossJoin(F.broadcast(tot))
        .select(
            "src_a", "src_b", "n_pairs", "n_docs",
            F.round(F.lit(1e4) * F.col("n_pairs") / F.col("n"))
            .cast("long").alias("pair_share_bp"))
    )


# =========================================================================
# datasheet length histogram — log2 token buckets per source
# =========================================================================

_HIST_SQL = """
    WITH tl AS (
        SELECT source,
               len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n
        FROM documents
    ),
    b AS (
        SELECT source, n,
               CASE WHEN n = 0 THEN -1
                    ELSE length(bin(n)) - 1 END AS bucket
        FROM tl
    ),
    g AS (
        SELECT source, bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS total_tokens
        FROM b
        GROUP BY source, bucket
    )
    SELECT source, CAST(bucket AS BIGINT) AS bucket,
           CAST(CASE WHEN bucket < 0 THEN 0
                     ELSE 1 << bucket END AS BIGINT) AS lo_tokens,
           CAST(CASE WHEN bucket < 0 THEN 0
                     ELSE (1 << (bucket + 1)) - 1 END AS BIGINT)
               AS hi_tokens,
           n_docs, total_tokens
    FROM g
"""


@register("doc_length_histogram", _HIST_SQL)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source log2 token-length histogram — see module docstring.
    Bucket index = length(bin(n)) - 1 (integer floor(log2), no float at
    the power-of-two boundaries)."""
    docs = t(spark, sf_dir, "documents")
    tl = docs.select(
        "source",
        F.expr("size(filter(split(text, ' '), x -> x != ''))")
        .cast("long").alias("n"))
    b = tl.withColumn(
        "bucket",
        F.when(F.col("n") == 0, F.lit(-1).cast("long"))
        .otherwise((F.length(F.bin("n")) - 1).cast("long")))
    return (
        b.groupBy("source", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n").cast("long").alias("total_tokens"))
        .select(
            "source", "bucket",
            F.when(F.col("bucket") < 0, F.lit(0).cast("long"))
            .otherwise(F.expr("shiftleft(1L, CAST(bucket AS INT))"))
            .cast("long").alias("lo_tokens"),
            F.when(F.col("bucket") < 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr("shiftleft(1L, CAST(bucket + 1 AS INT))") - 1)
            .cast("long").alias("hi_tokens"),
            "n_docs", "total_tokens")
    )
