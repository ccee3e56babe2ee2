"""Coverage wave 39 (round 9) — the hashing-trick collision monitor and
the dedup/sample ordering decision table.

- ``feature_hash_collision_report``: the feature-hashing (hashing
  trick, Weinberger et al. 2009) collision monitor — fastText-style
  featurizers hash tokens into 2^k buckets, and collisions silently
  merge features.  Per bucket (md5 first-2-hex -> 256 buckets): the
  vocabulary collision factor (distinct tokens landing there), total
  occurrences, the dominant token's count and its share bp.  The
  dashboard that decides k: a bucket whose top share is low is pure
  collision soup, and a hot bucket concentrates gradient mass.

- ``dedup_sample_order_effect``: does pipeline ORDER matter — dedup
  then sample, or sample then dedup?  Measured on the NEAR-dup cluster
  canonical (this corpus holds zero verbatim duplicates — verified,
  the exact-dedup order effect is vacuously 0 — but 45+ LSH clusters):
  dedup→sample resolves clusters on the FULL corpus (the
  dedup_clusters min-id canonical) then samples the survivors;
  sample→dedup resolves clusters on the SAMPLED subgraph (the pair
  stream restricted to sampled endpoints — exactly what running LSH on
  the sample yields, pair predicates being pairwise) and keeps its
  canonicals.  The draw is a flat 25% md5 hex draw keyed 'ord:'
  (salted independently of every other spine).  Per source: corpus
  docs, survivors under each order, delta.  The containment theorem (a
  sampled global canonical is the min of its sampled subcluster, so
  sample→dedup keeps a SUPERSET) is pinned as delta >= 0 — the table
  quantifies exactly how much duplicate mass the cheaper sample-first
  order lets back in (4 docs at sf0.001).

Scale shapes: the collision report is one row-local bucket expression
+ a (bucket, token) count + a 256-partition window; the order-effect
table runs the banded pair stream ONCE and CC twice (full graph +
sampled subgraph — the subgraph is a filter of the same persisted pair
stream, never a second candidate join).

Reference scope: composes the reference's aggregation surface
(src/transform/etl_pipeline.py groupbys) with the LLM-pipeline
extension; no counterpart file exists — cited per SURVEY §6 as a scale
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm import _CC_REACH_CTE, _SHINGLES_CTE

_N_BUCKETS = 256       # 2 hex chars of md5(token)
_SAMPLE_HEX = ("0", "1", "2", "3")   # flat 25% draw on md5('ord:'||id)


# =========================================================================
# feature_hash_collision_report — hashing-trick bucket occupancy
# =========================================================================

_HASH2_DUCK = (
    "(strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16 + "
    "(strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1)"
)

_FEATURE_HASH_SQL = f"""
    WITH tk AS (
        SELECT tok FROM (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> ''
    ),
    tc AS (
        SELECT tok, {_HASH2_DUCK} AS bucket, CAST(COUNT(*) AS BIGINT) AS c
        FROM tk GROUP BY 1, 2
    ),
    rk AS (
        SELECT bucket, tok, c,
               ROW_NUMBER() OVER (PARTITION BY bucket
                                  ORDER BY c DESC, tok) AS r
        FROM tc
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
           CAST(SUM(c) AS BIGINT) AS total_count,
           CAST(MAX(CASE WHEN r = 1 THEN c END) AS BIGINT) AS top_count,
           CAST(round(1e4 * MAX(CASE WHEN r = 1 THEN c END) / SUM(c))
                AS BIGINT) AS top_share_bp
    FROM rk GROUP BY 1
"""


@register("feature_hash_collision_report", _FEATURE_HASH_SQL)
def feature_hash_collision_report(spark: SparkSession, sf_dir: str
                                  ) -> DataFrame:
    """Hashing-trick bucket occupancy — see module docstring.  The
    bucket is the exact integer of md5(token)'s first two hex chars
    (256 buckets); the dominant-token rank window partitions by bucket
    (vocabulary-sized partitions).  One explode + one (token, bucket)
    hash aggregate + one 256-row reduce."""
    docs = t(spark, sf_dir, "documents")
    tk = (docs.select(F.explode(F.split("text", " ")).alias("tok"))
          .filter(F.col("tok") != ""))
    tc = (tk.groupBy("tok")
          .agg(F.count("*").cast("long").alias("c"))
          .withColumn("bucket",
                      F.conv(F.substring(F.md5("tok"), 1, 2), 16, 10)
                      .cast("long")))
    w = Window.partitionBy("bucket").orderBy(F.desc("c"), F.asc("tok"))
    rk = tc.withColumn("r", F.row_number().over(w))
    top = F.max(F.when(F.col("r") == 1, F.col("c")))
    return rk.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_distinct_tokens"),
        F.sum("c").cast("long").alias("total_count"),
        top.cast("long").alias("top_count"),
        F.round(F.lit(1e4) * top / F.sum("c")).cast("long")
        .alias("top_share_bp"))


# =========================================================================
# dedup_sample_order_effect — dedup->sample vs sample->dedup
# =========================================================================

_ORDER_SQL = f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_CC_REACH_CTE},
    cc AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
           FROM reach GROUP BY src),
    samp AS (
        SELECT doc_id, source,
               substr(md5('ord:' || CAST(doc_id AS VARCHAR)), 1, 1)
                   IN ('0', '1', '2', '3') AS sampled
        FROM documents
    ),
    pairs_s AS (
        SELECT p.d1, p.d2
        FROM pairs p
        JOIN samp a ON a.doc_id = p.d1 AND a.sampled
        JOIN samp b ON b.doc_id = p.d2 AND b.sampled
    ),
    sym_s AS (
        SELECT d1 AS a, d2 AS b FROM pairs_s
        UNION
        SELECT d2 AS a, d1 AS b FROM pairs_s
    ),
    reach_s(src, dst) AS (
        SELECT DISTINCT a, a FROM sym_s
        UNION
        SELECT r.src, s.b FROM reach_s r JOIN sym_s s ON s.a = r.dst
    ),
    cc_s AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
             FROM reach_s GROUP BY src)
    SELECT sm.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN sm.sampled
                          AND COALESCE(cc.cluster_id, sm.doc_id)
                              = sm.doc_id
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS kept_dedup_first,
           CAST(SUM(CASE WHEN sm.sampled
                          AND COALESCE(cc_s.cluster_id, sm.doc_id)
                              = sm.doc_id
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS kept_sample_first,
           CAST(SUM(CASE WHEN sm.sampled
                          AND COALESCE(cc_s.cluster_id, sm.doc_id)
                              = sm.doc_id
                         THEN 1 ELSE 0 END)
                - SUM(CASE WHEN sm.sampled
                            AND COALESCE(cc.cluster_id, sm.doc_id)
                                = sm.doc_id
                           THEN 1 ELSE 0 END) AS BIGINT) AS delta
    FROM samp sm
    LEFT JOIN cc USING (doc_id)
    LEFT JOIN cc_s USING (doc_id)
    GROUP BY 1
"""


@register("dedup_sample_order_effect", _ORDER_SQL)
def dedup_sample_order_effect(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """Pipeline-order decision table over the near-dup canonical — see
    module docstring.  ONE banded pair stream (minhash_lsh_pairs,
    persisted) feeds BOTH resolutions: the full-graph CC and the
    sampled-subgraph CC (a semi-join filter of the same stream — never
    a second candidate join); canonicals are cluster-min (the
    dedup_clusters device).  delta >= 0 per source by the containment
    theorem (pinned in tests/test_llm38.py with a full union-find
    replay)."""
    from .operators.dedup import connected_components, minhash_lsh_pairs
    from .operators.materialize import scoped_persist

    docs = t(spark, sf_dir, "documents")
    samp = docs.select(
        "doc_id", "source",
        F.substring(F.md5(F.concat(F.lit("ord:"),
                                   F.col("doc_id").cast("string"))), 1, 1)
        .isin(*_SAMPLE_HEX).alias("sampled"))
    pairs = scoped_persist(
        minhash_lsh_pairs(docs, threshold=0.5).select("d1", "d2"))
    cc = connected_components(pairs).withColumnRenamed("node", "doc_id") \
        .withColumnRenamed("cluster_id", "cid_g")
    sampled_ids = samp.filter("sampled").select("doc_id")
    pairs_s = (pairs
               .join(sampled_ids.withColumnRenamed("doc_id", "d1"), "d1")
               .join(sampled_ids.withColumnRenamed("doc_id", "d2"), "d2"))
    cc_s = connected_components(pairs_s) \
        .withColumnRenamed("node", "doc_id") \
        .withColumnRenamed("cluster_id", "cid_s")
    j = (samp.join(cc, "doc_id", "left").join(cc_s, "doc_id", "left"))
    kept_a = F.sum(F.when(
        F.col("sampled")
        & (F.coalesce("cid_g", F.col("doc_id")) == F.col("doc_id")), 1)
        .otherwise(0))
    kept_b = F.sum(F.when(
        F.col("sampled")
        & (F.coalesce("cid_s", F.col("doc_id")) == F.col("doc_id")), 1)
        .otherwise(0))
    return j.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        kept_a.cast("long").alias("kept_dedup_first"),
        kept_b.cast("long").alias("kept_sample_first"),
        (kept_b - kept_a).cast("long").alias("delta"))
