"""Coverage wave 33 (round 9) — LSH operational monitoring, k-anonymity
safety reporting, and capped-eval retrieval quality.

- ``lsh_bucket_skew``: the HOT-BUCKET monitor for banded MinHash LSH —
  the quantity that decides whether the candidate-verify stage survives
  100 TB.  Banding replaces the all-pairs join with per-(band, bucket)
  self-joins, so verify cost is Σ C(bucket_size, 2); one degenerate
  bucket (a boilerplate shingle signature shared by millions of docs)
  re-creates the quadratic blowup inside a single reducer.  Per
  (bands, rows_per_band, band) over the wave-17 md5 signature family:
  signatures, distinct buckets, max bucket size, collision pairs
  (= exactly the candidate-join output size before dedup), and the top
  bucket's share of those pairs in bp.  The operational twin of
  ``minhash_band_sweep`` (that gate prices recall/precision, this one
  prices COST) and of ``hash_shard_skew`` (which monitors uniform
  shards; LSH buckets are adversarially non-uniform by design).

- ``kanonymity_report``: the k-anonymity safety datasheet over the
  quasi-identifier tuple (source, lang, log2-length bucket — the
  wave-27 integer ``length(bin(n))-1`` device): per QI group its size
  k and the k < 5 at-risk flag.  The release-safety complement
  of ``pii_inventory``: PII scanning finds direct identifiers;
  k-anonymity prices re-identification risk from quasi-identifiers
  (Sweeney 2002).  Re-publishing a curated corpus slice keyed by
  such tuples leaks membership for any group smaller than k.

- ``retrieval_mrr_capped_eval``: retrieval quality of the embedding
  space priced as MRR@10 — per capped-eval query (the llm5 128-query
  benchmark, byte-shared via _KNN_CAPPED_TOP_CTES / _knn_capped_ranked
  so this gate can never disagree with the kNN gate on a neighbor
  ranking), the rank of the FIRST same-label training neighbor within
  the top 10; per label: queries, hits, Σ round(1e6/rank) exact
  BIGINT, and MRR@10 = round(Σrr/n) micro (one correctly-rounded
  double division — the ccnet device).  The eval-side metric ANN
  deployments quote next to recall@k.

Scale shapes: bucket skew re-aggregates the signature table (linear,
the band key is the shuffle key — exactly the skew object being
measured, which is the point: the monitor sees what the join would);
k-anonymity is one row-local bucket expression + one hash aggregate;
MRR is the capped broadcast scan + a per-query MIN over 10 rows.

Reference scope: composes the reference's aggregation surface
(src/transform/etl_pipeline.py groupbys) with the LLM-pipeline
extension; no counterpart file exists — cited per SURVEY §6 as a scale
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm6 import _MH_K
from .registry_llm17 import _BAND_CONFIGS

_K_ANON = 5  # groups smaller than this are at-risk (the classic k=5 bar)


# =========================================================================
# lsh_bucket_skew — per-band bucket occupancy / collision-cost monitor
# =========================================================================

def _skew_cfg_ctes(bands: int, rows: int) -> str:
    sfx = f"_{bands}_{rows}"
    return f"""bs{sfx} AS (
        SELECT doc_id, i // {rows} AS band,
               string_agg(h, ',' ORDER BY i) AS bsig
        FROM sig GROUP BY 1, 2
    ),
    bk{sfx} AS (
        SELECT band, bsig, CAST(COUNT(*) AS BIGINT) AS sz
        FROM bs{sfx} GROUP BY 1, 2
    ),
    row{sfx} AS (
        SELECT CAST({bands} AS BIGINT) AS bands,
               CAST({rows} AS BIGINT) AS rows_per_band,
               CAST(band AS BIGINT) AS band,
               CAST(SUM(sz) AS BIGINT) AS n_sigs,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(MAX(sz) AS BIGINT) AS max_bucket,
               CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS collision_pairs,
               CAST(CASE WHEN SUM(sz * (sz - 1) // 2) = 0 THEN 0
                    ELSE round(1e4 * MAX(sz * (sz - 1) // 2)
                               / SUM(sz * (sz - 1) // 2)) END AS BIGINT)
                   AS top_bucket_pairs_bp
        FROM bk{sfx} GROUP BY 3
    )"""


def _skew_sql() -> str:
    cfg = ",\n    ".join(_skew_cfg_ctes(b, r) for b, r in _BAND_CONFIGS)
    rows = "\n    UNION ALL\n    ".join(
        f"SELECT * FROM row_{b}_{r}" for b, r in _BAND_CONFIGS)
    return f"""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(1, len(string_split(text, ' ')) - 2) + 1),
                   i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))))
                   AS s
        FROM documents
    ),
    sig AS (
        SELECT doc_id, ix.i,
               MIN(substr(md5(CAST(ix.i AS VARCHAR) || '|' || s), 1, 16)) AS h
        FROM sh CROSS JOIN (SELECT unnest(range(0, {_MH_K})) AS i) ix
        GROUP BY 1, 2
    ),
    {cfg}
    {rows}
    """


@register("lsh_bucket_skew", _skew_sql())
def lsh_bucket_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(config, band) LSH bucket occupancy and collision cost — see
    module docstring.  Byte-shares the wave-17 signature family
    (``shingle_table`` + the md5 per-hash MIN), so this monitor prices
    exactly the buckets ``minhash_band_sweep``'s candidate joins walk;
    collision_pairs equals that join's pre-distinct output size by
    construction (Σ C(sz, 2) over buckets)."""
    from .operators.dedup import shingle_table

    docs = t(spark, sf_dir, "documents")
    sh = shingle_table(docs)
    sig = (
        sh.select("doc_id", "s",
                  F.explode(F.sequence(F.lit(0), F.lit(_MH_K - 1)))
                  .alias("i"))
        .groupBy("doc_id", "i")
        .agg(F.min(F.substring(
            F.md5(F.concat(F.col("i").cast("string"), F.lit("|"),
                           F.col("s"))), 1, 16)).alias("h"))
    )
    from .operators.materialize import scoped_persist

    sig = scoped_persist(sig)
    parts = []
    for bands, r in _BAND_CONFIGS:
        bs = (
            sig.withColumn("band", F.expr(f"i div {r}"))
            .groupBy("doc_id", "band")
            .agg(F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("i", "h"))),
                    lambda x: x["h"]),
                ",").alias("bsig"))
        )
        bk = bs.groupBy("band", "bsig").agg(
            F.count("*").cast("long").alias("sz"))
        cp = F.sum(F.expr("sz * (sz - 1) div 2"))
        mp = F.max(F.expr("sz * (sz - 1) div 2"))
        parts.append(
            bk.groupBy(F.col("band").cast("long").alias("band")).agg(
                F.sum("sz").cast("long").alias("n_sigs"),
                F.count("*").cast("long").alias("n_buckets"),
                F.max("sz").cast("long").alias("max_bucket"),
                cp.cast("long").alias("collision_pairs"),
                F.when(cp == 0, F.lit(0)).otherwise(
                    F.round(F.lit(1e4) * mp / cp)).cast("long")
                .alias("top_bucket_pairs_bp"))
            .select(F.lit(bands).cast("long").alias("bands"),
                    F.lit(r).cast("long").alias("rows_per_band"),
                    "band", "n_sigs", "n_buckets", "max_bucket",
                    "collision_pairs", "top_bucket_pairs_bp"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# =========================================================================
# kanonymity_report — QI-group sizes over (source, lang, length bucket)
# =========================================================================

_KANON_SQL = f"""
    WITH tl AS (
        SELECT source, lang,
               len(list_filter(string_split(text, ' '), x -> x <> '')) AS n
        FROM documents
    ),
    b AS (
        SELECT source, lang,
               CASE WHEN n = 0 THEN -1
                    ELSE length(bin(n)) - 1 END AS len_bucket
        FROM tl
    )
    SELECT source, lang, CAST(len_bucket AS BIGINT) AS len_bucket,
           CAST(COUNT(*) AS BIGINT) AS k,
           COUNT(*) < {_K_ANON} AS at_risk
    FROM b GROUP BY 1, 2, 3
"""


@register("kanonymity_report", _KANON_SQL)
def kanonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity over the (source, lang, log2-length-bucket)
    quasi-identifier tuple — see module docstring.  The length bucket
    is the wave-27 integer device (length(bin(n)) - 1; -1 for empty
    docs) so this gate and doc_length_histogram can never disagree
    about a bucket edge.  One row-local expression + one hash
    aggregate: embarrassingly parallel at any scale."""
    docs = t(spark, sf_dir, "documents")
    n = F.expr("size(filter(split(text, ' '), x -> x != ''))")
    b = docs.select(
        "source", "lang",
        F.when(n == 0, F.lit(-1))
        .otherwise((F.length(F.bin(n)) - 1)).cast("long")
        .alias("len_bucket"))
    return b.groupBy("source", "lang", "len_bucket").agg(
        F.count("*").cast("long").alias("k"),
        (F.count("*") < _K_ANON).alias("at_risk"))


# =========================================================================
# retrieval_mrr_capped_eval — MRR@10 over the capped-eval benchmark
# =========================================================================

def _mrr_sql() -> str:
    from .registry_llm5 import _KNN_CAPPED_TOP_CTES

    return f"""
    WITH {_KNN_CAPPED_TOP_CTES},
    hit AS (
        SELECT qid, qlabel, MIN(rk) AS first_rank
        FROM top WHERE rk <= 10 AND nlabel = qlabel
        GROUP BY 1, 2
    ),
    qs AS (SELECT vec_id AS qid, label AS qlabel FROM q)
    SELECT qs.qlabel AS label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(COUNT(hit.first_rank) AS BIGINT) AS n_hit,
           CAST(COALESCE(SUM(CAST(round(1e6 / hit.first_rank) AS BIGINT)),
                         0) AS BIGINT) AS sum_rr_micro,
           CAST(round(COALESCE(SUM(CAST(round(1e6 / hit.first_rank)
                                        AS BIGINT)), 0)
                      / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS mrr_micro
    FROM qs LEFT JOIN hit USING (qid)
    GROUP BY 1
"""


@register("retrieval_mrr_capped_eval", _mrr_sql())
def retrieval_mrr_capped_eval(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """MRR@10 of the embedding space over the capped-eval benchmark —
    see module docstring.  Rankings come from
    registry_llm5._knn_capped_ranked (byte-shared with the capped kNN
    gate); per query the reciprocal rank is micro-quantized BEFORE the
    per-label sum (order-free integer), the final mean is one
    correctly-rounded double division; queries whose top-10 holds no
    same-label neighbor contribute rr = 0 (counted in n_queries, not
    n_hit)."""
    from .registry_llm5 import _knn_capped_ranked

    ranked = _knn_capped_ranked(spark, sf_dir)
    hit = (ranked.filter((F.col("rk") <= 10)
                         & (F.col("nlabel") == F.col("qlabel")))
           .groupBy("qid", "qlabel")
           .agg(F.min("rk").alias("first_rank")))
    qs = ranked.filter(F.col("rk") == 1).select("qid", "qlabel")
    rr = F.round(F.lit(1e6) / F.col("first_rank")).cast("long")
    return (
        qs.join(hit.select("qid", "first_rank"), "qid", "left")
        .groupBy(F.col("qlabel").alias("label"))
        .agg(F.count("*").cast("long").alias("n_queries"),
             F.count("first_rank").cast("long").alias("n_hit"),
             F.coalesce(F.sum(rr), F.lit(0)).cast("long")
             .alias("sum_rr_micro"),
             F.round(F.coalesce(F.sum(rr), F.lit(0))
                     / F.count("*").cast("double")).cast("long")
             .alias("mrr_micro"))
    )
