"""Coverage wave 34 (round 9) — the dedup keep-policy knob and the
DSIR resample DRAW (importance weights turned into an executed sample).

- ``dedup_keep_newest``: the other production keep policy.  The
  ``dedup_keep_canonical`` gate keeps the LONGEST doc per near-dup
  cluster (content-max); real crawl pipelines usually keep the NEWEST
  capture (freshness wins — doc_id is the arrival/ingest ordinal, the
  llm14 arrival-spine convention).  Same CC chain (LSH-verified
  Jaccard>=0.5 pairs -> min-label components), keeper = MAX doc_id per
  cluster, plus a per-cluster ``policy_differs`` flag marking where the
  newest-wins and longest-wins policies pick DIFFERENT survivors — the
  table a curation owner reads before choosing the knob.

- ``dsir_resample_draw``: DSIR scores turned into the sample they
  exist for.  ``dsir_importance_weights`` prices every doc with a log
  importance ratio; this gate executes the draw with the Gumbel
  TOP-K device (Vieira 2014; Kool et al. 2019 — sampling without
  replacement ∝ exp(score) == top-k by score + Gumbel noise): per doc,
  u from the md5 integer device (12 hex chars -> exact BIGINT in
  [0, 2^48)), U = (u+1)/(2^48+2) strictly inside (0,1),
  gumbel_micro = round(−ln(−ln U)·1e6), key = log_ratio_micro +
  gumbel_micro, and each source keeps its top ceil(n_s/4) keys
  (integer predicate 4·rank <= n_s + 3 — no float compare).  Fully
  deterministic and reproducible across engines/backfills — the
  property TABLESAMPLE/rand() sampling loses.

Scale shapes: keep-newest adds two cluster-partitioned windows over
the CC labels (cluster cardinality bounds the partition); the draw is
row-local scoring + ONE source-partitioned rank window (the ccnet
partitioned-window device; a 100 TB deployment with giant sources
swaps the window for a per-source TakeOrdered heap or the wave-20
score-spine decomposition — the selection predicate is already stated
as pure integers so either plan form reproduces it).

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
from .registry_llm11 import _DSIR_SQL

_DRAW_QUOTA_DEN = 4  # each source keeps ceil(n_s / 4) docs


# =========================================================================
# dedup_keep_newest — freshness-wins keep policy + policy-divergence flag
# =========================================================================

_KEEP_NEWEST_SQL = f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_CC_REACH_CTE},
    cc AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
           FROM reach GROUP BY src),
    lab AS (
        SELECT d.doc_id,
               COALESCE(cc.cluster_id, d.doc_id) AS cluster_id,
               length(d.text) AS n_chars
        FROM documents d LEFT JOIN cc USING (doc_id)
    ),
    rk AS (
        SELECT doc_id, cluster_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY cluster_id
                                  ORDER BY doc_id DESC) AS rn_new,
               ROW_NUMBER() OVER (PARTITION BY cluster_id
                                  ORDER BY n_chars DESC, doc_id) AS rn_long
        FROM lab
    )
    SELECT doc_id,
           CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(CASE WHEN rn_new = 1 THEN 1 ELSE 0 END AS BIGINT) AS keep,
           CAST(MAX(CASE WHEN rn_new = 1 AND rn_long <> 1
                         THEN 1 ELSE 0 END)
                OVER (PARTITION BY cluster_id) AS BIGINT)
               AS policy_differs
    FROM rk
"""


@register("dedup_keep_newest", _KEEP_NEWEST_SQL)
def dedup_keep_newest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness-wins cluster resolution — see module docstring.  The
    cluster chain is byte-shared with dedup_keep_canonical
    (minhash_lsh_pairs + connected_components / the _CC_REACH_CTE
    fixpoint), so the two policies partition the SAME clusters and
    differ only in the survivor (cross-gate agreement pytest-pinned:
    identical cluster_ids, exactly one keeper each, policy_differs==
    (newest keeper != longest keeper))."""
    from .operators.dedup import connected_components, minhash_lsh_pairs

    docs = t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5).select("d1", "d2")
    cc = connected_components(pairs).withColumnRenamed("node", "doc_id")
    lab = (
        docs.select("doc_id", F.length("text").alias("n_chars"))
        .join(cc, "doc_id", "left")
        .select("doc_id",
                F.coalesce("cluster_id", F.col("doc_id"))
                .alias("cluster_id"), "n_chars")
    )
    w_new = Window.partitionBy("cluster_id").orderBy(F.desc("doc_id"))
    w_long = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id"))
    rk = lab.select(
        "doc_id", "cluster_id",
        F.row_number().over(w_new).alias("rn_new"),
        F.row_number().over(w_long).alias("rn_long"))
    differs = F.max(
        F.when((F.col("rn_new") == 1) & (F.col("rn_long") != 1), 1)
        .otherwise(0)).over(Window.partitionBy("cluster_id"))
    return rk.select(
        "doc_id",
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.when(F.col("rn_new") == 1, 1).otherwise(0).cast("long")
        .alias("keep"),
        differs.cast("long").alias("policy_differs"))


# =========================================================================
# dsir_resample_draw — Gumbel top-k execution of the importance weights
# =========================================================================

def _hex12_to_int(expr: str) -> str:
    """DuckDB: first 12 hex chars of md5 -> exact BIGINT (the simhash
    hexval device widened to 48 bits)."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({expr}, {k + 1}, 1)) - 1)"
        f" * {16 ** (11 - k)}"
        for k in range(12)
    )


_U_DEN = float(2 ** 48 + 2)  # (u+1)/_U_DEN is strictly inside (0, 1)

_DRAW_SQL = f"""
    WITH dsir AS ({_DSIR_SQL}),
    src AS (SELECT doc_id, source FROM documents),
    g AS (
        SELECT d.doc_id, s.source, d.log_ratio_micro,
               CAST(round(-ln(-ln(
                   ({_hex12_to_int("md5('draw:' || CAST(d.doc_id AS VARCHAR))")}
                    + 1) / {_U_DEN!r})) * 1e6) AS BIGINT) AS gumbel_micro
        FROM dsir d JOIN src s USING (doc_id)
    ),
    keyed AS (
        SELECT doc_id, source, log_ratio_micro, gumbel_micro,
               log_ratio_micro + gumbel_micro AS key_micro
        FROM g
    ),
    n_s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM src
            GROUP BY 1),
    rk AS (
        SELECT k.*, n_s.n,
               ROW_NUMBER() OVER (PARTITION BY k.source
                                  ORDER BY k.key_micro DESC, k.doc_id)
                   AS sample_rank
        FROM keyed k JOIN n_s USING (source)
    )
    SELECT doc_id, source,
           CAST(log_ratio_micro AS BIGINT) AS log_ratio_micro,
           gumbel_micro,
           CAST(key_micro AS BIGINT) AS key_micro,
           CAST(sample_rank AS BIGINT) AS sample_rank,
           CAST(CASE WHEN {_DRAW_QUOTA_DEN} * sample_rank
                          <= n + {_DRAW_QUOTA_DEN - 1}
                     THEN 1 ELSE 0 END AS BIGINT) AS kept
    FROM rk
"""


@register("dsir_resample_draw", _DRAW_SQL)
def dsir_resample_draw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel top-k execution of the DSIR weights — see module
    docstring.  Scores are byte-shared with dsir_importance_weights
    (cross-gate agreement pytest-pinned); the Gumbel noise is a pure
    function of doc_id via the md5 integer device, so the draw is
    reproducible on any engine, any partitioning, any backfill.  The
    quota predicate 4·rank <= n_s + 3 (== rank <= ceil(n_s/4)) is pure
    integer."""
    from .registry_llm11 import dsir_importance_weights

    docs = t(spark, sf_dir, "documents")
    dsir = dsir_importance_weights(spark, sf_dir) \
        .select("doc_id", "log_ratio_micro")
    src = docs.select("doc_id", "source")
    hex12 = F.substring(
        F.md5(F.concat(F.lit("draw:"), F.col("doc_id").cast("string"))),
        1, 12)
    u = F.conv(hex12, 16, 10).cast("long")
    gum = F.round(-F.log(-F.log((u + 1) / F.lit(_U_DEN))) * 1e6) \
        .cast("long")
    keyed = (dsir.join(src, "doc_id")
             .withColumn("gumbel_micro", gum)
             .withColumn("key_micro",
                         (F.col("log_ratio_micro")
                          + F.col("gumbel_micro")).cast("long")))
    n_s = src.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    w = Window.partitionBy("source").orderBy(
        F.desc("key_micro"), F.asc("doc_id"))
    return (
        keyed.join(F.broadcast(n_s), "source")
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .select(
            "doc_id", "source", "log_ratio_micro", "gumbel_micro",
            "key_micro", "sample_rank",
            F.when(F.lit(_DRAW_QUOTA_DEN) * F.col("sample_rank")
                   <= F.col("n") + (_DRAW_QUOTA_DEN - 1), 1)
            .otherwise(0).cast("long").alias("kept"))
    )
