"""Coverage wave 45 (round 10 epilogue) — two of the staged dials
priced: the secret-screening entropy threshold and the cluster
geometry as a function of the dedup verify threshold.

- ``secret_entropy_sweep``: the wave-44 screening threshold priced
  like nprobe/bands/num_bits — per ent_micro ∈ {1.8e6, 2.0e6, 2.2e6}
  over the SAME candidate/entropy chain as
  ``secret_screening_report`` (byte-shared construction): candidates,
  flagged secrets, docs flagged, and PLANTED RECALL bp (how many of
  the deterministic doc_id%37 plants each threshold catches — the
  quantity a screening owner tunes against).  Monotone-in-threshold
  pinned; the 2.0e6 row pinned equal to the wave-44 gate's marginals.

- ``ecc_by_threshold``: does loosening the near-dup verify threshold
  break the cliquish-cluster premise the CC fast path leans on?  The
  ``cluster_diameter_report`` construction swept over exact-Jaccard
  verify thresholds ∈ {0.3, 0.5, 0.7}: per (threshold, ecc) —
  cluster count, docs covered, largest cluster.  The 0.5 rows pin
  equal to the wave-44 gate; lower thresholds admit more/looser
  pairs, and whether ecc stays 1 (it does on this corpus, measured)
  is exactly the evidence that min-label round counts survive the
  dedup dial.  Oracle: three recursive BFS chains in one WITH
  RECURSIVE scope, suffixed (the _pi_chain_sql convention).

Scale shapes: the entropy sweep re-reads one candidate-only entropy
frame three times (row-local CASE per threshold — in Spark ONE pass
emits all three rows via explode of the threshold array);
ecc_by_threshold pays the pair-generation cost once per threshold
(at 100 TB a deployment sweeps thresholds on a sampled shard, the
gate pins the semantics); pair generation uses the EXACT exhaustive
form (oracle=True) on both engines — at 0.3 the LSH banding recall
(~78%/pair at the 0.5-tuned band config) would otherwise diverge
from the oracle's exhaustive ipair.

Reference scope: composes the reference's aggregation surface
(src/transform/etl_pipeline.py groupbys) with the LLM-pipeline
extension; no counterpart file exists — cited per SURVEY §6 as a
scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm import _SHINGLES_CTE
from .registry_llm43 import _ECC_CAP, _SECRET_MOD

_ENT_THRESHOLDS = (1_800_000, 2_000_000, 2_200_000)
_ECC_THRESHOLDS = ("0.3", "0.5", "0.7")


# =========================================================================
# secret_entropy_sweep — the screening threshold dial
# =========================================================================

def _secret_sweep_sql() -> str:
    # the wave-44 chain verbatim up to `ent`, then one row per threshold
    rows = []
    for thr in _ENT_THRESHOLDS:
        rows.append(f"""SELECT CAST({thr} AS BIGINT) AS ent_micro,
           CAST((SELECT COUNT(*) FROM ent) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN e_micro >= {thr} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_secrets,
           CAST(COUNT(DISTINCT CASE WHEN e_micro >= {thr}
                                    THEN doc_id END) AS BIGINT)
               AS docs_flagged,
           CAST(round(1e4 * COUNT(DISTINCT
                    CASE WHEN e_micro >= {thr} AND doc_id % {_SECRET_MOD} = 0
                         AND doc_id >= 0 THEN doc_id END)
                / (SELECT COUNT(*) FROM documents
                   WHERE doc_id % {_SECRET_MOD} = 0)) AS BIGINT)
               AS planted_recall_bp
    FROM ent""")
    body = "\n    UNION ALL\n    ".join(rows)
    return f"""
    WITH scr AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % {_SECRET_MOD} = 0
                    THEN text || ' sk_' || md5(CAST(doc_id AS VARCHAR))
                    ELSE text END AS stext
        FROM documents
    ),
    cand AS (
        SELECT DISTINCT doc_id, source, tok
        FROM (SELECT doc_id, source,
                     unnest(string_split(stext, ' ')) AS tok
              FROM scr)
        WHERE len(tok) >= 16
          AND regexp_matches(tok, '^[A-Za-z0-9_+/=-]+$')
          AND regexp_matches(tok, '[0-9]')
    ),
    chars AS (
        SELECT doc_id, source, tok, substr(tok, r.i, 1) AS ch
        FROM cand, LATERAL unnest(range(1, len(tok) + 1)) AS r(i)
    ),
    chc AS (SELECT doc_id, source, tok, ch, COUNT(*) AS c
            FROM chars GROUP BY 1, 2, 3, 4),
    ent AS (
        SELECT doc_id, source, tok,
               CAST(round(ln(CAST(SUM(c) AS DOUBLE)) * 1e6) AS BIGINT)
               - CAST(round(CAST(SUM(c * CAST(round(ln(CAST(c AS DOUBLE))
                                               * 1e6) AS BIGINT))
                                 AS DOUBLE) / SUM(c)) AS BIGINT) AS e_micro
        FROM chc GROUP BY 1, 2, 3
    )
    {body}
"""


@register("secret_entropy_sweep", _secret_sweep_sql())
def secret_entropy_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The screening-threshold dial — see module docstring.  ONE pass
    over the wave-44 candidate/entropy chain; the three threshold rows
    come from an explode of the threshold array (row-local), then one
    hash aggregate per threshold value."""
    docs = t(spark, sf_dir, "documents")
    scr = docs.select(
        "doc_id", "source",
        F.when(F.col("doc_id") % _SECRET_MOD == 0,
               F.concat(F.col("text"), F.lit(" sk_"),
                        F.md5(F.col("doc_id").cast("string"))))
        .otherwise(F.col("text")).alias("stext"))
    cand = (
        scr.select("doc_id", "source",
                   F.explode(F.split("stext", " ")).alias("tok"))
        .filter((F.length("tok") >= 16)
                & F.col("tok").rlike("^[A-Za-z0-9_+/=-]+$")
                & F.col("tok").rlike("[0-9]"))
        .distinct()
    )
    chc = (
        cand.select("doc_id", "tok",
                    F.explode(F.sequence(F.lit(1), F.length("tok")))
                    .alias("i"))
        .select("doc_id", "tok", F.expr("substring(tok, i, 1)").alias("ch"))
        .groupBy("doc_id", "tok", "ch").agg(F.count("*").alias("c"))
    )
    lnc = F.round(F.log(F.col("c").cast("double")) * 1e6).cast("long")
    ent = chc.groupBy("doc_id", "tok").agg(
        (F.round(F.log(F.sum("c").cast("double")) * 1e6).cast("long")
         - F.round(F.sum(F.col("c") * lnc).cast("double") / F.sum("c"))
         .cast("long")).alias("e_micro"))
    from .operators.materialize import scoped_persist

    ent = scoped_persist(ent)
    n_cand = ent.count()
    n_planted = docs.filter(F.col("doc_id") % _SECRET_MOD == 0).count()
    sw = ent.select(
        "doc_id", "e_micro",
        F.explode(F.array(*[F.lit(v) for v in _ENT_THRESHOLDS]))
        .alias("ent_micro"))
    hit = F.col("e_micro") >= F.col("ent_micro")
    return (
        sw.groupBy("ent_micro")
        .agg(F.lit(n_cand).cast("long").alias("n_candidates"),
             F.sum(F.when(hit, 1).otherwise(0)).cast("long")
             .alias("n_secrets"),
             F.countDistinct(F.when(hit, F.col("doc_id")))
             .cast("long").alias("docs_flagged"),
             F.round(F.lit(1e4) * F.countDistinct(
                 F.when(hit & (F.col("doc_id") % _SECRET_MOD == 0)
                        & (F.col("doc_id") >= 0), F.col("doc_id")))
                 / F.lit(float(n_planted))).cast("long")
             .alias("planted_recall_bp"))
        .select(F.col("ent_micro").cast("long"), "n_candidates",
                "n_secrets", "docs_flagged", "planted_recall_bp")
    )


# =========================================================================
# ecc_by_threshold — cluster geometry vs the dedup verify dial
# =========================================================================

def _ecc_thr_ctes(thr: str, sfx: str) -> str:
    """The wave-44 BFS-eccentricity chain at verify threshold ``thr``,
    CTE-suffixed so three thresholds share one WITH RECURSIVE scope."""
    return f"""pairs{sfx} AS (
        SELECT d1, d2
        FROM ipair
        JOIN sz sa ON sa.doc_id = d1
        JOIN sz sb ON sb.doc_id = d2
        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= {thr}
    ),
    sym{sfx} AS (
        SELECT d1 AS a, d2 AS b FROM pairs{sfx}
        UNION
        SELECT d2 AS a, d1 AS b FROM pairs{sfx}
    ),
    reach{sfx}(src, dst) AS (
        SELECT DISTINCT a, a FROM sym{sfx}
        UNION
        SELECT r.src, s.b FROM reach{sfx} r JOIN sym{sfx} s ON s.a = r.dst
    ),
    asg{sfx} AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
                 FROM reach{sfx} GROUP BY src),
    bfsr{sfx}(root, node, d) AS (
        SELECT cluster_id, cluster_id, 0
        FROM (SELECT DISTINCT cluster_id FROM asg{sfx})
        UNION
        SELECT b.root, s.b, b.d + 1
        FROM bfsr{sfx} b JOIN sym{sfx} s ON s.a = b.node
        WHERE b.d < {_ECC_CAP}
    ),
    mind{sfx} AS (SELECT root, node, MIN(d) AS d
                  FROM bfsr{sfx} GROUP BY 1, 2),
    ecc{sfx} AS (
        SELECT a.cluster_id,
               MAX(COALESCE(m.d, {_ECC_CAP + 1})) AS ecc,
               COUNT(*) AS sz
        FROM asg{sfx} a LEFT JOIN mind{sfx} m
          ON m.root = a.cluster_id AND m.node = a.doc_id
        GROUP BY 1
    )"""


def _ecc_thr_sql() -> str:
    chains = [_ecc_thr_ctes(t_, f"_t{t_.replace('.', '')}")
              for t_ in _ECC_THRESHOLDS]
    selects = []
    for t_ in _ECC_THRESHOLDS:
        sfx = f"_t{t_.replace('.', '')}"
        selects.append(f"""SELECT CAST(round({t_} * 100) AS BIGINT)
               AS threshold_pct,
           CAST(ecc AS BIGINT) AS ecc,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs,
           CAST(MAX(sz) AS BIGINT) AS max_cluster_size
    FROM ecc{sfx} GROUP BY ecc""")
    return ("\n    WITH RECURSIVE " + _SHINGLES_CTE + ",\n    "
            + ",\n    ".join(chains) + "\n    "
            + "\n    UNION ALL\n    ".join(selects))


@register("ecc_by_threshold", _ecc_thr_sql())
def ecc_by_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster geometry vs the verify-threshold dial — see module
    docstring.  One BFS-eccentricity report per exact-Jaccard verify
    threshold, each byte-sharing the wave-44 construction (pairs →
    CC → unrolled BFS); the 0.5 slice equals cluster_diameter_report
    row-for-row (pinned)."""
    from .operators.dedup import connected_components, ngram_jaccard_pairs
    from .operators.materialize import scoped_persist

    docs = t(spark, sf_dir, "documents")
    parts = []
    for t_ in _ECC_THRESHOLDS:
        # exact exhaustive pairs (oracle=True): at 0.3 the LSH banding
        # recall (~78% per pair) would diverge from the oracle's
        # exhaustive ipair — the sweep prices GEOMETRY, not banding
        pairs = ngram_jaccard_pairs(docs, threshold=float(t_),
                                    oracle=True).select("d1", "d2")
        pairs = scoped_persist(pairs)
        sym = pairs.unionAll(
            pairs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2"))
        ).select(F.col("d1").alias("a"), F.col("d2").alias("b")).distinct()
        sym = scoped_persist(sym)
        asg = connected_components(pairs).select(
            F.col("node").alias("doc_id"), "cluster_id")
        reached = (asg.select("cluster_id").distinct()
                   .select("cluster_id",
                           F.col("cluster_id").alias("node"),
                           F.lit(0).alias("d")))
        frontier = reached
        for depth in range(1, _ECC_CAP + 1):
            nxt = (frontier.join(sym, frontier.node == sym.a)
                   .select("cluster_id", F.col("b").alias("node"))
                   .distinct()
                   .join(reached.select("cluster_id", "node"),
                         ["cluster_id", "node"], "left_anti")
                   .select("cluster_id", "node",
                           F.lit(depth).alias("d")))
            reached = reached.unionByName(nxt)
            frontier = nxt
        ecc = (
            asg.join(reached.select("cluster_id",
                                    F.col("node").alias("doc_id"), "d"),
                     ["cluster_id", "doc_id"], "left")
            .groupBy("cluster_id")
            .agg(F.max(F.coalesce("d", F.lit(_ECC_CAP + 1))).alias("ecc"),
                 F.count("*").alias("sz"))
        )
        parts.append(
            ecc.groupBy(F.col("ecc").cast("long").alias("ecc"))
            .agg(F.count("*").cast("long").alias("n_clusters"),
                 F.sum("sz").cast("long").alias("n_docs"),
                 F.max("sz").cast("long").alias("max_cluster_size"))
            .select(F.lit(round(float(t_) * 100)).cast("long")
                    .alias("threshold_pct"),
                    "ecc", "n_clusters", "n_docs", "max_cluster_size")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
