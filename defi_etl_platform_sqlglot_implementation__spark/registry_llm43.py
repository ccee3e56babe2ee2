"""Coverage wave 44 (round 10) — cluster-geometry evidence for the CC
convergence claim, credential screening with a planted-secret oracle,
and the quality-flag drift monitor.

- ``cluster_diameter_report``: the MEASURED geometry behind
  ``connected_components``' convergence contract.  The CC docstring
  (operators/dedup.py) claims near-dup components are cliquish
  ("diameter 1-3, so min-label converges in 2-4 rounds"); this gate
  measures it on the exact-Jaccard near-dup graph (the verified pair
  set the banded LSH generator approximates): per cluster, the
  ECCENTRICITY of the canonical (min-id) node — the exact number of
  propagation rounds min-label needs for that cluster — via a 3-hop
  BFS from each canonical (ecc = 4 means ">3": some member unreached
  in 3 hops).  Output: per ecc value, cluster count, docs covered,
  largest cluster.  The claim is now a hash-gated table instead of a
  docstring assertion (the VERDICT r9 #5 pricing discipline applied
  to the round-9 heuristic's underlying assumption).

- ``secret_screening_report``: the credential/API-key screen a
  code/data curation pipeline runs before release — candidate tokens
  (>= 16 chars, base64-ish charset, >= 1 digit) scored by EXACT
  integer character entropy (the wave-31 A − round(B/N) micro-nat
  device over the token's char counts); high-entropy candidates are
  flagged secrets.  The corpus carries no natural secrets, so per the
  ``_PERTURB`` convention every doc_id % 37 == 0 is screened WITH a
  deterministic planted key (' sk_' || md5(doc_id) — 35 chars,
  ~2.5e6 micro-nats, both engines derive it identically), making
  found-exactly-the-planted-population part of the hash gate.  Per
  source: docs, candidates, secrets, docs flagged, flagged bp.

- ``quality_flag_drift``: the QUALITY twin of embedding_batch_drift /
  token_freq_drift — the gopher reject RATE per rank-spine ingest
  batch (4 id-ordered batches, the dense-on-any-id-domain spine),
  consecutive batches compared with the pure-integer cross-multiplied
  rate inequality 10^4·|r_c·n_p − r_p·n_c| > tau_bp·n_c·n_p
  (tau = 500 bp) — no float rate ever compared.  Gopher flags
  byte-share ``_gopher_flags_core`` (cross-gate marginal pinned).

Scale shapes: the diameter BFS expands only cluster members (cluster
count × diameter joins, each keyed on node — corpus-independent);
secret screening is a row-local regex + a candidate-only char explode
(candidates are rare by the length/charset filter); the drift monitor
is one doc-rank spine (the shard-decomposed window, no global sort)
+ a 4-row state join.

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

_ECC_CAP = 3            # BFS hop budget; ecc > cap reports as cap + 1
_SECRET_MOD = 37        # planted-secret population: doc_id % 37 == 0
_SECRET_ENT_MICRO = 2_000_000   # char-entropy threshold (micro-nats)
_QF_BATCHES = 4
_QF_TAU_BP = 500        # reject-rate shift threshold (basis points)


# =========================================================================
# cluster_diameter_report — canonical eccentricity of LSH clusters
# =========================================================================

_DIAMETER_SQL = f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_CC_REACH_CTE},
    asg AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
            FROM reach GROUP BY src),
    roots AS (SELECT DISTINCT cluster_id FROM asg),
    bfsr(root, node, d) AS (
        SELECT cluster_id, cluster_id, 0 FROM roots
        UNION
        SELECT b.root, s.b, b.d + 1
        FROM bfsr b JOIN sym s ON s.a = b.node
        WHERE b.d < {_ECC_CAP}
    ),
    mind AS (SELECT root, node, MIN(d) AS d FROM bfsr GROUP BY 1, 2),
    ecc AS (
        SELECT a.cluster_id,
               MAX(COALESCE(m.d, {_ECC_CAP + 1})) AS ecc,
               COUNT(*) AS sz
        FROM asg a LEFT JOIN mind m
          ON m.root = a.cluster_id AND m.node = a.doc_id
        GROUP BY 1
    )
    SELECT CAST(ecc AS BIGINT) AS ecc,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs,
           CAST(MAX(sz) AS BIGINT) AS max_cluster_size
    FROM ecc GROUP BY ecc
"""


@register("cluster_diameter_report", _DIAMETER_SQL)
def cluster_diameter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-node eccentricity per near-dup cluster — see module
    docstring.  The edge set is the EXACT Jaccard pair inventory
    (ngram_jaccard_pairs, threshold 0.5, oracle=True — the
    dedup_ngram_jaccard chain): unlike membership (dedup_clusters),
    eccentricity depends on the exact edge SET, not just connectivity —
    an LSH-missed edge inside an already-connected cluster would flip
    the measured ecc without changing membership (ADVICE r10 #2), so
    the banded generator is the wrong device here.  This also makes the
    row-for-row pin against ecc_by_threshold's 0.5 slice hold by
    construction.  The BFS is {_ECC_CAP} unrolled frontier expansions
    (equi-joins on node, left-anti dedup — the textbook distributed
    BFS, bounded by the very diameter it measures)."""
    from .operators.dedup import connected_components, ngram_jaccard_pairs
    from .operators.materialize import scoped_persist

    pairs = ngram_jaccard_pairs(
        t(spark, sf_dir, "documents"), threshold=0.5,
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
               .select("cluster_id", "node", F.lit(depth).alias("d")))
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
    return ecc.groupBy(F.col("ecc").cast("long").alias("ecc")).agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.sum("sz").cast("long").alias("n_docs"),
        F.max("sz").cast("long").alias("max_cluster_size"))


# =========================================================================
# secret_screening_report — planted-key credential screen
# =========================================================================

_SECRET_SQL = f"""
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
    ),
    per_doc AS (
        SELECT doc_id, source, COUNT(*) AS n_cand,
               SUM(CASE WHEN e_micro >= {_SECRET_ENT_MICRO}
                        THEN 1 ELSE 0 END) AS n_hi
        FROM ent GROUP BY 1, 2
    ),
    base AS (
        SELECT d.source, d.doc_id,
               COALESCE(p.n_cand, 0) AS n_cand,
               COALESCE(p.n_hi, 0) AS n_hi
        FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_cand) AS BIGINT) AS n_candidates,
           CAST(SUM(n_hi) AS BIGINT) AS n_secrets,
           CAST(SUM(CASE WHEN n_hi > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_flagged,
           CAST(round(1e4 * SUM(CASE WHEN n_hi > 0 THEN 1 ELSE 0 END)
                      / COUNT(*)) AS BIGINT) AS flagged_bp
    FROM base GROUP BY source
"""


@register("secret_screening_report", _SECRET_SQL)
def secret_screening_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credential screening with a planted-secret oracle — see module
    docstring.  Candidate selection is a row-local regex pair; the
    char explode runs on CANDIDATES only; entropy is the exact
    integer micro-nat device."""
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
        cand.select("doc_id", "source", "tok",
                    F.explode(F.sequence(F.lit(1), F.length("tok")))
                    .alias("i"))
        .select("doc_id", "source", "tok",
                F.expr("substring(tok, i, 1)").alias("ch"))
        .groupBy("doc_id", "source", "tok", "ch")
        .agg(F.count("*").alias("c"))
    )
    lnc = F.round(F.log(F.col("c").cast("double")) * 1e6).cast("long")
    ent = chc.groupBy("doc_id", "source", "tok").agg(
        (F.round(F.log(F.sum("c").cast("double")) * 1e6).cast("long")
         - F.round(F.sum(F.col("c") * lnc).cast("double") / F.sum("c"))
         .cast("long")).alias("e_micro"))
    per_doc = ent.groupBy("doc_id", "source").agg(
        F.count("*").alias("n_cand"),
        F.sum(F.when(F.col("e_micro") >= _SECRET_ENT_MICRO, 1)
              .otherwise(0)).alias("n_hi"))
    base = (
        docs.select("source", "doc_id")
        .join(per_doc.select("doc_id", "n_cand", "n_hi"), "doc_id", "left")
        .select("source",
                F.coalesce("n_cand", F.lit(0)).alias("n_cand"),
                F.coalesce("n_hi", F.lit(0)).alias("n_hi"))
    )
    flagged = F.sum(F.when(F.col("n_hi") > 0, 1).otherwise(0))
    return base.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_cand").cast("long").alias("n_candidates"),
        F.sum("n_hi").cast("long").alias("n_secrets"),
        flagged.cast("long").alias("docs_flagged"),
        F.round(F.lit(1e4) * flagged / F.count("*")).cast("long")
        .alias("flagged_bp"))


# =========================================================================
# quality_flag_drift — gopher reject rate over the ingest spine
# =========================================================================

_QF_GOPHER_CTES = """gt AS (
        SELECT doc_id, tok FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents) WHERE tok <> ''
    ),
    gc AS (SELECT doc_id, tok, COUNT(*) AS c FROM gt GROUP BY 1, 2),
    gm AS (
        SELECT doc_id, SUM(c) AS n_words, SUM(len(tok) * c) AS n_chars,
               COUNT(*) AS n_distinct, MAX(c) AS top_tok,
               SUM(CASE WHEN tok IN ('the', 'a') THEN c ELSE 0 END)
                   AS stop_hits
        FROM gc GROUP BY 1
    ),
    gflag AS (
        SELECT d.doc_id,
               CASE WHEN gm.n_words BETWEEN 30 AND 2500
                     AND (gm.n_chars * 100) // gm.n_words
                         BETWEEN 300 AND 1000
                     AND gm.n_distinct * 5 > gm.n_words
                     AND gm.top_tok * 100 < gm.n_words * 15
                     AND gm.stop_hits >= 2
                THEN 0 ELSE 1 END AS gopher_reject
        FROM documents d LEFT JOIN gm USING (doc_id)
    )"""

_QF_DRIFT_SQL = f"""
    WITH {_QF_GOPHER_CTES},
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    rk AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS rnk
           FROM documents),
    bat AS (
        SELECT (rk.rnk - 1) * {_QF_BATCHES} // n.n_docs AS batch,
               g.gopher_reject
        FROM gflag g JOIN rk USING (doc_id) CROSS JOIN n
    ),
    st AS (SELECT batch, CAST(COUNT(*) AS BIGINT) AS bn,
                  CAST(SUM(gopher_reject) AS BIGINT) AS br
           FROM bat GROUP BY 1)
    SELECT CAST(c.batch AS BIGINT) AS batch,
           c.bn AS n_cur, c.br AS rej_cur,
           p.bn AS n_prev, p.br AS rej_prev,
           CAST(CASE WHEN abs(c.br * p.bn - p.br * c.bn) * 10000
                          > {_QF_TAU_BP} * c.bn * p.bn
                THEN 1 ELSE 0 END AS BIGINT) AS drifted
    FROM st c JOIN st p ON p.batch = c.batch - 1
"""


@register("quality_flag_drift", _QF_DRIFT_SQL)
def quality_flag_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher reject rate per rank-spine batch with the integer
    cross-multiplied drift inequality — see module docstring.  The doc
    rank uses the shard-decomposed window (doc_id div 1024 — no global
    sort), the embedding_batch_drift device verbatim; flags come from
    ``_gopher_flags_core`` (byte-shared; docs outside the token domain
    reject, the quality_filter_venn convention)."""
    from .registry_llm5 import _gopher_flags_core

    docs = t(spark, sf_dir, "documents")
    flags = (docs.select("doc_id")
             .join(_gopher_flags_core(spark, sf_dir)
                   .select("doc_id", "keep"), "doc_id", "left")
             .select("doc_id",
                     F.when(F.coalesce("keep", F.lit(0)) == 1, 0)
                     .otherwise(1).alias("gopher_reject")))
    n = docs.agg(F.count("*").alias("n_docs"))
    ids = docs.select("doc_id").withColumn(
        "shard", F.expr("doc_id div 1024"))
    spine = ids.groupBy("shard").agg(F.count("*").alias("cnt"))
    w_spine = (Window.orderBy("shard")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    spine = spine.withColumn(
        "cum_before", F.sum("cnt").over(w_spine) - F.col("cnt"))
    w_in = Window.partitionBy("shard").orderBy("doc_id")
    ranked = (
        ids.withColumn("rn", F.row_number().over(w_in))
        .join(F.broadcast(spine.select("shard", "cum_before")), "shard")
        .select("doc_id", (F.col("cum_before") + F.col("rn")).alias("rnk"))
    )
    st = (
        flags.join(ranked, "doc_id").crossJoin(F.broadcast(n))
        .select(F.expr(f"((rnk - 1) * {_QF_BATCHES}) div n_docs")
                .alias("batch"), "gopher_reject")
        .groupBy("batch")
        .agg(F.count("*").cast("long").alias("bn"),
             F.sum("gopher_reject").cast("long").alias("br"))
    )
    c = st.select("batch", F.col("bn").alias("n_cur"),
                  F.col("br").alias("rej_cur"))
    p = st.select((F.col("batch") + 1).alias("batch"),
                  F.col("bn").alias("n_prev"),
                  F.col("br").alias("rej_prev"))
    return (
        c.join(p, "batch")
        .select(F.col("batch").cast("long"),
                "n_cur", "rej_cur", "n_prev", "rej_prev",
                F.when(F.abs(F.col("rej_cur") * F.col("n_prev")
                             - F.col("rej_prev") * F.col("n_cur")) * 10000
                       > F.lit(_QF_TAU_BP) * F.col("n_cur")
                       * F.col("n_prev"), 1)
                .otherwise(0).cast("long").alias("drifted"))
    )
