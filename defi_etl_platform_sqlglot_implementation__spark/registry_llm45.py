"""Coverage wave 46 (round 11) — the two staged wave-45 candidates
VERDICT r10 #4/#5 asked for: the PRODUCTION construction path for the
graph-ANN family, and span clipping at repeat-class granularity.

- ``graph_ann_two_stage``: IVF-bucketed candidate generation feeding
  the wave-43 ``(src, rk, dst, score)`` edge schema — the construction
  SCALE.md's graph-ANN entry promises ("at 100 TB construction
  delegates to blocked candidate generation feeding the SAME edge
  schema"), joining the trained-index family (IVF) to the graph
  family.  Stage 1: every capped node is indexed under its nearest
  centroid (top-1 by exact integer inner product of milli-quantized
  coordinates, centroid-id tie-break; centroids = the first 16 nodes,
  the registry's stand-in-codebook convention) and PROBES its top-2
  cells (the ann_ivf nprobe semantics with each node acting as the
  query).  Stage 2: exact integer scores on the CANDIDATES ONLY
  (nodes whose index cell is among the source's probed cells), top-8
  per source.  The ``in_exact`` comparison column marks edges that are
  also in the exact kNN digraph (``knn_graph_edges``) — Σ in_exact /
  (256·8) is the construction-recall the two-stage path buys, the
  eval column a deployment tunes nprobe against.  The exact graph is
  EVAL apparatus (capped-eval contract, 256² by construction); the
  production path is stage 1 + 2 only: candidate cost per node is
  O(corpus/cells · nprobe), never O(corpus).

- ``repeat_class_cut_plan``: the actionable CUT LIST wave 42's
  inventory implies — clipping at REPEAT-CLASS granularity: per class
  (span_md5) the minimum-(doc_id, start) occurrence is KEPT, every
  other occurrence is cut (the Lee-et-al. "keep one copy of each
  duplicated passage" policy, vs curation_clip_spans' blanket
  coverage cut that removes even the last copy).  Per source: docs
  affected, spans kept/cut, tokens before/removed, savings bp —
  token counts in the same unfiltered-whitespace position space as
  ``span_dedup_token_savings`` (tokens_total pinned equal per
  source), and Σ tokens_removed == Σ_class (n_occurrences − 1) ·
  span_tokens pinned against ``maximal_repeat_inventory``.

Scale shapes: two-stage graph construction adds one broadcast
centroid pairing (|codebook| ≈ dozens of rows — a literal in
disguise), one per-node rank window, and candidate-only scoring
joins — the O(n²) pairing is confined to the eval column; the cut
plan rides the one duplicated-shingle shuffle the span family pays,
plus one window keyed on the class hash (classes, not the corpus,
size that shuffle) and two hash aggregates.

Reference scope: composes the reference's aggregation surface
(src/transform/etl_pipeline.py groupbys) with the LLM-pipeline
extension; no counterpart file exists — cited per SURVEY §6 as a
scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm3 import _DUP_SHINGLE_CTES, _dup_shingle_frames
from .registry_llm42 import _G_K, _GRAPH_CTES, _IDOT, _graph_frames

_TS_CENTS = 16      # stand-in codebook: the first 16 capped nodes
_TS_NPROBE = 2      # cells each source node probes for candidates


# =========================================================================
# graph_ann_two_stage — IVF-bucketed kNN-graph construction
# =========================================================================

# stage 1 as SQL: the centroid ranking every two-stage gate shares
# (composes after _GRAPH_CTES, which provides nodes/nel)
_CENTROID_CTES = f"""cents AS (
        SELECT vec_id AS cid FROM nodes ORDER BY vec_id LIMIT {_TS_CENTS}
    ),
    cel AS (
        SELECT vec_id AS cid, dim, q FROM nel
        WHERE vec_id IN (SELECT cid FROM cents)
    ),
    nc AS (
        SELECT a.vec_id, c.cid, CAST(SUM(a.q * c.q) AS BIGINT) AS cscore
        FROM nel a JOIN cel c ON c.dim = a.dim
        GROUP BY 1, 2
    ),
    rkc AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY cscore DESC, cid) AS crk
        FROM nc
    ),
    asg1 AS (SELECT vec_id, cid FROM rkc WHERE crk = 1)"""

_TWO_STAGE_SQL = f"""
    WITH {_GRAPH_CTES},
    {_CENTROID_CTES},
    probes AS (SELECT vec_id, cid FROM rkc WHERE crk <= {_TS_NPROBE}),
    cand AS (
        SELECT p.vec_id AS src, a.vec_id AS dst
        FROM probes p JOIN asg1 a ON a.cid = p.cid
        WHERE a.vec_id <> p.vec_id
    ),
    scored AS (
        SELECT c.src, c.dst, np.score
        FROM cand c JOIN npairs np ON np.src = c.src AND np.dst = c.dst
    ),
    ivfg AS (
        SELECT src, dst, score,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY score DESC, dst) AS rk
        FROM scored QUALIFY rk <= {_G_K}
    )
    SELECT CAST(i.src AS BIGINT) AS src, CAST(i.rk AS BIGINT) AS rk,
           CAST(i.dst AS BIGINT) AS dst, i.score,
           CAST(CASE WHEN g.src IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
               AS in_exact
    FROM ivfg i LEFT JOIN graph g ON g.src = i.src AND g.dst = i.dst
"""


def _centroid_ranks(nodes: DataFrame) -> DataFrame:
    """(vec_id, cid, crk): every capped node's centroid ranking by exact
    integer inner product (cid tie-break) against the first-
    ``_TS_CENTS`` stand-in codebook — the stage-1 device shared by
    ``graph_ann_two_stage`` and its nprobe pricing curve
    (registry_llm46) so the two gates can never disagree."""
    cents = (nodes.orderBy("vec_id").limit(_TS_CENTS)
             .select(F.col("vec_id").alias("cid"),
                     F.col("qa").alias("ca")))
    nc = (nodes.crossJoin(F.broadcast(cents))
          .select("vec_id", "cid",
                  F.expr(_IDOT.format(a="qa", b="ca")).alias("cscore")))
    wc = Window.partitionBy("vec_id").orderBy(F.desc("cscore"), F.asc("cid"))
    return nc.withColumn("crk", F.row_number().over(wc))


def _two_stage_edges(nodes: DataFrame, nprobe: int) -> DataFrame:
    """(src, rk, dst, score) edges of the two-stage construction at the
    given nprobe: stage-1 candidates (probe top-``nprobe`` cells, match
    nodes indexed under them), stage-2 exact integer scores on the
    candidates only, top-``_G_K`` per source."""
    rkc = _centroid_ranks(nodes)
    asg1 = rkc.filter(F.col("crk") == 1).select(
        F.col("vec_id").alias("dst"), "cid")
    probes = rkc.filter(F.col("crk") <= nprobe).select(
        F.col("vec_id").alias("src"), "cid")
    cand = (probes.join(asg1, "cid")
            .filter(F.col("src") != F.col("dst"))
            .select("src", "dst"))
    scored = (
        cand.join(F.broadcast(nodes.select(F.col("vec_id").alias("src"),
                                           "qa")), "src")
        .join(F.broadcast(nodes.select(F.col("vec_id").alias("dst"),
                                       F.col("qa").alias("qb"))), "dst")
        .select("src", "dst",
                F.expr(_IDOT.format(a="qa", b="qb")).alias("score"))
    )
    ws = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
    return (scored.withColumn("rk", F.row_number().over(ws))
            .filter(F.col("rk") <= _G_K))


@register("graph_ann_two_stage", _TWO_STAGE_SQL)
def graph_ann_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed graph construction — see module docstring.  The
    Spark side scores CANDIDATES ONLY (the two-stage point: the oracle
    may reuse its full pair table, the engine must not), via the same
    zip_with integer fold as the exact graph; the exact edges join in
    solely as the ``in_exact`` eval column."""
    nodes, graph, _, _ = _graph_frames(spark, sf_dir)
    from .operators.materialize import scoped_persist

    nodes = scoped_persist(nodes)
    ivfg = _two_stage_edges(nodes, _TS_NPROBE)
    exact = graph.select("src", "dst", F.lit(1).alias("in_exact"))
    return (
        ivfg.join(F.broadcast(exact), ["src", "dst"], "left")
        .select(F.col("src").cast("long"), F.col("rk").cast("long"),
                F.col("dst").cast("long"), F.col("score").cast("long"),
                F.coalesce("in_exact", F.lit(0)).cast("long")
                .alias("in_exact"))
    )


# =========================================================================
# repeat_class_cut_plan — class-granular span clipping
# =========================================================================

_CUT_PLAN_SQL = f"""
    WITH {_DUP_SHINGLE_CTES},
    isl AS (
        SELECT doc_id, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS grp
        FROM hits
    ),
    spans AS (
        SELECT doc_id, MIN(pos) AS s, MAX(pos) + 7 AS e
        FROM isl GROUP BY doc_id, grp
    ),
    runs AS (
        SELECT sp.doc_id, sp.s,
               CAST(sp.e - sp.s + 1 AS BIGINT) AS span_tokens,
               md5(array_to_string(tk.l[sp.s:sp.e], ' ')) AS span_md5
        FROM spans sp JOIN toks tk ON tk.doc_id = sp.doc_id
    ),
    keep AS (
        SELECT doc_id, span_tokens,
               ROW_NUMBER() OVER (PARTITION BY span_md5
                                  ORDER BY doc_id, s) AS kr
        FROM runs
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN kr = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               CAST(SUM(CASE WHEN kr > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_cut,
               CAST(SUM(CASE WHEN kr > 1 THEN span_tokens ELSE 0 END)
                    AS BIGINT) AS cut_tokens
        FROM keep GROUP BY doc_id
    ),
    base AS (
        SELECT d.source,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
               COALESCE(p.n_kept, 0) AS n_kept,
               COALESCE(p.n_cut, 0) AS n_cut,
               COALESCE(p.cut_tokens, 0) AS cut_tokens
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN cut_tokens > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_affected,
           CAST(SUM(n_kept) AS BIGINT) AS spans_kept,
           CAST(SUM(n_cut) AS BIGINT) AS spans_cut,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
           CAST(SUM(cut_tokens) AS BIGINT) AS tokens_removed,
           CAST(round(1e4 * SUM(cut_tokens) / SUM(n_tok)) AS BIGINT)
               AS savings_bp
    FROM base GROUP BY source
"""


@register("repeat_class_cut_plan", _CUT_PLAN_SQL)
def repeat_class_cut_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-granular span cut plan — see module docstring.  Byte-shares
    the duplicated-shingle chain + island merge with
    ``maximal_repeat_inventory`` (same spans, same class hash); the
    keeper election is ONE window keyed on the class hash (min
    (doc_id, start) — deterministic attribution, classes size the
    shuffle), then per-doc and per-source hash aggregates."""
    toks, hits = _dup_shingle_frames(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        hits.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(F.min("pos").alias("s"), (F.max("pos") + 7).alias("e"))
    )
    runs = (
        spans.join(toks.select("doc_id", "l"), "doc_id")
        .select(
            "doc_id", "s",
            (F.col("e") - F.col("s") + 1).cast("long").alias("span_tokens"),
            F.md5(F.concat_ws(
                " ", F.expr("slice(l, s, e - s + 1)"))).alias("span_md5"),
        )
    )
    wk = Window.partitionBy("span_md5").orderBy("doc_id", "s")
    keep = runs.withColumn("kr", F.row_number().over(wk))
    per_doc = keep.groupBy("doc_id").agg(
        F.sum(F.when(F.col("kr") == 1, 1).otherwise(0)).cast("long")
        .alias("n_kept"),
        F.sum(F.when(F.col("kr") > 1, 1).otherwise(0)).cast("long")
        .alias("n_cut"),
        F.sum(F.when(F.col("kr") > 1, F.col("span_tokens")).otherwise(0))
        .cast("long").alias("cut_tokens"))
    docs = t(spark, sf_dir, "documents")
    base = (
        docs.select("source", "doc_id",
                    F.size(F.split("text", " ")).cast("long")
                    .alias("n_tok"))
        .join(per_doc, "doc_id", "left")
        .select("source", "n_tok",
                F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                F.coalesce("n_cut", F.lit(0)).alias("n_cut"),
                F.coalesce("cut_tokens", F.lit(0)).alias("cut_tokens"))
    )
    return (
        base.groupBy("source")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.sum(F.when(F.col("cut_tokens") > 0, 1).otherwise(0))
             .cast("long").alias("docs_affected"),
             F.sum("n_kept").cast("long").alias("spans_kept"),
             F.sum("n_cut").cast("long").alias("spans_cut"),
             F.sum("n_tok").cast("long").alias("tokens_total"),
             F.sum("cut_tokens").cast("long").alias("tokens_removed"),
             F.round(F.lit(1e4) * F.sum("cut_tokens") / F.sum("n_tok"))
             .cast("long").alias("savings_bp"))
    )
