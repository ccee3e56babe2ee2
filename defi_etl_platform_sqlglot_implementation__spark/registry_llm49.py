"""Coverage wave 50 (round 11) — two more production dials priced:
quality-rule strictness and the IVF codebook-size knob.

- ``gopher_strictness_curve``: how strict should the Gopher-style rule
  bundle be?  Three strictness levels with NESTED acceptance regions
  per rule — lenient ⊃ standard ⊃ strict, where standard is EXACTLY
  ``gopher_quality_flags``'s thresholds (len ∈ [30,2500], mean word
  length ∈ [3.00,10.00] chars, distinct ratio > 0.20, top-token share
  < 0.15, stopword hits ≥ 2) — reporting per level the per-rule pass
  counts, conjunctive keeps, and keep rate (bp) over ALL documents
  (empty-token docs fail every rule at every level, the public gate's
  zero-fill convention).  Containment theorem: every acceptance region
  is nested by construction, so every pass count and the keep count
  are non-increasing in strictness — pinned per column.  The standard
  row equals ``gopher_quality_flags``'s column sums — pinned in
  tests/test_llm49.py (the registry_llm43 cross-module convention: the
  metric chain is reproduced here verbatim and the marginal equality
  is enforced against the live gate).  All thresholds compare in
  INTEGER arithmetic (``n_distinct·100 > n_words·p``), the flag core's
  no-rounding-edge rule.

- ``ivf_codebook_size_curve``: the codebook-size knob the IVF family
  has not priced (nprobe is priced twice — flat and graph two-stage;
  bands, num_bits, beam, rerank depth are priced; n_centroids was
  not).  Per n_centroids ∈ {8, 16, 32} at the production nprobe=4:
  occupied cells, the largest cell's corpus share (bp), candidates
  scanned (the COST: Σ probed cell sizes − self-hits, computed from
  cell sizes — O(cells), not O(candidates)), true-top-10 hits of the
  IVF result, and recall (bp).  More cells ⇒ finer partition ⇒ fewer
  candidates at fixed nprobe ⇒ recall can only fall or hold on the
  probed fraction — the cost/recall trade priced in one table (no
  containment theorem here: probe sets are not nested across codebook
  sizes; the dial is measured, not proved).  The 16-cell row rides the
  exact chains of ``similarity_ann_recall`` (hits) and
  ``ivf_balance_report`` (occupancy/share) — both pinned in tests.

Scale shapes: the strictness curve is the flag core's one explode +
two hash aggregates, then three constant-folded conditional sums over
ONE persisted doc-metric frame (|docs| rows); the codebook curve is
three map-only Arrow assignments + k-row cell folds + one broadcast
candidate join per size — the ann_ivf posture, with the candidate
COUNT derived from cell sizes so pricing the dial never pays the
largest codebook's scan twice.

Reference scope: composes the reference's aggregation surface with the
LLM-pipeline extension; no counterpart file exists — cited per
SURVEY §6 as a scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm import _dot_chain

# (rank, name, len_lo, len_hi, wlen_lo, wlen_hi, distinct_pct_gt,
#  toptok_pct_lt, stop_min) — standard == gopher_quality_flags exactly
# (n_distinct·100 > n_words·20  ⇔  n_distinct·5 > n_words)
_STRICT_LEVELS = (
    (1, "lenient", 15, 5000, 250, 1200, 10, 25, 1),
    (2, "standard", 30, 2500, 300, 1000, 20, 15, 2),
    (3, "strict", 60, 1250, 350, 800, 30, 10, 3),
)

# the gopher_quality_flags metric chain, reproduced verbatim (the
# registry_llm43 _QF_GOPHER_CTES convention — cross-module equality is
# enforced by the marginal pin in tests, not by a shared import)
_GMETRIC_CTES = """toks AS (
        SELECT doc_id, tok
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        WHERE tok <> ''
    ),
    tc AS (
        SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2
    ),
    m AS (
        SELECT doc_id,
               SUM(c) AS n_words,
               SUM(len(tok) * c) AS n_chars,
               COUNT(*) AS n_distinct,
               MAX(c) AS top_tok,
               SUM(CASE WHEN tok IN ('the', 'a') THEN c ELSE 0 END)
                   AS stop_hits
        FROM tc GROUP BY 1
    ),
    base AS (
        SELECT d.doc_id, m.n_words, m.n_chars, m.n_distinct, m.top_tok,
               m.stop_hits
        FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id
    )"""


def _strictness_sql() -> str:
    rows = []
    for rank, name, llo, lhi, wlo, whi, dp, tp, smin in _STRICT_LEVELS:
        conds = {
            "len": f"n_words BETWEEN {llo} AND {lhi}",
            "wlen": f"(n_chars * 100) // n_words BETWEEN {wlo} AND {whi}",
            "distinct": f"n_distinct * 100 > n_words * {dp}",
            "toptok": f"top_tok * 100 < n_words * {tp}",
            "stop": f"stop_hits >= {smin}",
        }
        passes = ",\n           ".join(
            f"CAST(SUM(CASE WHEN {c} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS pass_{k}" for k, c in conds.items())
        keep = " AND ".join(conds.values())
        rows.append(f"""SELECT {rank} AS level_rank, '{name}' AS level,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           {passes},
           CAST(SUM(CASE WHEN {keep} THEN 1 ELSE 0 END) AS BIGINT)
               AS kept_docs,
           CAST((SUM(CASE WHEN {keep} THEN 1 ELSE 0 END) * 10000)
                // COUNT(*) AS BIGINT) AS kept_rate_bp
    FROM base""")
    body = "\n    UNION ALL\n    ".join(rows)
    return f"\n    WITH {_GMETRIC_CTES}\n    {body}\n    "


@register("gopher_strictness_curve", _strictness_sql())
def gopher_strictness_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-rule strictness dial — see module docstring.  ONE
    persisted doc-metric frame feeds all three levels as conditional
    sums; empty-token docs carry NULL metrics and fail every rule (the
    gopher_quality_flags zero-fill convention)."""
    from .operators.materialize import scoped_persist

    docs = t(spark, sf_dir, "documents")
    toks = (docs.select("doc_id", F.explode(F.split("text", " "))
                        .alias("tok"))
            .filter(F.col("tok") != ""))
    tc = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    m = tc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.sum(F.length("tok") * F.col("c")).alias("n_chars"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_tok"),
        F.sum(F.when(F.col("tok").isin("the", "a"), F.col("c"))
              .otherwise(0)).alias("stop_hits"))
    base = scoped_persist(
        docs.select("doc_id").join(m, "doc_id", "left"))

    parts = []
    for rank, name, llo, lhi, wlo, whi, dp, tp, smin in _STRICT_LEVELS:
        conds = {
            "len": F.col("n_words").between(llo, lhi),
            "wlen": F.expr("(n_chars * 100) div n_words")
            .between(wlo, whi),
            "distinct": F.col("n_distinct") * 100 > F.col("n_words") * dp,
            "toptok": F.col("top_tok") * 100 < F.col("n_words") * tp,
            "stop": F.col("stop_hits") >= smin,
        }
        keep = conds["len"] & conds["wlen"] & conds["distinct"] \
            & conds["toptok"] & conds["stop"]
        aggs = [F.count("*").cast("long").alias("n_docs")]
        aggs += [F.sum(F.when(c, 1).otherwise(0)).cast("long")
                 .alias(f"pass_{k}") for k, c in conds.items()]
        aggs += [F.sum(F.when(keep, 1).otherwise(0)).cast("long")
                 .alias("kept_docs")]
        parts.append(
            base.agg(F.lit(rank).cast("long").alias("level_rank"),
                     F.lit(name).alias("level"), *aggs)
            .withColumn("kept_rate_bp",
                        F.expr("(kept_docs * 10000) div n_docs")
                        .cast("long")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_CB_SIZES = (8, 16, 32)
_CB_NPROBE = 4
_CB_K = 10


def _codebook_curve_sql() -> str:
    """One self-contained chain per codebook size (nested WITH in a
    subquery — the CTE-name-clash convention), each mirroring the
    similarity_ann_recall oracle's assignment/probe/candidate chains
    with the size parameterized, plus the cell-size-derived candidate
    count and occupancy columns.

    Two DuckDB-robustness rules, both load-bearing: (1) every chain
    CTE is MATERIALIZED — without the hint the reorderer inlines the
    windowed CTEs into the final one-row joins and builds a
    near-cartesian plan over multiple copies of the corpus (OOM on
    500 rows); (2) every window SORTS ON A MATERIALIZED COLUMN, never
    on the 192-term cosine expression directly — the
    expression-in-ORDER-BY form passes in a fresh process but OOMs at
    any memory cap once the process has executed ANY prior statement
    (the chained check_oracle / driver-harness context), while the
    compute-then-rank form runs in a few seconds either way.  Both
    mirror what the Spark side already does (scoped_persist + a csim
    projection before each row_number window)."""
    chains = []
    for n in _CB_SIZES:
        cos_ec = (f"({_dot_chain('e', 'c')}) / "
                  f"(sqrt({_dot_chain('e', 'e')})"
                  f" * sqrt({_dot_chain('c', 'c')}))")
        cos_qc = (f"({_dot_chain('q', 'c')}) / "
                  f"(sqrt({_dot_chain('q', 'q')})"
                  f" * sqrt({_dot_chain('c', 'c')}))")
        cos_qe = (f"({_dot_chain('q', 'e')}) / "
                  f"(sqrt({_dot_chain('q', 'q')})"
                  f" * sqrt({_dot_chain('e', 'e')}))")
        chains.append(f"""SELECT * FROM (
    WITH cent AS (SELECT vec_id AS centroid_id, embedding
                  FROM embeddings WHERE vec_id < {n}),
    q AS (SELECT vec_id AS query_id, embedding
          FROM embeddings WHERE vec_id < 5),
    esim AS MATERIALIZED (
        SELECT e.vec_id, c.centroid_id, {cos_ec} AS csim
        FROM embeddings e, cent c),
    asg AS MATERIALIZED (
        SELECT vec_id, centroid_id AS cluster_id FROM (
            SELECT vec_id, centroid_id, ROW_NUMBER() OVER (
                PARTITION BY vec_id
                ORDER BY csim DESC, centroid_id) AS rn
            FROM esim) WHERE rn = 1),
    cellsz AS MATERIALIZED (
        SELECT cluster_id, COUNT(*) AS csz FROM asg GROUP BY 1),
    tot AS MATERIALIZED (
        SELECT SUM(csz) AS n_vecs, COUNT(*) AS occupied,
               MAX(csz) AS max_cell
        FROM cellsz),
    qsim AS MATERIALIZED (
        SELECT q.query_id, c.centroid_id, {cos_qc} AS csim
        FROM q, cent c),
    pr AS MATERIALIZED (
        SELECT query_id, centroid_id AS cluster_id FROM (
            SELECT query_id, centroid_id, ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY csim DESC, centroid_id) AS rn
            FROM qsim) WHERE rn <= {_CB_NPROBE}),
    ncand AS MATERIALIZED (
        SELECT SUM(cs.csz) - SUM(CASE WHEN a.cluster_id IS NOT NULL
                                      THEN 1 ELSE 0 END) AS candidates
        FROM pr
        JOIN cellsz cs ON cs.cluster_id = pr.cluster_id
        LEFT JOIN asg a ON a.vec_id = pr.query_id
                       AND a.cluster_id = pr.cluster_id),
    cscore AS MATERIALIZED (
        SELECT p.query_id, a.vec_id AS neighbor_id, {cos_qe} AS csim
        FROM pr p
        JOIN asg a ON a.cluster_id = p.cluster_id
                  AND a.vec_id != p.query_id
        JOIN q ON q.query_id = p.query_id
        JOIN embeddings e ON e.vec_id = a.vec_id),
    ivf_topk AS MATERIALIZED (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY csim DESC, neighbor_id) AS rank
            FROM cscore) WHERE rank <= {_CB_K}),
    tscore AS MATERIALIZED (
        SELECT q.query_id, e.vec_id AS neighbor_id, {cos_qe} AS csim
        FROM q, embeddings e WHERE e.vec_id != q.query_id),
    truth AS MATERIALIZED (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY csim DESC, neighbor_id) AS rank
            FROM tscore) WHERE rank <= {_CB_K}),
    h AS MATERIALIZED (
        SELECT COUNT(*) AS hits
        FROM ivf_topk JOIN truth USING (query_id, neighbor_id)),
    nt AS MATERIALIZED (SELECT COUNT(*) AS n_truth FROM truth)
    SELECT CAST({n} AS BIGINT) AS n_centroids,
           CAST(tot.occupied AS BIGINT) AS occupied_cells,
           CAST((tot.max_cell * 10000) // tot.n_vecs AS BIGINT)
               AS max_cell_share_bp,
           CAST(ncand.candidates AS BIGINT) AS candidates,
           CAST(h.hits AS BIGINT) AS hits,
           CAST((h.hits * 10000) // nt.n_truth AS BIGINT) AS recall_bp
    FROM tot, ncand, h, nt
    )""")
    return "\n    " + "\n    UNION ALL\n    ".join(chains) + "\n    "


@register("ivf_codebook_size_curve", _codebook_curve_sql())
def ivf_codebook_size_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The codebook-size knob — see module docstring.  ONE map-only
    Arrow assignment pass emits every size's nearest-centroid column
    (the codebooks are prefixes of each other); per size: a cells-sized
    fold for occupancy AND the candidate count (never a second corpus
    scan to price the cost), the ann_ivf search itself, and the hits
    join against ONE persisted brute-force truth shared by all three
    sizes."""
    from .operators.materialize import scoped_persist
    from .operators.similarity import (
        ann_ivf,
        cosine_topk,
        dot,
        with_norm,
    )

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    truth = scoped_persist(
        cosine_topk(e, q, k=_CB_K).select("query_id", "neighbor_id"))
    n_truth = truth.agg(F.count("*").alias("n_truth"))

    # ONE corpus assignment for ALL codebook sizes (r12, guide §1.2):
    # the size-n codebooks are prefixes of the largest one, so
    # assign_clusters_multi emits every size's nearest-centroid column
    # from one shared similarity matrix in one Arrow pass —
    # bit-identical per-size values by the per-column-independence
    # argument on its docstring.  r11 had already cut 2 passes per size
    # to 1; this cuts the 3 remaining passes (and their 3 eager cache
    # fills) to 1.  The persisted frame keeps the embedding column so
    # each size's ann_ivf search rides the same materialization.
    from .operators.similarity import assign_clusters_multi

    multi = scoped_persist(assign_clusters_multi(
        e, e.orderBy("vec_id").limit(max(_CB_SIZES)), _CB_SIZES))
    parts = []
    for n in _CB_SIZES:
        cents = e.orderBy("vec_id").limit(n)
        asgfull = multi.select(
            "vec_id", "embedding",
            F.col(f"cluster_id_{n}").alias("cluster_id"))
        asg = asgfull.select("vec_id", "cluster_id")
        cellsz = asg.groupBy("cluster_id").agg(
            F.count("*").alias("csz"))
        tot = cellsz.agg(
            F.sum("csz").alias("n_vecs"),
            F.count("*").alias("occupied"),
            F.max("csz").alias("max_cell"))

        # probe routing: the ann_ivf chain (cosine rank over the
        # broadcast centroid frame, centroid-id tie-break)
        c = with_norm(cents.select(F.col("vec_id").alias("centroid_id"),
                                   F.col("embedding").alias("ce")),
                      "ce", "cnorm")
        qn = with_norm(q.select(F.col("vec_id").alias("query_id"),
                                F.col("embedding").alias("qe")),
                       "qe", "qnorm")
        csim = (dot("qe", "ce") / (F.col("qnorm") * F.col("cnorm")))
        pr = (qn.join(F.broadcast(c))
              .select("query_id", "centroid_id", csim.alias("csim"))
              .withColumn("rn", F.row_number().over(
                  Window.partitionBy("query_id")
                  .orderBy(F.desc("csim"), F.asc("centroid_id"))))
              .filter(F.col("rn") <= _CB_NPROBE)
              .select("query_id",
                      F.col("centroid_id").alias("cluster_id")))

        # candidate count from cell sizes: Σ probed cell sizes − the
        # self-hit when the query's own cell is probed
        ncand = (pr.join(cellsz, "cluster_id")
                 .join(asg.withColumnRenamed("vec_id", "query_id"),
                       ["query_id", "cluster_id"], "left_semi")
                 .agg(F.count("*").alias("self_hits"))
                 .crossJoin(pr.join(cellsz, "cluster_id")
                            .agg(F.sum("csz").alias("gross")))
                 .select((F.col("gross") - F.col("self_hits"))
                         .alias("candidates")))

        ivf = ann_ivf(e, q, k=_CB_K, n_centroids=n, nprobe=_CB_NPROBE,
                      centroids=cents, assigned=asgfull)
        h = (ivf.select("query_id", "neighbor_id")
             .join(truth, ["query_id", "neighbor_id"])
             .agg(F.count("*").alias("hits")))

        parts.append(
            tot.crossJoin(ncand).crossJoin(h)
            .crossJoin(F.broadcast(n_truth))
            .select(
                F.lit(n).cast("long").alias("n_centroids"),
                F.col("occupied").cast("long").alias("occupied_cells"),
                F.expr("(max_cell * 10000) div n_vecs").cast("long")
                .alias("max_cell_share_bp"),
                F.col("candidates").cast("long").alias("candidates"),
                F.col("hits").cast("long").alias("hits"),
                F.expr("(hits * 10000) div n_truth").cast("long")
                .alias("recall_bp")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
