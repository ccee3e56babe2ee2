"""Coverage wave 30 — ANN operating-point tuning and corpus diversity:

- ``ivf_nprobe_recall_curve``: the ANN tuning table — recall@10 of the
  TRAINED micro-k-means IVF index at nprobe ∈ {1, 2, 4}, per standing
  query, against the brute-force exact top-10.  The knob this prices:
  nprobe is THE latency/recall dial of an IVF deployment (each probe
  scans one more cluster's partition at 100 TB), and the curve is what
  an operator reads before picking the production operating point
  (`similarity_ann_recall_trained` is the fixed nprobe=4 row of this
  curve — pinned equal by pytest).  Candidate sets NEST by
  construction (probe ranks are a single ordering; nprobe=2 ⊇
  nprobe=1), so per-query hits are monotone in nprobe — pinned.
  Everything integer: hits = COUNT of exact-top-10 ids found.

- ``distinct_ngram_diversity``: the per-source distinct-n diversity
  datasheet (the distinct-1/2/3 metric of Li et al. 2016, the staple
  check against degenerate/templated text before training): for
  n ∈ {1, 2, 3}, total n-gram occurrences across the source's docs,
  distinct n-grams, and distinct share in bp.  Pure integer counts +
  one share round; a low distinct-2 share flags boilerplate/looping
  sources that per-doc repetition profiles miss (cross-doc templating).

Scale: the recall curve shares ONE trained codebook (driver-sized by
the kmeans_micro contract) and runs three map-only assignment passes +
shortlist-sized joins; the diversity stream is three hash aggregates
over the token scan (n-gram cardinality is Zipf-bounded) with no
window and no join beyond the per-source totals attach.

Reference scope: composes the reference's aggregation surface with the
LLM-pipeline extension; no counterpart file exists — cited per SURVEY
§6 as a scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm import _dot_chain
from .registry_llm3 import _KM_ITERS, _km_ctes, _vchain

_NPROBES = (1, 2, 4)
_TOPK = 10
_NGRAM_NS = (1, 2, 3)

_TOKS_DUCK = "list_filter(string_split(text, ' '), x -> x <> '')"
_TOKS_SPARK = "filter(split(text, ' '), x -> x != '')"


# =========================================================================
# IVF recall vs nprobe — one codebook, three thresholds of one ranking
# =========================================================================

def _nprobe_curve_sql() -> str:
    """One trained-k-means CTE family + ONE per-(query, centroid) probe
    ranking; each nprobe point re-thresholds that ranking (the
    jaccard_threshold_sweep device) and re-ranks its candidate pool."""
    def vcos(a_arr: str, b_arr: str) -> str:
        return (f"({_vchain(a_arr, b_arr)}) / "
                f"(sqrt({_vchain(a_arr, a_arr)})"
                f" * sqrt({_vchain(b_arr, b_arr)}))")

    qcos = (f"({_dot_chain('q', 'e')}) / "
            f"(sqrt({_dot_chain('q', 'q')}) * sqrt({_dot_chain('e', 'e')}))")
    head = f"""
    WITH {_km_ctes()},
    q AS (SELECT vec_id AS query_id, embedding
          FROM embeddings WHERE vec_id < 5),
    asg AS MATERIALIZED (
        SELECT vec_id, cid AS cluster_id FROM (
            SELECT e.vec_id, c.cid, ROW_NUMBER() OVER (
                PARTITION BY e.vec_id
                ORDER BY {vcos('e.embedding', 'c.ce')} DESC, c.cid) AS rn
            FROM embeddings e, tc{_KM_ITERS} c
        ) WHERE rn = 1
    ),
    pr AS MATERIALIZED (
        SELECT q.query_id, c.cid AS cluster_id, ROW_NUMBER() OVER (
            PARTITION BY q.query_id
            ORDER BY {vcos('q.embedding', 'c.ce')} DESC, c.cid) AS rn
        FROM q, tc{_KM_ITERS} c
    ),
    exact AS MATERIALIZED (
        SELECT query_id, neighbor_id FROM (
            SELECT x.query_id, x.neighbor_id, ROW_NUMBER() OVER (
                PARTITION BY x.query_id
                ORDER BY x.cosine DESC, x.neighbor_id) AS rank
            FROM (SELECT q.query_id, e.vec_id AS neighbor_id,
                         {qcos} AS cosine
                  FROM q, embeddings e
                  WHERE e.vec_id != q.query_id) x
        ) WHERE rank <= {_TOPK}
    )"""
    points = []
    for p in _NPROBES:
        points.append(f""",
    ivf{p} AS (
        SELECT query_id, neighbor_id FROM (
            SELECT x.query_id, x.neighbor_id, ROW_NUMBER() OVER (
                PARTITION BY x.query_id
                ORDER BY x.cosine DESC, x.neighbor_id) AS rank
            FROM (
                SELECT pr.query_id, a.vec_id AS neighbor_id,
                       {qcos} AS cosine
                FROM pr
                JOIN asg a ON a.cluster_id = pr.cluster_id
                          AND a.vec_id <> pr.query_id
                JOIN q ON q.query_id = pr.query_id
                JOIN embeddings e ON e.vec_id = a.vec_id
                WHERE pr.rn <= {p}
            ) x
        ) WHERE rank <= {_TOPK}
    ),
    hits{p} AS (
        SELECT ex.query_id, CAST({p} AS BIGINT) AS nprobe,
               CAST(COUNT(iv.neighbor_id) AS BIGINT) AS hits
        FROM exact ex
        LEFT JOIN ivf{p} iv ON iv.query_id = ex.query_id
                           AND iv.neighbor_id = ex.neighbor_id
        GROUP BY 1
    )""")
    unions = "\n    UNION ALL\n".join(
        f"SELECT query_id, nprobe, hits, CAST({_TOPK} AS BIGINT) AS k"
        f" FROM hits{p}" for p in _NPROBES)
    return head + "".join(points) + "\n    " + unions


@register("ivf_nprobe_recall_curve", _nprobe_curve_sql())
def ivf_nprobe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 vs nprobe over ONE trained codebook — see module
    docstring.  The nprobe=4 rows are pinned equal to
    ``similarity_ann_recall_trained`` (tests/test_llm30.py)."""
    from .operators.similarity import ann_ivf, cosine_topk, kmeans_micro
    from .registry_llm3 import _KM_K

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    cents = kmeans_micro(e, k=_KM_K, iters=_KM_ITERS).select(
        F.col("centroid_id").alias("vec_id"), "embedding")
    exact = cosine_topk(e, q, k=_TOPK).select("query_id", "neighbor_id")
    curves = []
    for p in _NPROBES:
        ivf = ann_ivf(e, q, k=_TOPK, nprobe=p, centroids=cents)
        curves.append(
            exact.join(ivf.select("query_id", "neighbor_id")
                       .withColumn("hit", F.lit(1)),
                       ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(F.count("hit").cast("long").alias("hits"))
            .select("query_id", F.lit(p).cast("long").alias("nprobe"),
                    "hits", F.lit(_TOPK).cast("long").alias("k")))
    out = curves[0]
    for c in curves[1:]:
        out = out.unionByName(c)
    return out


# =========================================================================
# distinct-n diversity per source
# =========================================================================

def _ngram_branch_duck(n: int) -> str:
    if n == 1:
        gram = "toks[i]"
    else:
        gram = f"array_to_string(toks[i:i+{n - 1}], ' ')"
    return f"""
        SELECT source, CAST({n} AS BIGINT) AS n, {gram} AS g
        FROM (SELECT source, toks, unnest(range(1, len(toks) - {n - 1} + 1)) AS i
              FROM tk WHERE len(toks) >= {n})"""


_DIVERSITY_SQL = f"""
    WITH tk AS (
        SELECT source, {_TOKS_DUCK} AS toks FROM documents
    ),
    grams AS ({" UNION ALL ".join(_ngram_branch_duck(n) for n in _NGRAM_NS)})
    SELECT source, n,
           CAST(COUNT(*) AS BIGINT) AS total_ngrams,
           CAST(COUNT(DISTINCT g) AS BIGINT) AS distinct_ngrams,
           CAST(round(1e4 * COUNT(DISTINCT g) / COUNT(*)) AS BIGINT)
               AS distinct_bp
    FROM grams
    GROUP BY 1, 2
"""


@register("distinct_ngram_diversity", _DIVERSITY_SQL)
def distinct_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-1/2/3 n-gram diversity — see module
    docstring.  Three shared-scan explode branches; counts integer,
    one share round."""
    docs = t(spark, sf_dir, "documents")
    tk = docs.select("source", F.expr(_TOKS_SPARK).alias("toks"))
    branches = []
    for n in _NGRAM_NS:
        if n == 1:
            gram = "x -> element_at(toks, x)"
        else:
            gram = (f"x -> array_join(slice(toks, x, {n}), ' ')")
        branches.append(
            tk.filter(F.size("toks") >= n).select(
                "source",
                F.lit(n).cast("long").alias("n"),
                F.explode(F.expr(
                    f"transform(sequence(1, size(toks) - {n - 1}), {gram})"
                )).alias("g")))
    grams = branches[0]
    for b in branches[1:]:
        grams = grams.unionByName(b)
    return (
        grams.groupBy("source", "n")
        .agg(
            F.count("*").cast("long").alias("total_ngrams"),
            F.countDistinct("g").cast("long").alias("distinct_ngrams"),
        )
        .select(
            "source", "n", "total_ngrams", "distinct_ngrams",
            F.round(F.lit(1e4) * F.col("distinct_ngrams")
                    / F.col("total_ngrams")).cast("long")
            .alias("distinct_bp"))
    )
