"""Coverage wave 38 (round 9) — the covariance power-iteration operator
in pure integer arithmetic, and the quality-filter Venn datasheet.

- ``covariance_power_iteration``: the PCA/whitening power-iteration
  OPERATOR — w = C·v over the exact embedding covariance, iterated —
  in EXACT integer arithmetic.  The covariance numerators
  C[i,j] = n·Σq_iq_j − Σq_i·Σq_j come from the
  ``embedding_dim_correlation`` milli-moment device (decimal(38,0) /
  HUGEINT — exact); each step is w = C·v followed by the integer
  renormalization v' = sign(w)·((|w|·1000) div max|w|) (floor ==
  truncation on non-negative operands — identical on both engines and
  in the driver-side fold), starting from v0 = 1000·1.  Output: one
  row per dimension with the iterate after each of 3 steps
  (v1/v2/v3 ∈ [−1000, 1000]), fully hash-exact.  HONESTY NOTE: this
  corpus has a FLAT spectrum (λ2/λ1 ≈ 0.93 measured), so 3 steps are
  far from eigen-convergence here — |cos| to the numpy top eigenvector
  is ~0.18 after step 3 and step count, not quantization, is the
  limiter (identical alignment at 1000× finer scale, measured).  The
  gate therefore pins the ALGEBRA (the per-step fold both engines must
  reproduce bit-for-bit); convergence-under-a-spectral-gap is proven
  by the synthetic-anisotropy unit test, where 3 steps align to the
  planted direction.  Spark runs the renormalization on the DRIVER
  over the 64-row w vector (the kmeans_micro driver-sized-codebook
  contract); the oracle states the same fold relationally.

- ``quality_filter_venn``: do the three cheap quality filters agree? —
  per combination of (gopher reject, blocklist any-hit, CCNet tail
  bucket): document count and share bp.  Every signal byte-shares its
  standalone gate's construction (``_gopher_flags_core`` thresholds,
  the wave-36 blocklist, ``_ccnet_bucketed``'s tail = bucket 3; docs
  outside the bigram domain count as not-tail).  The redundancy table
  a pipeline owner reads before stacking filters: if two filters
  reject the same docs, one of them is free to drop.

Scale shapes: the power iteration reduces the corpus ONCE to the 64×64
covariance relation (the dim-correlation shuffle), then each step is a
join+aggregate over ≤ 4096 rows (driver-renormalized 64-row vector);
the Venn is three per-doc flag frames joined on doc_id + one 8-row
aggregate.

Reference scope: composes the reference's aggregation surface
(src/transform/etl_pipeline.py groupbys) with the LLM-pipeline
extension; no counterpart file exists — cited per SURVEY §6 as a scale
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm import _SHINGLES_CTE  # noqa: F401 — device parity docs
from .registry_llm27 import _CCNET_RANKED_CTES
from .registry_llm35 import _bl_sql_list, _BLOCKLIST

_DIM = 64
_PI_STEPS = 3
_V_SCALE = 1000


# =========================================================================
# covariance_power_iteration — integer power iteration, exact covariance
# =========================================================================

def _top_component_sql() -> str:
    steps = []
    prev = "v0"
    for s in range(1, _PI_STEPS + 1):
        steps.append(f"""w{s} AS (
        SELECT cf.i, SUM(cf.c * {prev}.v) AS w
        FROM cfull cf JOIN {prev} ON {prev}.i = cf.j
        GROUP BY cf.i
    ),
    m{s} AS (SELECT GREATEST(MAX(abs(w)), 1) AS m FROM w{s}),
    v{s} AS (
        SELECT i,
               CAST(CASE WHEN w >= 0
                         THEN (abs(w) * {_V_SCALE}) // m
                         ELSE -((abs(w) * {_V_SCALE}) // m) END
                    AS HUGEINT) AS v
        FROM w{s} CROSS JOIN m{s}
    )""")
        prev = f"v{s}"
    step_sql = ",\n    ".join(steps)
    return f"""
    WITH el AS (
        SELECT e.vec_id, r.i - 1 AS dim,
               CAST(round(CAST(e.embedding[r.i] AS DOUBLE) * 1000)
                    AS BIGINT) AS q
        FROM embeddings e, (SELECT unnest(range(1, {_DIM + 1})) AS i) r
    ),
    pr AS (
        SELECT a.dim AS dim_i, b.dim AS dim_j,
               CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(a.q) AS HUGEINT) AS si,
               CAST(SUM(b.q) AS HUGEINT) AS sj,
               SUM(CAST(a.q AS HUGEINT) * b.q) AS p
        FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.dim <= b.dim
        GROUP BY 1, 2
    ),
    cfull AS (
        SELECT dim_i AS i, dim_j AS j, n * p - si * sj AS c FROM pr
        UNION ALL
        SELECT dim_j, dim_i, n * p - si * sj FROM pr WHERE dim_i < dim_j
    ),
    v0 AS (SELECT i, CAST({_V_SCALE} AS HUGEINT) AS v
           FROM (SELECT DISTINCT i FROM cfull)),
    {step_sql}
    SELECT CAST(v1.i AS BIGINT) AS dim,
           CAST(v1.v AS BIGINT) AS v1,
           CAST(v2.v AS BIGINT) AS v2,
           CAST(v3.v AS BIGINT) AS v3
    FROM v1 JOIN v2 ON v2.i = v1.i JOIN v3 ON v3.i = v1.i
"""


@register("covariance_power_iteration", _top_component_sql())
def covariance_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer power iteration over the exact covariance — see module
    docstring (incl. the flat-spectrum honesty note).  The corpus reduces ONCE to the exact covariance
    relation (decimal(38,0) accumulators, the dim-correlation device);
    the three C·v folds are joins over the 64×64 relation with the
    carried vector renormalized on the DRIVER (64 rows — the
    kmeans_micro driver-sized contract; floor division on non-negative
    integers matches the oracle's ``//`` exactly)."""
    e = t(spark, sf_dir, "embeddings")
    el = e.select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    ).select("vec_id", "dim",
             F.round(F.col("x").cast("double") * 1e3).cast("long")
             .alias("q"))
    a = el.select("vec_id", F.col("dim").alias("dim_i"),
                  F.col("q").alias("qa"))
    b = el.select("vec_id", F.col("dim").alias("dim_j"),
                  F.col("q").alias("qb"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    pr = (
        a.join(b, "vec_id")
        .filter(F.col("dim_i") <= F.col("dim_j"))
        .groupBy("dim_i", "dim_j")
        .agg(F.count("*").alias("n"),
             F.sum(dec(F.col("qa"))).alias("si"),
             F.sum(dec(F.col("qb"))).alias("sj"),
             F.sum(dec(F.col("qa")) * F.col("qb")).alias("p"))
    )
    c_expr = (dec(F.col("n")) * F.col("p")
              - F.col("si") * F.col("sj")).alias("c")
    cfull = (
        pr.select(F.col("dim_i").alias("i"), F.col("dim_j").alias("j"),
                  c_expr)
        .unionByName(
            pr.filter(F.col("dim_i") < F.col("dim_j"))
            .select(F.col("dim_j").alias("i"), F.col("dim_i").alias("j"),
                    c_expr))
    )
    from .operators.materialize import scoped_persist

    cfull = scoped_persist(cfull)
    spark_ = spark
    v = {i: _V_SCALE for i in range(_DIM)}   # v0 = 1000 * ones
    vs = []
    for _ in range(_PI_STEPS):
        vdf = spark_.createDataFrame(
            [(j, str(val)) for j, val in sorted(v.items())],
            "j int, v_str string").select(
                "j", F.col("v_str").cast("decimal(38,0)").alias("v"))
        w_rows = (cfull.join(F.broadcast(vdf), "j")
                  .groupBy("i")
                  .agg(F.sum(F.col("c") * F.col("v")).alias("w"))
                  .collect())
        w = {int(r["i"]): int(r["w"]) for r in w_rows}
        m = max(max(abs(x) for x in w.values()), 1)
        v = {i: (1 if x >= 0 else -1) * ((abs(x) * _V_SCALE) // m)
             for i, x in w.items()}
        vs.append(dict(v))
    out = [(i, int(vs[0][i]), int(vs[1][i]), int(vs[2][i]))
           for i in sorted(vs[0])]
    return spark_.createDataFrame(
        out, "dim long, v1 long, v2 long, v3 long")


# =========================================================================
# quality_filter_venn — do the three cheap filters agree?
# =========================================================================

_VENN_SQL = f"""
    WITH {_CCNET_RANKED_CTES},
    gt AS (
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
    ),
    blf AS (
        SELECT doc_id,
               CASE WHEN len(list_filter(
                        list_filter(string_split(text, ' '),
                                    x -> x <> ''),
                        x -> x IN ({_bl_sql_list()}))) > 0
                    THEN 1 ELSE 0 END AS blocklist_hit
        FROM documents
    ),
    tailf AS (
        SELECT d.doc_id,
               CASE WHEN r.bucket = 3 THEN 1 ELSE 0 END AS ccnet_tail
        FROM documents d LEFT JOIN ranked r USING (doc_id)
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM documents)
    SELECT g.gopher_reject, b.blocklist_hit, t.ccnet_tail,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(round(1e4 * COUNT(*) / n.total) AS BIGINT) AS share_bp
    FROM gflag g
    JOIN blf b USING (doc_id)
    JOIN tailf t USING (doc_id)
    CROSS JOIN n
    GROUP BY 1, 2, 3, n.total
"""


@register("quality_filter_venn", _VENN_SQL)
def quality_filter_venn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-filter agreement datasheet — see module docstring.  Every
    signal reuses its standalone gate's Spark construction
    (_gopher_flags_core, the wave-36 blocklist expression,
    _ccnet_bucketed), so this table can never disagree with the
    filters it crosses (cross-gate pins in tests/test_llm37.py)."""
    from .registry_llm27 import _ccnet_bucketed
    from .registry_llm5 import _gopher_flags_core

    docs = t(spark, sf_dir, "documents")
    g = (docs.select("doc_id")
         .join(_gopher_flags_core(spark, sf_dir).select("doc_id", "keep"),
               "doc_id", "left")
         .select("doc_id",
                 F.when(F.coalesce("keep", F.lit(0)) == 1, 0).otherwise(1)
                 .alias("gopher_reject")))
    bl = ", ".join(f"'{w}'" for w in _BLOCKLIST)
    b = docs.select(
        "doc_id",
        F.when(F.expr(
            f"size(filter(filter(split(text, ' '), x -> x != ''), "
            f"x -> x IN ({bl}))) > 0"), 1).otherwise(0)
        .alias("blocklist_hit"))
    tl = (docs.select("doc_id")
          .join(_ccnet_bucketed(spark, sf_dir)
                .select("doc_id", "bucket"), "doc_id", "left")
          .select("doc_id",
                  F.when(F.col("bucket") == 3, 1).otherwise(0)
                  .alias("ccnet_tail")))
    n = docs.agg(F.count("*").cast("long").alias("total"))
    return (
        g.join(b, "doc_id").join(tl, "doc_id")
        .groupBy("gopher_reject", "blocklist_hit", "ccnet_tail")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .crossJoin(F.broadcast(n))
        .select("gopher_reject", "blocklist_hit", "ccnet_tail", "n_docs",
                F.round(F.lit(1e4) * F.col("n_docs") / F.col("total"))
                .cast("long").alias("share_bp"))
    )
