"""Coverage wave 40 (round 9) — the pairwise source-distance matrix and
token-frequency drift across ingest batches.

- ``source_js_divergence_matrix``: the mixture-design DISTANCE MATRIX —
  Jensen-Shannon divergence between every unordered source pair's
  unigram distributions.  ``source_unigram_kl`` prices each source
  against the pool; JS prices sources against EACH OTHER (symmetric,
  bounded by ln 2 — the standard "which sources are near-duplicates of
  each other / which add diversity" table).  Exactness: each directed
  half KL(p_a ‖ m) uses the integer rational
  2·c_at·N_b / (c_at·N_b + c_bt·N_a) inside the proven round(ln·1e6)
  device (tokens absent from the other source cost exactly ln 2 via
  COALESCE 0), the weighted sum is exact BIGINT, each half ends with
  ONE correctly-rounded division by N_a (the ccnet device), and
  js_micro = round((kl_a + kl_b) / 2.0) over two BIGINTs.

- ``token_freq_drift``: the TEXT twin of ``embedding_batch_drift`` —
  per consecutive ingest-batch pair (4 rank-based batches over doc_id
  order; the VERDICT-r8 rank spine, NOT id values, so the dashboard
  stays non-empty on sparse/sharded id domains), the top 20 moving
  tokens by the pure-integer cross-multiplied shift
  |c_cur·N_prev − c_prev·N_cur| (tok ASC tie-break) with both counts —
  the vocabulary-drift monitor a crawl pipeline reads between
  snapshots.

Scale shapes: JS is two Zipf-bounded token aggregates + a
|sources|²-row pair spine broadcast against the per-source count table
(the per-(pair, token) stream is |pairs|·vocab — vocabulary-sized per
pair, never corpus-sized); drift is one (batch, token) aggregate + a
batch-pair self-join of that reduced frame + a 3-partition rank
window.

Reference scope: composes the reference's aggregation surface
(src/transform/etl_pipeline.py groupbys) with the LLM-pipeline
extension; no counterpart file exists — cited per SURVEY §6 as a scale
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm20 import _TOKS_DUCK, _TOKS_SPARK

_N_TB = 4        # token-drift ingest batches (the drift-gate spine)
_TOP_MOVERS = 20


# =========================================================================
# source_js_divergence_matrix — pairwise unigram JS in micro-nats
# =========================================================================

_JS_SQL = f"""
    WITH tok AS (
        SELECT source, unnest({_TOKS_DUCK}) AS tk FROM documents
    ),
    st AS (SELECT source, tk, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
    ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM st GROUP BY 1),
    prs AS (
        SELECT a.source AS sa, b.source AS sb, a.n AS na, b.n AS nb
        FROM ns a JOIN ns b ON a.source < b.source
    ),
    halves AS (
        SELECT sa AS sf, sb AS so, na AS nf, nb AS no FROM prs
        UNION ALL
        SELECT sb, sa, nb, na FROM prs
    ),
    termsj AS (
        SELECT h.sf, h.so, h.nf, st.c,
               CAST(round(ln(
                   (2.0 * CAST(st.c AS DOUBLE) * CAST(h.no AS DOUBLE))
                   / (CAST(st.c AS DOUBLE) * CAST(h.no AS DOUBLE)
                      + CAST(COALESCE(stb.c, 0) AS DOUBLE)
                        * CAST(h.nf AS DOUBLE))) * 1e6) AS BIGINT)
                   AS term_micro
        FROM halves h
        JOIN st ON st.source = h.sf
        LEFT JOIN st stb ON stb.source = h.so AND stb.tk = st.tk
    ),
    klh AS (
        SELECT sf, so,
               CAST(round(CAST(SUM(c * term_micro) AS DOUBLE) / nf)
                    AS BIGINT) AS kl_micro
        FROM termsj GROUP BY sf, so, nf
    )
    SELECT p.sa AS source_a, p.sb AS source_b,
           ka.kl_micro AS kl_a_micro,
           kb.kl_micro AS kl_b_micro,
           CAST(round((ka.kl_micro + kb.kl_micro) / 2.0) AS BIGINT)
               AS js_micro
    FROM prs p
    JOIN klh ka ON ka.sf = p.sa AND ka.so = p.sb
    JOIN klh kb ON kb.sf = p.sb AND kb.so = p.sa
"""


@register("source_js_divergence_matrix", _JS_SQL)
def source_js_divergence_matrix(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    """Pairwise unigram JS divergence — see module docstring.  The
    directed-half device mirrors source_unigram_kl term-for-term (same
    ln round, same exact weighted sum, same single final division), so
    the two mixture-design gates share one exactness argument."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(F.expr(_TOKS_SPARK)).alias("tk"))
    st = tok.groupBy("source", "tk").agg(
        F.count("*").cast("long").alias("c"))
    ns = st.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    a = ns.select(F.col("source").alias("sa"), F.col("n").alias("na"))
    b = ns.select(F.col("source").alias("sb"), F.col("n").alias("nb"))
    prs = a.join(b, F.col("sa") < F.col("sb"))
    halves = (prs.select(F.col("sa").alias("sf"), F.col("sb").alias("so"),
                         F.col("na").alias("nf"), F.col("nb").alias("no"))
              .unionByName(
                  prs.select(F.col("sb").alias("sf"),
                             F.col("sa").alias("so"),
                             F.col("nb").alias("nf"),
                             F.col("na").alias("no"))))
    stf = st.select(F.col("source").alias("sf"), "tk",
                    F.col("c").alias("c"))
    sto = st.select(F.col("source").alias("sob"),
                    F.col("tk").alias("tkb"), F.col("c").alias("cb"))
    term = F.round(F.log(
        (2.0 * F.col("c").cast("double") * F.col("no").cast("double"))
        / (F.col("c").cast("double") * F.col("no").cast("double")
           + F.coalesce(F.col("cb"), F.lit(0)).cast("double")
           * F.col("nf").cast("double"))) * 1e6).cast("long")
    termsj = (
        F.broadcast(halves).join(stf, "sf")
        .join(sto, (F.col("so") == F.col("sob"))
              & (F.col("tk") == F.col("tkb")), "left")
        .drop("sob", "tkb")
        .withColumn("term_micro", term)
    )
    klh = termsj.groupBy("sf", "so", "nf").agg(
        F.sum(F.col("c") * F.col("term_micro")).alias("s")
    ).select("sf", "so",
             F.round(F.col("s").cast("double") / F.col("nf"))
             .cast("long").alias("kl_micro"))
    ka = klh.select(F.col("sf").alias("sa"), F.col("so").alias("sb"),
                    F.col("kl_micro").alias("kl_a_micro"))
    kb = klh.select(F.col("so").alias("sa"), F.col("sf").alias("sb"),
                    F.col("kl_micro").alias("kl_b_micro"))
    return (
        prs.select("sa", "sb")
        .join(ka, ["sa", "sb"])
        .join(kb, ["sa", "sb"])
        .select(F.col("sa").alias("source_a"),
                F.col("sb").alias("source_b"),
                "kl_a_micro", "kl_b_micro",
                F.round((F.col("kl_a_micro") + F.col("kl_b_micro"))
                        / 2.0).cast("long").alias("js_micro"))
    )


# =========================================================================
# token_freq_drift — top vocabulary movers between consecutive batches
# =========================================================================

_DRIFT_TOK_SQL = f"""
    WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
    rk AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY doc_id) AS rnk
        FROM documents
    ),
    dt AS (
        SELECT (rk.rnk - 1) * {_N_TB} // n.n_docs AS batch, d.doc_id,
               unnest({_TOKS_DUCK}) AS tk
        FROM documents d JOIN rk USING (doc_id) CROSS JOIN n
    ),
    bc AS (SELECT batch, tk, CAST(COUNT(*) AS BIGINT) AS c
           FROM dt GROUP BY 1, 2),
    bn AS (SELECT batch, CAST(SUM(c) AS BIGINT) AS nt FROM bc GROUP BY 1),
    -- explicit ON + COALESCE (not USING): a token that VANISHES
    -- between batches exists only on the p side, and the using-merged
    -- batch column must not null out — at sf1 the copy-prefixed vocab
    -- makes vanishing tokens the norm (caught by the sf1 sweep)
    fo AS (
        SELECT COALESCE(c.batch, p.batch) AS batch,
               COALESCE(c.tk, p.tk) AS tk,
               COALESCE(p.c, 0) AS c_prev, COALESCE(c.c, 0) AS c_cur
        FROM bc c
        FULL OUTER JOIN (SELECT batch + 1 AS batch, tk, c FROM bc) p
            ON p.batch = c.batch AND p.tk = c.tk
    ),
    pairs AS (
        SELECT f.batch, f.tk, f.c_prev, f.c_cur,
               np.nt AS n_prev, nc.nt AS n_cur
        FROM fo f
        JOIN bn nc ON nc.batch = f.batch
        JOIN bn np ON np.batch = f.batch - 1
        WHERE f.batch >= 1
    ),
    scored AS (
        SELECT batch, tk, c_prev, c_cur,
               CAST(abs(c_cur * n_prev - c_prev * n_cur) AS BIGINT)
                   AS shift_score
        FROM pairs
    ),
    ranked AS (
        SELECT batch, tk, c_prev, c_cur, shift_score,
               ROW_NUMBER() OVER (PARTITION BY batch
                                  ORDER BY shift_score DESC, tk) AS mover_rank
        FROM scored
    )
    SELECT CAST(batch AS BIGINT) AS batch, tk, c_prev, c_cur,
           shift_score, CAST(mover_rank AS BIGINT) AS mover_rank
    FROM ranked WHERE mover_rank <= {_TOP_MOVERS}
"""


@register("token_freq_drift", _DRIFT_TOK_SQL)
def token_freq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top vocabulary movers per consecutive ingest-batch pair — see
    module docstring.  The batch spine is RANK-based (the
    embedding_batch_drift convention; Spark uses the same monotone
    shard-spine decomposition — no global row window); the shift score
    is the pure-integer cross-multiplied frequency difference, so no
    float compare can reorder movers."""
    docs = t(spark, sf_dir, "documents")
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
        .select("doc_id",
                (F.col("cum_before") + F.col("rn")).alias("rnk"))
    )
    dt = (
        docs.join(ranked, "doc_id")
        .crossJoin(F.broadcast(n))
        .select(F.expr(f"((rnk - 1) * {_N_TB}) div n_docs").alias("batch"),
                F.explode(F.expr(_TOKS_SPARK)).alias("tk"))
    )
    bc = dt.groupBy("batch", "tk").agg(
        F.count("*").cast("long").alias("c"))
    bn = bc.groupBy("batch").agg(F.sum("c").cast("long").alias("nt"))
    cur = bc.select("batch", "tk", F.col("c").alias("c_cur"))
    prv = bc.select((F.col("batch") + 1).alias("batch"), "tk",
                    F.col("c").alias("c_prev"))
    pairs = (
        cur.join(prv, ["batch", "tk"], "full_outer")
        .filter(F.col("batch") >= 1)
        .join(bn.select(F.col("batch").alias("batch"),
                        F.col("nt").alias("n_cur")), "batch")
        .join(F.broadcast(bn.select((F.col("batch") + 1).alias("batch"),
                                    F.col("nt").alias("n_prev"))),
              "batch")
        .select("batch", "tk",
                F.coalesce("c_prev", F.lit(0)).cast("long").alias("c_prev"),
                F.coalesce("c_cur", F.lit(0)).cast("long").alias("c_cur"),
                "n_prev", "n_cur")
    )
    scored = pairs.withColumn(
        "shift_score",
        F.abs(F.col("c_cur") * F.col("n_prev")
              - F.col("c_prev") * F.col("n_cur")).cast("long"))
    wm = Window.partitionBy("batch").orderBy(
        F.desc("shift_score"), F.asc("tk"))
    return (
        scored.withColumn("mover_rank",
                          F.row_number().over(wm).cast("long"))
        .filter(F.col("mover_rank") <= _TOP_MOVERS)
        .select("batch", "tk", "c_prev", "c_cur", "shift_score",
                "mover_rank")
    )
