"""Coverage wave 29 — retrieval diversification, mixture divergence,
and the quality-vs-redundancy datasheet:

- ``mmr_diverse_selection``: Maximal Marginal Relevance re-ranking
  (Carbonell & Goldstein 1998) over the exact cosine top-10 shortlists
  — the diverse few-shot / RAG-rerank step that sits on top of an ANN
  shortlist.  Per standing query (vec_id < 5), 5 of the 10 candidates
  are picked greedily by the PURE-INTEGER score
  ``7·rel_micro − 3·maxsim_micro`` (λ = 0.7 scaled by 10; rel/sim are
  micro-quantized fold-order cosines; max over the already-selected
  set, 0 at step 1 — so step 1 is argmax relevance; ties → lower id).
  Genuinely sequential state (pick i depends on picks 1..i−1), so the
  Spark side is the tier-(b) grouped Arrow kernel
  :func:`operators.similarity.mmr_select` (shortlists are
  constant-size BY the topk contract; parallelism = query count) and
  the oracle UNROLLS the 5 steps as CTEs (selection depth is fixed —
  the unrolled-k-means precedent), each step an anti-joined argmax
  with ROW_NUMBER minimality.

- ``source_unigram_kl``: per-source unigram KL divergence vs the
  corpus distribution — the mixture-design signal DSIR/DoReMi-style
  pipelines monitor (how far each source's token distribution sits
  from the pool it is mixed into).  KL(p_s ‖ p) = Σ_t (c_st/N_s) ·
  ln((c_st·N)/(N_s·c_t)): the per-token log term is the wave-28 PMI
  micro-nat device on an integer rational (three correctly-rounded
  double ops in identical order, then the proven ln round), the
  weighted sum Σ c_st·term_micro is exact BIGINT, and kl_micro is ONE
  correctly-rounded double division by N_s (the ccnet device).
  Gibbs: KL ≥ 0 up to quantization — pytest-pinned.

- ``quality_dup_quartiles``: the "is low-quality text more
  duplicated?" datasheet row — quality quartiles (NTILE(4) over the
  wave-20 distinct-token-ratio score, doc_id tie-break) × the
  LSH-verified near-dup doc set (the ``dedup_minhash_lsh`` device),
  per quartile: docs, dup docs, dup share bp, score bounds.  The
  oracle states plain global NTILE(4); the Spark plan needs NO global
  sort — the wave-20 score-spine decomposition (spine cumsum +
  score-partitioned within-windows) yields each doc's global rank,
  and the closed-form ntile formula (first ``n mod 4`` buckets take
  ``n div 4 + 1`` rows) reproduces NTILE exactly — equivalence
  pytest-pinned against a literal-ntile replay.

Float policy: cosines are the bit-exact fold chains (similarity_topk
device), every comparison/selection is on BIGINTs; the only
non-integer ops are the proven ln/round devices and two
correctly-rounded share divisions.

Scale: MMR is shortlist-local (k'·(k'−1) pair rows per query group,
Arrow-batched, parallelism = standing-query count); the KL stream is
two Zipf-bounded token aggregates + one token-keyed equi-join +
broadcast scalars; the quartile matrix is the spine decomposition
(ordered state bounded by the 10^4+1 score domain, never the corpus)
plus the banded pair inventory (never all-pairs).

Reference scope: composes the reference's aggregation surface with the
LLM-pipeline extension; no counterpart file exists — cited per SURVEY
§6 as a scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm import _SHINGLES_CTE, _dot_chain
from .registry_llm20 import _TOKS_DUCK, _TOKS_SPARK

_N_QUERIES = 5      # standing queries: vec_id < 5 (the similarity_topk device)
_SHORTLIST = 10     # candidates per query (the topk contract)
_SELECT_K = 5       # MMR picks per query
_LAM_NUM = 7        # λ = 0.7 scaled by 10 …
_DIV_NUM = 3        # … so the diversity weight is 10 − 7


# =========================================================================
# MMR diversified selection — sequential greedy, unrolled oracle
# =========================================================================

def _mmr_sql() -> str:
    """Unrolled 5-step MMR oracle.  Step 1 = argmax rel (ms = 0); step
    i anti-joins the selected set, takes MAX(sim to selected) per
    survivor, and picks ROW_NUMBER() = 1 by (score DESC, cid)."""
    cos_ab = (f"(({_dot_chain('ea', 'eb')}) / (sqrt({_dot_chain('ea', 'ea')})"
              f" * sqrt({_dot_chain('eb', 'eb')})))")
    parts = [f"""
    q AS (SELECT vec_id AS query_id, embedding FROM embeddings
          WHERE vec_id < {_N_QUERIES}),
    p AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               ({_dot_chain('q', 'e')})
               / (sqrt({_dot_chain('q', 'q')}) * sqrt({_dot_chain('e', 'e')})) AS cosine
        FROM q, embeddings e
        WHERE e.vec_id != q.query_id
    ),
    r AS (SELECT query_id, neighbor_id,
                 CAST(round(cosine * 1e6) AS BIGINT) AS rel,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS rank
          FROM p),
    cand AS (SELECT query_id, neighbor_id AS cid, rel FROM r
             WHERE rank <= {_SHORTLIST}),
    cpair AS (
        SELECT ca.query_id, ca.cid AS a, cb.cid AS b,
               CAST(round({cos_ab} * 1e6) AS BIGINT) AS sim
        FROM cand ca
        JOIN cand cb ON ca.query_id = cb.query_id AND ca.cid != cb.cid
        JOIN embeddings ea ON ea.vec_id = ca.cid
        JOIN embeddings eb ON eb.vec_id = cb.cid
    ),
    s1 AS (SELECT query_id, cid, rel, CAST(0 AS BIGINT) AS ms,
                  {_LAM_NUM} * rel AS score
           FROM (SELECT query_id, cid, rel,
                        ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY rel DESC, cid) AS rn
                 FROM cand) t WHERE rn = 1),
    sel1 AS (SELECT query_id, cid FROM s1)"""]
    for i in range(2, _SELECT_K + 1):
        parts.append(f"""
    s{i} AS (SELECT query_id, cid, rel, ms, score FROM (
        SELECT c.query_id, c.cid, c.rel, m.ms,
               {_LAM_NUM} * c.rel - {_DIV_NUM} * m.ms AS score,
               ROW_NUMBER() OVER (PARTITION BY c.query_id
                                  ORDER BY {_LAM_NUM} * c.rel
                                           - {_DIV_NUM} * m.ms DESC,
                                           c.cid) AS rn
        FROM cand c
        JOIN (SELECT pp.query_id, pp.a AS cid, MAX(pp.sim) AS ms
              FROM cpair pp
              JOIN sel{i - 1} s ON s.query_id = pp.query_id
                               AND s.cid = pp.b
              GROUP BY 1, 2) m
          ON m.query_id = c.query_id AND m.cid = c.cid
        WHERE NOT EXISTS (SELECT 1 FROM sel{i - 1} sx
                          WHERE sx.query_id = c.query_id
                            AND sx.cid = c.cid)
    ) t WHERE rn = 1),
    sel{i} AS (SELECT query_id, cid FROM sel{i - 1}
               UNION ALL SELECT query_id, cid FROM s{i})""")
    unions = "\n    UNION ALL\n".join(
        f"""SELECT query_id, CAST({i} AS BIGINT) AS step, cid AS selected_id,
               rel AS rel_micro, ms AS maxsim_micro, score AS mmr_score
        FROM s{i}""" for i in range(1, _SELECT_K + 1))
    return "WITH" + ",".join(parts) + "\n    " + unions


@register("mmr_diverse_selection", _mmr_sql())
def mmr_diverse_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified top-5 over the exact top-10 shortlists — see
    module docstring and :func:`operators.similarity.mmr_select`."""
    from .operators.similarity import cosine_topk, dot, mmr_select, with_norm

    e = t(spark, sf_dir, "embeddings")
    top = cosine_topk(e, e.filter(F.col("vec_id") < _N_QUERIES),
                      k=_SHORTLIST)
    cand = top.select(
        "query_id", F.col("neighbor_id").alias("cid"),
        F.round(F.col("cosine") * 1e6).cast("long").alias("rel_micro"))
    ids = cand.select("query_id", "cid")
    va = with_norm(e.select(F.col("vec_id").alias("cid"),
                            F.col("embedding").alias("ea")), "ea", "na")
    vb = with_norm(e.select(F.col("vec_id").alias("b"),
                            F.col("embedding").alias("eb")), "eb", "nb")
    sims = (
        ids.join(ids.select("query_id", F.col("cid").alias("b")), "query_id")
        .filter(F.col("cid") != F.col("b"))
        .join(va, "cid").join(vb, "b")
        .select("query_id", F.col("cid").alias("a"), "b",
                F.round((dot("ea", "eb")
                         / (F.col("na") * F.col("nb"))) * 1e6)
                .cast("long").alias("sim_micro"))
    )
    return mmr_select(cand, sims, k=_SELECT_K,
                      lam_num=_LAM_NUM, lam_den=_LAM_NUM + _DIV_NUM)


# =========================================================================
# per-source unigram KL divergence vs the corpus
# =========================================================================

_KL_SQL = f"""
    WITH tok AS (
        SELECT source, unnest({_TOKS_DUCK}) AS tk FROM documents
    ),
    st AS (SELECT source, tk, CAST(COUNT(*) AS BIGINT) AS c_st
           FROM tok GROUP BY 1, 2),
    ct AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS c_t FROM tok GROUP BY 1),
    ns AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s,
                  CAST(COUNT(*) AS BIGINT) AS n_types
           FROM st GROUP BY 1),
    nt AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n FROM ct),
    terms AS (
        SELECT st.source, st.c_st,
               CAST(round(ln((CAST(st.c_st AS DOUBLE) * CAST(nt.n AS DOUBLE))
                             / (CAST(ns.n_s AS DOUBLE)
                                * CAST(ct.c_t AS DOUBLE))) * 1e6)
                    AS BIGINT) AS term_micro
        FROM st JOIN ct USING (tk) JOIN ns USING (source) CROSS JOIN nt
    )
    SELECT t.source, ns.n_s AS n_tokens, ns.n_types,
           CAST(round(CAST(SUM(t.c_st * t.term_micro) AS DOUBLE) / ns.n_s)
                AS BIGINT) AS kl_micro
    FROM terms t JOIN ns USING (source)
    GROUP BY 1, 2, 3
"""


@register("source_unigram_kl", _KL_SQL)
def source_unigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL vs the corpus in micro-nats — see module
    docstring for the integer-rational ln device and the single final
    division."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("source",
                      F.explode(F.expr(_TOKS_SPARK)).alias("tk"))
    st = tok.groupBy("source", "tk").agg(
        F.count("*").cast("long").alias("c_st"))
    ct = tok.groupBy("tk").agg(F.count("*").cast("long").alias("c_t"))
    ns = st.groupBy("source").agg(
        F.sum("c_st").cast("long").alias("n_s"),
        F.count("*").cast("long").alias("n_types"))
    nt = ct.agg(F.sum("c_t").cast("long").alias("n"))
    term = F.round(F.log(
        (F.col("c_st").cast("double") * F.col("n").cast("double"))
        / (F.col("n_s").cast("double") * F.col("c_t").cast("double"))
    ) * 1e6).cast("long")
    return (
        st.join(ct, "tk")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(nt))
        .withColumn("w", F.col("c_st") * term)
        .groupBy("source", "n_s", "n_types")
        .agg(F.sum("w").alias("sw"))
        .select(
            "source", F.col("n_s").alias("n_tokens"), "n_types",
            F.round(F.col("sw").cast("double") / F.col("n_s"))
            .cast("long").alias("kl_micro"))
    )


# =========================================================================
# quality quartiles × near-dup rate — spine-decomposed NTILE
# =========================================================================

_QD_SQL = f"""
    WITH {_SHINGLES_CTE},
    vp AS (
        SELECT d1, d2 FROM ipair
        JOIN sz sa ON sa.doc_id = d1
        JOIN sz sb ON sb.doc_id = d2
        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 5e-1
    ),
    dup AS (SELECT DISTINCT doc_id FROM
            (SELECT d1 AS doc_id FROM vp
             UNION ALL SELECT d2 FROM vp) u),
    tk AS (SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents),
    s AS (
        SELECT doc_id,
               CAST(round(1e4 * len(list_distinct(toks)) / len(toks))
                    AS BIGINT) AS uniq_bp
        FROM tk WHERE len(toks) >= 1
    ),
    qt AS (SELECT doc_id, uniq_bp,
                  ntile(4) OVER (ORDER BY uniq_bp DESC, doc_id) AS quartile
           FROM s)
    SELECT CAST(quartile AS BIGINT) AS quartile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_docs,
           CAST(round(1e4 * SUM(CASE WHEN dup.doc_id IS NOT NULL
                                     THEN 1 ELSE 0 END) / COUNT(*))
                AS BIGINT) AS dup_bp,
           CAST(MIN(uniq_bp) AS BIGINT) AS min_uniq_bp,
           CAST(MAX(uniq_bp) AS BIGINT) AS max_uniq_bp
    FROM qt LEFT JOIN dup USING (doc_id)
    GROUP BY 1
"""


@register("quality_dup_quartiles", _QD_SQL)
def quality_dup_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-quartile × near-dup matrix — see module docstring.  The
    oracle states global NTILE(4); here the rank comes from the
    wave-20 spine decomposition (cum_before(score) + within-score
    row_number) and the closed-form ntile bucket formula, so the only
    globally-ordered state is the score spine (≤ 10^4 + 1 rows).

    Banding caveat (ADVICE r8): the dup set comes from MinHash-LSH
    candidates at threshold 0.5 with the module defaults b=16 bands ×
    r=2 rows, where a true pair at exactly j=0.5 survives banding with
    probability 1−(1−0.5²)^16 ≈ 99.0% (vs ≈1−8e-8 at j=0.8, the figure
    the dedup.py S-curve note quotes).  Gate parity is therefore
    data-dependent in principle; both engines share the identical md5
    hash family, so on any FIXED corpus (including the driver's) the
    candidate sets — and the gate — are deterministic and equal."""
    from .operators.dedup import minhash_lsh_pairs

    docs = t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5).select("d1", "d2")
    dup = (pairs.select(F.col("d1").alias("doc_id"))
           .union(pairs.select(F.col("d2").alias("doc_id")))
           .distinct().withColumn("is_dup", F.lit(1)))
    tk = docs.select("doc_id", F.expr(_TOKS_SPARK).alias("toks"))
    s = tk.filter(F.size("toks") >= 1).select(
        "doc_id",
        F.round(F.lit(1e4) * F.size(F.array_distinct("toks"))
                / F.size("toks")).cast("long").alias("uniq_bp"))
    # score spine: cumulative doc count of strictly-better scores
    spine = s.groupBy("uniq_bp").agg(F.count("*").alias("cnt"))
    w_spine = (Window.orderBy(F.desc("uniq_bp"))
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    spine = spine.withColumn(
        "cum_before", (F.sum("cnt").over(w_spine) - F.col("cnt")))
    w_in = Window.partitionBy("uniq_bp").orderBy("doc_id")
    ranked = (
        s.withColumn("rn", F.row_number().over(w_in))
        .join(F.broadcast(spine.select("uniq_bp", "cum_before")), "uniq_bp")
        .withColumn("rank", F.col("cum_before") + F.col("rn"))
    )
    n = s.agg(F.count("*").cast("long").alias("n"))
    # closed-form ntile(4): the first n%4 buckets take n div 4 + 1 rows
    bucket = F.expr(
        "CASE WHEN rank <= (n % 4) * ((n div 4) + 1) "
        "THEN (rank - 1) div ((n div 4) + 1) + 1 "
        "ELSE (n % 4) + (rank - 1 - (n % 4) * ((n div 4) + 1)) div (n div 4)"
        " + 1 END")
    return (
        ranked.crossJoin(F.broadcast(n))
        .withColumn("quartile", bucket.cast("long"))
        .join(F.broadcast(dup), "doc_id", "left")
        .groupBy("quartile")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
            .cast("long").alias("n_dup_docs"),
            F.min("uniq_bp").cast("long").alias("min_uniq_bp"),
            F.max("uniq_bp").cast("long").alias("max_uniq_bp"),
        )
        .select(
            "quartile", "n_docs", "n_dup_docs",
            F.round(F.lit(1e4) * F.col("n_dup_docs") / F.col("n_docs"))
            .cast("long").alias("dup_bp"),
            "min_uniq_bp", "max_uniq_bp")
    )
