"""Coverage wave 28 — sequential-state dedup, whitening prep, and
collocation mining:

- ``event_debounce``: greedy per-(user, event_type) time-debounce (the
  rate-limit dedup a telemetry ingest runs) — the FIRST event is kept
  and each later one only if it is >= one window past the LAST KEPT
  event.  Genuinely sequential state, not a lag/session window (see
  operators/debounce.py for the counterexample), so the Spark side is
  the tier-(b) ``applyInPandas`` kernel and the oracle is a DuckDB
  RECURSIVE walk (next kept = first row at or past the cutoff, pinned
  by NOT EXISTS).  Output: every kept event plus the count of
  suppressed events trailing it.

- ``embedding_dim_correlation``: the whitening/PCA-prep pairwise report
  — for every dimension pair i<j, milli-quantized integer moments (n,
  S_i, S_j) plus a correlation SIGN and an |corr| > 0.5 flag decided by
  the pure-integer inequality 4·(n·P − S_i·S_j)² > (n·Q_i − S_i²)·
  (n·Q_j − S_j²) in decimal(38,0)/HUGEINT (the embedding_dim_stats
  device) — no float comparison can flip a flag cross-engine.  MILLI
  (1e3) quantization, not micro: the squared numerator must fit
  decimal(38,0) (≈6e30 at sf1; the flag math holds to ~1e8 vectors,
  documented bound — past that, re-scale the quantum).

- ``token_pmi_collocations``: phrase-mining PMI over adjacent token
  pairs (the signal BPE/phrase tokenizers merge on): for bigrams with
  count >= 5, pmi_micro = round(ln((c_ab·N)/(c_l·c_r))·1e6) with N the
  total bigram count and c_l/c_r the left/right slot marginals — the
  wave-12 ln micro-nat device on an integer rational; top 20 by
  (pmi_micro DESC, a, b), fully deterministic.

Scale: the debounce parallelism is the key count (groups are bounded —
one user's one event type); the dim-correlation stream is one
co-partitioned self-join on vec_id fanning out to 2016 pairs/vector
followed by one (i,j)-keyed aggregate (map-side combinable, output
cardinality 2016, independent of corpus size); PMI is two Zipf-bounded
marginal joins + one top-k.

Reference scope: composes the reference's aggregation surface with the
LLM-pipeline extension; no counterpart file exists — cited per SURVEY
§6 as a scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, t

_WINDOW_S = 86_400
_DIM = 64
_MIN_PAIR_COUNT = 5
_TOP_K = 20


# =========================================================================
# greedy event debounce — sequential state, applyInPandas vs RECURSIVE
# =========================================================================

_DEBOUNCE_SQL = f"""
    WITH RECURSIVE ev AS (
        SELECT user_id, event_type, event_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_key
        FROM events
    ),
    kept AS (
        SELECT user_id, event_type, event_id, ts, rn, n_key
        FROM ev WHERE rn = 1
        UNION ALL
        SELECT e.user_id, e.event_type, e.event_id, e.ts, e.rn, e.n_key
        FROM kept k JOIN ev e
          ON e.user_id = k.user_id AND e.event_type = k.event_type
         AND e.rn > k.rn AND e.ts >= k.ts + INTERVAL {_WINDOW_S} SECOND
        WHERE NOT EXISTS (
            SELECT 1 FROM ev e2
            WHERE e2.user_id = e.user_id AND e2.event_type = e.event_type
              AND e2.rn > k.rn AND e2.rn < e.rn
              AND e2.ts >= k.ts + INTERVAL {_WINDOW_S} SECOND)
    )
    SELECT user_id, event_type, event_id, ts,
           CAST(COALESCE(LEAD(rn) OVER (PARTITION BY user_id, event_type
                                        ORDER BY rn),
                         n_key + 1) - rn - 1 AS BIGINT) AS n_suppressed
    FROM kept
"""


@register("event_debounce", _DEBOUNCE_SQL)
def event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-key time-debounce — see module docstring and
    operators/debounce.py.  The oracle's recursive step selects the
    first row at or past the last kept timestamp + window (NOT EXISTS
    pins minimality); n_suppressed = gap to the next kept row."""
    from .operators.debounce import debounce_events

    return debounce_events(t(spark, sf_dir, "events"), window_s=_WINDOW_S)


# =========================================================================
# pairwise dimension correlation — whitening prep
# =========================================================================

_CORR_SQL = f"""
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
               SUM(CAST(a.q AS HUGEINT) * b.q) AS p,
               SUM(CAST(a.q AS HUGEINT) * a.q) AS qi,
               SUM(CAST(b.q AS HUGEINT) * b.q) AS qj
        FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.dim < b.dim
        GROUP BY 1, 2
    )
    SELECT CAST(dim_i AS BIGINT) AS dim_i, CAST(dim_j AS BIGINT) AS dim_j,
           CAST(n AS BIGINT) AS n,
           CAST(si AS BIGINT) AS sum_i_milli,
           CAST(sj AS BIGINT) AS sum_j_milli,
           CAST(CASE WHEN n * p - si * sj > 0 THEN 1
                     WHEN n * p - si * sj < 0 THEN -1
                     ELSE 0 END AS INT) AS corr_sign,
           CAST(CASE WHEN 4 * (n * p - si * sj) * (n * p - si * sj)
                          > (n * qi - si * si) * (n * qj - sj * sj)
                     THEN 1 ELSE 0 END AS INT) AS is_high_corr
    FROM pr
"""


@register("embedding_dim_correlation", _CORR_SQL)
def embedding_dim_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise dimension correlation flags — see module docstring for
    the integer inequality and the decimal(38,0) headroom bound."""
    e = t(spark, sf_dir, "embeddings")
    el = e.select(
        "vec_id",
        F.posexplode("embedding").alias("dim", "x")
    ).select(
        "vec_id", "dim",
        F.round(F.col("x").cast("double") * 1e3).cast("long").alias("q"))
    a = el.select("vec_id", F.col("dim").alias("dim_i"),
                  F.col("q").alias("qa"))
    b = el.select("vec_id", F.col("dim").alias("dim_j"),
                  F.col("q").alias("qb"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731 — headroom casts
    pr = (
        a.join(b, "vec_id")
        .filter(F.col("dim_i") < F.col("dim_j"))
        .groupBy("dim_i", "dim_j")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec(F.col("qa"))).alias("si"),
            F.sum(dec(F.col("qb"))).alias("sj"),
            F.sum(dec(F.col("qa")) * F.col("qb")).alias("p"),
            F.sum(dec(F.col("qa")) * F.col("qa")).alias("qi"),
            F.sum(dec(F.col("qb")) * F.col("qb")).alias("qj"),
        )
    )
    num = dec(F.col("n")) * F.col("p") - F.col("si") * F.col("sj")
    vi = dec(F.col("n")) * F.col("qi") - F.col("si") * F.col("si")
    vj = dec(F.col("n")) * F.col("qj") - F.col("sj") * F.col("sj")
    return pr.select(
        F.col("dim_i").cast("long").alias("dim_i"),
        F.col("dim_j").cast("long").alias("dim_j"),
        F.col("n").cast("long").alias("n"),
        F.col("si").cast("long").alias("sum_i_milli"),
        F.col("sj").cast("long").alias("sum_j_milli"),
        F.when(num > 0, 1).when(num < 0, -1).otherwise(0)
        .cast("int").alias("corr_sign"),
        F.when(F.lit(4) * num * num > vi * vj, 1).otherwise(0)
        .cast("int").alias("is_high_corr"),
    )


# =========================================================================
# PMI collocations — phrase-mining signal
# =========================================================================

_PMI_SQL = f"""
    WITH tf AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ),
    pos AS (
        SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        FROM tf WHERE len(toks) >= 2
    ),
    bg AS (SELECT toks[i] AS a, toks[i + 1] AS b FROM pos),
    cab AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab
            FROM bg GROUP BY 1, 2),
    cl AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS c_left FROM bg GROUP BY 1),
    cr AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c_right FROM bg GROUP BY 1),
    nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM bg)
    SELECT a, b, c_ab, c_left, c_right,
           CAST(round(ln((CAST(c_ab AS DOUBLE) * CAST(n AS DOUBLE))
                         / (CAST(c_left AS DOUBLE)
                            * CAST(c_right AS DOUBLE))) * 1e6)
                AS BIGINT) AS pmi_micro
    FROM cab
    JOIN cl USING (a)
    JOIN cr USING (b)
    CROSS JOIN nt
    WHERE c_ab >= {_MIN_PAIR_COUNT}
    ORDER BY pmi_micro DESC, a, b
    LIMIT {_TOP_K}
"""


@register("token_pmi_collocations", _PMI_SQL)
def token_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{20} adjacent-pair PMI collocations — see module docstring.
    Slot marginals (left/right) keep the distribution consistent with
    the bigram stream; the ln micro-nat round is the proven wave-12
    device; ordering is total (pmi DESC, a, b)."""
    docs = t(spark, sf_dir, "documents")
    tf = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("toks"))
    bg = tf.filter(F.size("toks") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS a,"
                "             element_at(toks, i + 1) AS b))"
            )
        ).alias("p"),
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    cab = bg.groupBy("a", "b").agg(F.count("*").cast("long").alias("c_ab"))
    cl = bg.groupBy("a").agg(F.count("*").cast("long").alias("c_left"))
    cr = bg.groupBy("b").agg(F.count("*").cast("long").alias("c_right"))
    nt = bg.agg(F.count("*").cast("long").alias("n"))
    pmi = F.round(F.log(
        (F.col("c_ab").cast("double") * F.col("n").cast("double"))
        / (F.col("c_left").cast("double") * F.col("c_right").cast("double"))
    ) * 1e6).cast("long")
    return (
        cab.filter(F.col("c_ab") >= _MIN_PAIR_COUNT)
        .join(cl, "a")
        .join(cr, "b")
        .crossJoin(F.broadcast(nt))
        .withColumn("pmi_micro", pmi)
        .select("a", "b", "c_ab", "c_left", "c_right", "pmi_micro")
        .orderBy(F.desc("pmi_micro"), "a", "b")
        .limit(_TOP_K)
    )
