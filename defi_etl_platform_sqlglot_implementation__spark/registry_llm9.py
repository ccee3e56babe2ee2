"""Coverage wave 9 — corpus-curation diagnostics (round 5, session 2).

Four gates rounding out the training-data pipeline's REPORTING surface —
the numbers a data-mixing / dedup decision is actually made from:

- dup_cluster_size_histogram: the dedup yield report — how near-dup mass
  distributes over cluster sizes and how many docs dedup removes,
  composing the SAME pair graph + connected components as dedup_clusters
  so the diagnostic can never disagree with the operator it audits;
- source_temperature_weights: temperature-based mixture weights
  w_s proportional to (token count)^alpha at alpha=1/2 next to the raw
  proportional weights — the standard smoothing between uniform and
  proportional sampling for multi-source pretraining corpora;
- vocab_growth_curve: Heaps-law vocabulary growth over corpus prefixes
  (distinct tokens vs tokens ingested at each doc-id decile) — the
  diminishing-returns curve behind "is more of this source worth it";
- split_decontamination_report: word-4-gram contamination of every
  val/test doc against the TRAIN split's shingle set — the n-gram-level
  eval-decontamination audit next to registry_llm7's near-dup leakage
  pairs, sharing the split definition (registry_llm6) and the 4-gram
  device (registry_llm2) so neither boundary can drift.

Scale shapes: the histogram is a groupBy over cluster ids (the CC output
is already id-keyed); the weights gate reduces to one row per source and
folds the tiny per-source list driver-free with a deterministic
left-assoc sqrt chain (sqrt and divide are IEEE-correctly-rounded, so
the doubles compare EXACTLY cross-engine — no %.6e needed); the growth
curve is a linear first-occurrence aggregate (min doc_id per token) plus
a 10-row decile spine; the decontamination join shuffles on the shingle
key with the train set distinct-reduced first, and composes with the
Bloom prefilter (registry_llm2.contamination_bloom_prefilter) when the
train shingle set outgrows a comfortable shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm import _CC_REACH_CTE, _SHINGLES_CTE
from .registry_llm2 import _with_4gram_shingles
from .registry_llm6 import _NTOK_DUCK, _NTOK_SPARK, _SPLIT_CASE_DUCK, _split_col


# =========================================================================
# dedup yield report — cluster size histogram over the near-dup graph
# =========================================================================

@register(
    "dup_cluster_size_histogram",
    f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_CC_REACH_CTE},
    asg AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
            FROM reach GROUP BY src),
    alla AS (
        SELECT d.doc_id, COALESCE(a.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN asg a USING (doc_id)
    ),
    cs AS (SELECT cluster_id, COUNT(*) AS cluster_size
           FROM alla GROUP BY cluster_id)
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(cluster_size) AS BIGINT) AS docs_total,
           CAST(SUM(cluster_size - 1) AS BIGINT) AS docs_removed
    FROM cs
    GROUP BY cluster_size
    """,
)
def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup yield report: the near-dup pair graph (minhash LSH verified
    at exact Jaccard >= 0.5 — the dedup_clusters chain) resolved to
    connected components, then histogrammed by component size; docs in no
    pair count as size-1 singleton clusters so docs_total sums back to
    the corpus and docs_removed (keep-one-per-cluster) is read straight
    off the report. Composes the SAME pair derivation and CC operator as
    dedup_clusters / dedup_keep_canonical, so this diagnostic cannot
    disagree with the dedup it audits. Scale: the histogram adds one
    id-keyed groupBy and one small groupBy on top of the CC output —
    nothing wider than the dedup itself."""
    from .operators.dedup import connected_components, minhash_lsh_pairs

    docs = t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5).select("d1", "d2")
    cc = connected_components(pairs).select(
        F.col("node").alias("doc_id"), "cluster_id")
    assigned = (
        docs.select("doc_id")
        .join(cc, "doc_id", "left")
        .select("doc_id",
                F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"))
    )
    sizes = assigned.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"))
    return sizes.groupBy(F.col("cluster_size").cast("long").alias("cluster_size")).agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.sum("cluster_size").cast("long").alias("docs_total"),
        F.sum(F.col("cluster_size") - 1).cast("long").alias("docs_removed"),
    )


# =========================================================================
# temperature-based source mixture weights — w_s ∝ tokens_s^alpha
# =========================================================================

# ONE definition of the per-source token reduction + source-ordered
# sqrt-fold denominator, shared with the wave-11 sampling gates
# (registry_llm11) so the executed sampling plan can never disagree with
# the published mixture weights. The text composes into this gate's
# oracle BYTE-IDENTICALLY (pinned by test_llm11's fragment test).
_PER_SRC_DEN_CTES = f"""per_src AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM({_NTOK_DUCK}) AS BIGINT) AS n_tokens
        FROM documents
        GROUP BY source
    ),
    den AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot,
               list_reduce(
                   list_transform(LIST(CAST(n_tokens AS DOUBLE) ORDER BY source),
                                  x -> sqrt(x)),
                   (a, b) -> a + b) AS sq_tot
        FROM per_src
    )"""


def _per_src_den(docs):
    """Spark twin of _PER_SRC_DEN_CTES: (per_src, den) DataFrames."""
    per_src = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.expr(_NTOK_SPARK)).cast("long").alias("n_tokens"),
    )
    den = per_src.agg(
        F.sum("n_tokens").cast("long").alias("tot"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("source", "n_tokens"))),
            F.lit(0.0),
            lambda acc, x: acc + F.sqrt(x["n_tokens"].cast("double")),
        ).alias("sq_tot"),
    )
    return per_src, den


@register(
    "source_temperature_weights",
    f"""
    WITH {_PER_SRC_DEN_CTES}
    SELECT source, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / tot AS w_raw,
           sqrt(CAST(n_tokens AS DOUBLE)) / sq_tot AS w_temp
    FROM per_src, den
    """,
)
def source_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source mixture weights: raw proportional w_raw = tokens_s /
    Sigma tokens, and temperature-smoothed w_temp proportional to
    tokens_s^(1/2) — the alpha-sampling knob between uniform (alpha=0)
    and proportional (alpha=1) used to up-weight small sources in
    pretraining mixtures. Token counts reduce exactly as BIGINTs; the
    denominator Sigma sqrt(tokens_s) is a deterministic left-assoc fold
    over the source-ordered list on BOTH engines (Spark F.aggregate over
    sort_array(collect_list), DuckDB list_reduce over LIST(ORDER BY)),
    and sqrt/divide are IEEE-correctly-rounded — so the emitted doubles
    compare bit-exactly, no quantization needed. Scale: one hash
    aggregate to |sources| rows; the fold runs over the tiny per-source
    list, never the corpus."""
    per_src, den = _per_src_den(t(spark, sf_dir, "documents"))
    return per_src.crossJoin(F.broadcast(den)).select(
        "source", "n_docs", "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("tot")).alias("w_raw"),
        (F.sqrt(F.col("n_tokens").cast("double")) / F.col("sq_tot")).alias("w_temp"),
    )


# =========================================================================
# Heaps-law vocabulary growth over doc-id decile prefixes
# =========================================================================

@register(
    "vocab_growth_curve",
    """
    WITH mx AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
    tok AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                          x -> x <> '')) AS tk
        FROM documents
    ),
    dbuck AS (
        SELECT doc_id, doc_id * 10 // (SELECT n FROM mx) + 1 AS decile
        FROM documents
    ),
    per_doc AS (
        SELECT d.decile,
               CAST(COUNT(*) AS BIGINT) AS docs_in,
               CAST(COALESCE(SUM(s.n_inst), 0) AS BIGINT) AS tokens_in
        FROM dbuck d
        LEFT JOIN (SELECT doc_id, COUNT(*) AS n_inst
                   FROM tok GROUP BY doc_id) s USING (doc_id)
        GROUP BY d.decile
    ),
    first_seen AS (
        SELECT tk, MIN(doc_id) AS first_doc FROM tok GROUP BY tk
    ),
    vnew AS (
        SELECT first_doc * 10 // (SELECT n FROM mx) + 1 AS decile,
               CAST(COUNT(*) AS BIGINT) AS new_types
        FROM first_seen GROUP BY 1
    ),
    spine AS (SELECT unnest(range(1, 11)) AS decile)
    SELECT CAST(sp.decile AS BIGINT) AS decile,
           CAST(SUM(COALESCE(p.docs_in, 0)) OVER w AS BIGINT) AS docs_seen,
           CAST(SUM(COALESCE(p.tokens_in, 0)) OVER w AS BIGINT) AS tokens_seen,
           CAST(SUM(COALESCE(v.new_types, 0)) OVER w AS BIGINT) AS vocab_size
    FROM spine sp
    LEFT JOIN per_doc p ON p.decile = sp.decile
    LEFT JOIN vnew v ON v.decile = sp.decile
    WINDOW w AS (ORDER BY sp.decile ROWS UNBOUNDED PRECEDING)
    """,
)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: at each doc-id decile prefix of the
    corpus, the cumulative docs ingested, token instances ingested, and
    DISTINCT token types seen — the diminishing-returns curve that says
    whether more of a corpus still buys new vocabulary. Distributed form:
    a token's contribution to the curve is fully determined by its FIRST
    occurrence (min doc_id — one hash aggregate over the exploded
    corpus), so no prefix is ever re-scanned; the decile bucket is
    integer arithmetic (doc_id*10 div N), and only the 10-row decile
    spine is cumulated (a deliberate single-partition window over 10
    rows — the corpus-sized aggregates are all hash-partitioned).
    Integer-exact end to end."""
    docs = t(spark, sf_dir, "documents")
    mx = docs.agg((F.max("doc_id") + 1).alias("n"))
    tok = docs.select(
        "doc_id",
        F.explode(F.expr("filter(split(text, ' '), x -> x != '')")).alias("tk"),
    )
    per_doc_inst = tok.groupBy("doc_id").agg(F.count("*").alias("n_inst"))
    dbuck = (
        docs.select("doc_id").crossJoin(F.broadcast(mx))
        .join(per_doc_inst, "doc_id", "left")
        .select(
            (F.col("doc_id") * 10 / F.col("n")).cast("long").alias("_d"),
            F.coalesce("n_inst", F.lit(0)).alias("n_inst"),
        )
        .withColumn("decile", F.col("_d") + 1)
        .groupBy("decile")
        .agg(F.count("*").alias("docs_in"), F.sum("n_inst").alias("tokens_in"))
    )
    vnew = (
        tok.groupBy("tk").agg(F.min("doc_id").alias("first_doc"))
        .crossJoin(F.broadcast(mx))
        .select(((F.col("first_doc") * 10 / F.col("n")).cast("long") + 1)
                .alias("decile"))
        .groupBy("decile").agg(F.count("*").alias("new_types"))
    )
    spine = spark.range(1, 11).select(F.col("id").alias("decile"))
    w = (Window.orderBy("decile")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        spine.join(dbuck, "decile", "left").join(vnew, "decile", "left")
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.sum(F.coalesce("docs_in", F.lit(0))).over(w)
            .cast("long").alias("docs_seen"),
            F.sum(F.coalesce("tokens_in", F.lit(0))).over(w)
            .cast("long").alias("tokens_seen"),
            F.sum(F.coalesce("new_types", F.lit(0))).over(w)
            .cast("long").alias("vocab_size"),
        )
    )


# =========================================================================
# train→eval n-gram decontamination audit, by stratified split
# =========================================================================

@register(
    "split_decontamination_report",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(1, len(l) - 3) + 1),
                   i -> array_to_string(l[i:i+3], ' ')))) AS s
        FROM toks
    ),
    spl AS (
        SELECT doc_id, {_SPLIT_CASE_DUCK.format(id='doc_id')} AS split
        FROM documents
    ),
    tr AS (
        SELECT DISTINCT s FROM sh JOIN spl USING (doc_id)
        WHERE split = 'train'
    ),
    ev AS (
        SELECT sh.doc_id, spl.split, sh.s FROM sh JOIN spl USING (doc_id)
        WHERE split <> 'train'
    ),
    tot AS (SELECT doc_id, split, COUNT(*) AS n_shingles
            FROM ev GROUP BY doc_id, split),
    hits AS (SELECT ev.doc_id, COUNT(*) AS n_matched
             FROM ev JOIN tr USING (s) GROUP BY ev.doc_id)
    SELECT t.doc_id, t.split,
           CAST(t.n_shingles AS BIGINT) AS n_shingles,
           CAST(COALESCE(h.n_matched, 0) AS BIGINT) AS n_matched,
           CAST(COALESCE(h.n_matched, 0) AS DOUBLE) / t.n_shingles
               AS contamination
    FROM tot t LEFT JOIN hits h USING (doc_id)
    """,
)
def split_decontamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-decontamination audit: for EVERY val/test doc (zero-overlap
    docs included — an audit must show the clean rows too), the share of
    its distinct word 4-grams that appear anywhere in the TRAIN split.
    The split is the shared md5 stratified assignment (registry_llm6 —
    one definition with the split gate and the near-dup leakage audit);
    the 4-gram device is registry_llm2's. Together with
    split_leakage_pairs this covers both contamination modes: verbatim
    n-gram overlap here, whole-doc near-duplication there. Scale: the
    train shingle set is distinct-reduced before the equi-join on the
    shingle key (~12/16 of the corpus but each shingle once); when it
    outgrows a comfortable shuffle the Bloom prefilter
    (contamination_bloom_prefilter) gates the candidate set first, and
    false positives only add join work, never change the report."""
    docs = t(spark, sf_dir, "documents")
    sh = (_with_4gram_shingles(docs.select("doc_id", "text"))
          .select("doc_id", F.explode("shingles").alias("s"))
          .withColumn("split", _split_col()))
    train_sh = sh.filter(F.col("split") == "train").select("s").distinct()
    ev = sh.filter(F.col("split") != "train")
    tot = ev.groupBy("doc_id", "split").agg(
        F.count("*").cast("long").alias("n_shingles"))
    hits = (ev.join(train_sh, "s")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_matched")))
    return tot.join(hits, "doc_id", "left").select(
        "doc_id", "split", "n_shingles",
        F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
        (F.coalesce("n_matched", F.lit(0)).cast("double")
         / F.col("n_shingles")).alias("contamination"),
    )
