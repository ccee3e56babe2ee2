"""Coverage wave 6 — training-data pipeline operators (round 5).

Seven gates closing the remaining gaps a production LLM-data pipeline
has that the earlier waves did not cover as first-class, oracle-gated
operators:

- sequence packing (concat-and-chunk docs into fixed token windows),
- per-source token budgeting (the mixing knob),
- n-gram novelty scoring (share of shingles first seen in this doc),
- minhash estimator error (estimated vs exact Jaccard, engine-neutral
  md5 minhash family),
- language-ID confusion matrix (lang_id eval against stored labels),
- embedding norm outlier flags (integer-algebra z-score),
- stratified train/val/test split assignment (deterministic md5 split).

Scale notes per gate in the docstrings; the common theme is that every
cumulative/window form is PARTITIONED (by source / user), every join is
equi-keyed, and every verdict threshold is integer arithmetic so no
rounding edge can flip a flag between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm import _SHINGLES_CTE

# engine-shared token count: whitespace split, empty tokens dropped (the
# corpus-wide tokenizer convention, cf. gopher_quality_flags)
_NTOK_SPARK = "size(filter(split(text, ' '), x -> x != ''))"
_NTOK_DUCK = "len(list_filter(string_split(text, ' '), x -> x <> ''))"

_SEQ_LEN = 128
_SRC_BUDGET = 2000

# deterministic md5 train/val/test split — ONE definition shared by the
# stratified summary gate (below) and the cross-split leakage audit
# (registry_llm7), so the two can never disagree on bucket boundaries
_SPLIT_CASE_DUCK = """CASE WHEN substr(md5(CAST({id} AS VARCHAR)), 1, 1)
                         IN ('c', 'd') THEN 'val'
                    WHEN substr(md5(CAST({id} AS VARCHAR)), 1, 1)
                         IN ('e', 'f') THEN 'test'
                    ELSE 'train' END"""


def _split_col(id_col: str = "doc_id"):
    hexd = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    return (F.when(hexd.isin("c", "d"), "val")
            .when(hexd.isin("e", "f"), "test")
            .otherwise("train"))


# =========================================================================
# sequence packing — concat-and-chunk into fixed-length training windows
# =========================================================================

@register(
    "sequence_packing",
    f"""
    WITH tk AS (
        SELECT doc_id, source, {_NTOK_DUCK} AS n_tokens FROM documents
    ),
    c AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM tk
    )
    SELECT doc_id, source,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS tok_start,
           CAST((cum - n_tokens) // {_SEQ_LEN} AS BIGINT) AS first_seq,
           CAST(CASE WHEN n_tokens = 0 THEN (cum - n_tokens) // {_SEQ_LEN}
                     ELSE (cum - 1) // {_SEQ_LEN} END AS BIGINT) AS last_seq
    FROM c
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: within each source shard, docs
    concatenate in doc_id order and split into fixed {128}-token training
    windows; each doc reports its token span and the first/last sequence
    ids it lands in (a doc may straddle windows — standard
    concat-then-chunk pretraining prep). The cumulative sum is
    PARTITIONED BY source, so at 100 TB every shard packs independently
    in parallel — the global-order variant would serialize on one
    partition, which is exactly the shape this gate avoids."""
    docs = t(spark, sf_dir, "documents")
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = (docs.select("doc_id", "source",
                     F.expr(_NTOK_SPARK).cast("long").alias("n_tokens"))
         .withColumn("cum", F.sum("n_tokens").over(w)))
    start = (F.col("cum") - F.col("n_tokens"))
    return c.select(
        "doc_id", "source", "n_tokens",
        start.alias("tok_start"),
        F.expr(f"(cum - n_tokens) div {_SEQ_LEN}").alias("first_seq"),
        F.when(F.col("n_tokens") == 0,
               F.expr(f"(cum - n_tokens) div {_SEQ_LEN}"))
        .otherwise(F.expr(f"(cum - 1) div {_SEQ_LEN}")).alias("last_seq"),
    )


# =========================================================================
# per-source token budget — the data-mixing knob
# =========================================================================

@register(
    "tokens_per_source_budget",
    f"""
    WITH tk AS (
        SELECT doc_id, source, {_NTOK_DUCK} AS n_tokens FROM documents
    ),
    c AS (
        SELECT source, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM tk
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN cum <= {_SRC_BUDGET} THEN 1 ELSE 0 END)
                AS BIGINT) AS kept_docs,
           CAST(SUM(CASE WHEN cum <= {_SRC_BUDGET} THEN n_tokens ELSE 0 END)
                AS BIGINT) AS kept_tokens,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM c GROUP BY source
    """,
)
def tokens_per_source_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-source token budgeting: each source keeps docs in
    doc_id order until its cumulative token count exceeds the budget —
    the deterministic form of 'take N tokens of web, M of code' data
    mixing. Reports kept/total docs and tokens per source. Same
    partitioned-cumsum shape as sequence_packing (parallel per source);
    the keep decision is an integer comparison on the running sum."""
    docs = t(spark, sf_dir, "documents")
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = (docs.select("doc_id", "source",
                     F.expr(_NTOK_SPARK).cast("long").alias("n_tokens"))
         .withColumn("cum", F.sum("n_tokens").over(w)))
    kept = F.col("cum") <= _SRC_BUDGET
    return c.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("kept_docs"),
        F.sum(F.when(kept, F.col("n_tokens")).otherwise(0)).cast("long")
        .alias("kept_tokens"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


# =========================================================================
# n-gram novelty — share of shingles first seen in this document
# =========================================================================

@register(
    "ngram_novelty",
    f"""
    WITH {_SHINGLES_CTE},
    fo AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY 1),
    pm AS (
        SELECT sh.doc_id, COUNT(*) AS n_sh,
               SUM(CASE WHEN fo.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                   AS n_novel
        FROM sh JOIN fo ON fo.s = sh.s
        GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(pm.n_sh, 0) AS BIGINT) AS n_shingles,
           CAST(COALESCE(pm.n_novel, 0) AS BIGINT) AS n_novel,
           CASE WHEN pm.n_sh > 0
                THEN CAST(round(1e4 * pm.n_novel / pm.n_sh) AS BIGINT)
                ELSE NULL END AS novelty_bp
    FROM documents d LEFT JOIN pm ON pm.doc_id = d.doc_id
    """,
)
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty scoring for curation: per document, the fraction (basis
    points) of its distinct 3-gram shingles whose corpus-wide FIRST
    occurrence (min doc_id) is this document — boilerplate-heavy docs
    score near zero, fresh content near 10000. One explode + one shuffle
    keyed on the shingle (the min-doc map) + one keyed on doc_id; no
    pair join anywhere, so it scales linearly where pairwise dedup is
    quadratic — this is the cheap pre-filter that runs BEFORE pair-level
    dedup in a funnel."""
    from .operators.dedup import shingle_table

    sh = shingle_table(t(spark, sf_dir, "documents"))
    first = F.min("doc_id").over(Window.partitionBy("s"))
    pm = (sh.withColumn("first_doc", first)
          .groupBy("doc_id")
          .agg(F.count("*").alias("n_sh"),
               F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1)
                     .otherwise(0)).alias("n_novel")))
    docs = t(spark, sf_dir, "documents").select("doc_id")
    return docs.join(pm, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_sh", F.lit(0)).cast("long").alias("n_shingles"),
        F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        F.when(F.col("n_sh") > 0,
               F.round(F.lit(1e4) * F.col("n_novel") / F.col("n_sh"))
               .cast("long")).alias("novelty_bp"),
    )


# =========================================================================
# minhash estimator error — estimated vs exact Jaccard on true pairs
# =========================================================================

_MH_K = 8


@register(
    "minhash_estimate_error",
    f"""
    WITH {_SHINGLES_CTE},
    sig AS (
        SELECT doc_id, ix.i,
               MIN(substr(md5(CAST(ix.i AS VARCHAR) || '|' || s), 1, 16)) AS h
        FROM sh CROSS JOIN (SELECT unnest(range(0, {_MH_K})) AS i) ix
        GROUP BY 1, 2
    ),
    p AS (
        SELECT d1, d2, inter, sa.n AS n1, sb.n AS n2
        FROM ipair
        JOIN sz sa ON sa.doc_id = d1
        JOIN sz sb ON sb.doc_id = d2
        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 5e-1
    ),
    m AS (
        SELECT p.d1, p.d2, p.inter, p.n1, p.n2,
               SUM(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS est_matches
        FROM p
        JOIN sig a ON a.doc_id = p.d1
        JOIN sig b ON b.doc_id = p.d2 AND b.i = a.i
        GROUP BY 1, 2, 3, 4, 5
    )
    SELECT d1, d2,
           CAST(est_matches AS BIGINT) AS est_matches,
           CAST(round(1e4 * inter / (n1 + n2 - inter)) AS BIGINT)
               AS jaccard_bp,
           CAST(round(abs(1e4 * est_matches / {_MH_K}
                          - 1e4 * inter / (n1 + n2 - inter))) AS BIGINT)
               AS err_bp
    FROM m
    """,
)
def minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minhash estimator quality, measured: for every TRUE near-dup pair
    (exact Jaccard >= 0.5), the {8}-hash minhash agreement count vs the
    exact Jaccard, with the absolute error in basis points. The hash
    family here is md5-keyed (h_i = min over shingles of
    md5(i|shingle)) so BOTH engines compute bit-identical signatures —
    the production signatures (operators/dedup.minhash_signatures) use
    xxhash64 for speed, which no oracle can replay; this gate pins the
    ESTIMATOR algebra (per-hash min, agreement fraction) with an
    engine-neutral family instead. Signature build is one explode x K
    hashes, map-side min per (doc, i) — no pair interaction until the
    bounded true-pair join."""
    from .operators.dedup import ngram_jaccard_pairs, shingle_table

    docs = t(spark, sf_dir, "documents")
    sh = shingle_table(docs)
    sig = (
        sh.select("doc_id", "s",
                  F.explode(F.sequence(F.lit(0), F.lit(_MH_K - 1))).alias("i"))
        .groupBy("doc_id", "i")
        .agg(F.min(F.substring(
            F.md5(F.concat(F.col("i").cast("string"), F.lit("|"),
                           F.col("s"))), 1, 16)).alias("h"))
    )
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, oracle=True).select(
        "d1", "d2", "inter", "n1", "n2")
    a = sig.select(F.col("doc_id").alias("sig_d1"), F.col("i").alias("ia"),
                   F.col("h").alias("ha"))
    b = sig.select(F.col("doc_id").alias("sig_d2"), F.col("i").alias("ib"),
                   F.col("h").alias("hb"))
    m = (pairs.join(a, F.col("d1") == F.col("sig_d1"))
         .join(b, (F.col("d2") == F.col("sig_d2")) & (F.col("ib") == F.col("ia")))
         .groupBy("d1", "d2", "inter", "n1", "n2")
         .agg(F.sum(F.when(F.col("ha") == F.col("hb"), 1).otherwise(0))
              .alias("est_matches")))
    exact_bp = F.lit(1e4) * F.col("inter") / (
        F.col("n1") + F.col("n2") - F.col("inter"))
    return m.select(
        "d1", "d2",
        F.col("est_matches").cast("long").alias("est_matches"),
        F.round(exact_bp).cast("long").alias("jaccard_bp"),
        F.round(F.abs(F.lit(1e4) * F.col("est_matches") / _MH_K - exact_bp))
        .cast("long").alias("err_bp"),
    )


# =========================================================================
# language-ID confusion matrix — eval against stored labels
# =========================================================================

def _lang_confusion_sql() -> str:
    from .registry_llm import _LANG_COUNTS_CTE, _LANG_PRED_CASE

    return f"""
    WITH {_LANG_COUNTS_CTE},
    pred AS (
        SELECT doc_id, {_LANG_PRED_CASE} AS lang_pred
        FROM c
    )
    SELECT d.lang, p.lang_pred, CAST(COUNT(*) AS BIGINT) AS n
    FROM documents d JOIN pred p ON p.doc_id = d.doc_id
    GROUP BY 1, 2
    """


@register("lang_confusion_matrix", _lang_confusion_sql())
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID eval: confusion counts of the stopword-heuristic
    lang_id prediction against the corpus's stored lang labels — the
    matrix a curation team reads before trusting the classifier as a
    filter. Reuses the production lang_id operator verbatim (same CASE
    priority, same marker counts); two hash aggregates, no new scale
    surface."""
    from .operators.textstats import lang_id

    docs = t(spark, sf_dir, "documents")
    pred = lang_id(docs).select("doc_id", "lang_pred")
    return (docs.select("doc_id", "lang")
            .join(pred, "doc_id")
            .groupBy("lang", "lang_pred")
            .agg(F.count("*").cast("long").alias("n")))


# =========================================================================
# embedding norm outliers — integer-algebra z-score flags
# =========================================================================

def _norm_outliers_sql() -> str:
    from .registry_llm import _dot_chain

    return f"""
    WITH nm AS (
        SELECT a.vec_id,
               CAST(round(sqrt({_dot_chain('a', 'a')}) * 1000000) AS BIGINT)
                   AS norm_micro
        FROM embeddings a
    ),
    st AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(norm_micro) AS HUGEINT) AS s,
               SUM(CAST(norm_micro AS HUGEINT) * norm_micro) AS q
        FROM nm
    )
    SELECT nm.vec_id, nm.norm_micro,
           CAST(CASE WHEN (st.n * nm.norm_micro - st.s)
                          * (st.n * nm.norm_micro - st.s)
                          > 4 * (st.n * st.q - st.s * st.s)
                     THEN 1 ELSE 0 END AS INT) AS is_outlier
    FROM nm, st
    """


@register("embedding_norm_outliers", _norm_outliers_sql())
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QC: flag vectors whose L2 norm sits more than 2
    population standard deviations from the corpus mean — degenerate
    (near-zero) and blown-up vectors are the classic symptoms of a bad
    encoder batch. The norm is micro-quantized (round(norm*1e6) as
    BIGINT) and the z>2 test is the INTEGER inequality
    (n*x - S)^2 > 4(nQ - S^2), so no engine ever compares floats. Every
    accumulator and product on the Spark side runs in decimal(38,0) —
    the per-vector square is ~1e14, so a BIGINT Q would silently wrap
    past ~9.2M vectors (round-5 review). The decimal bound is set by
    the n*Q product (~N^2 * 1e14 vs the 38-digit cap): exact to ~1e12
    vectors — comfortably above a 100 TB corpus of 64-dim floats
    (~4e11) — and matching DuckDB's HUGEINT range; past it the engines
    FAIL DIFFERENTLY (Spark non-ANSI nulls the product, DuckDB errors),
    so treat 1e12 as a hard ceiling, not a soft one.
    Corpus stats are one scalar aggregate broadcast into a map-side
    projection: two passes over the vectors, no shuffle-by-key at
    all."""
    from .operators.similarity import dot

    e = t(spark, sf_dir, "embeddings")
    nm = e.select(
        "vec_id",
        F.round(F.sqrt(dot("embedding", "embedding")) * 1e6).cast("long")
        .alias("norm_micro"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731 — headroom casts
    st = nm.agg(F.count("*").alias("n"),
                F.sum(dec(F.col("norm_micro"))).alias("s"),
                F.sum(dec(F.col("norm_micro")) * F.col("norm_micro"))
                .alias("q"))
    lhs_root = dec(F.col("n")) * F.col("norm_micro") - F.col("s")
    rhs = (dec(F.col("n")) * F.col("q") - F.col("s") * F.col("s")) * F.lit(4)
    return nm.crossJoin(F.broadcast(st)).select(
        "vec_id", "norm_micro",
        F.when(lhs_root * lhs_root > rhs, 1).otherwise(0).cast("int")
        .alias("is_outlier"))


# =========================================================================
# stratified split assignment — deterministic md5 train/val/test
# =========================================================================

@register(
    "stratified_split_assignment",
    f"""
    WITH s AS (
        SELECT source,
               {_SPLIT_CASE_DUCK.format(id="doc_id")} AS split,
               {_NTOK_DUCK} AS n_tokens
        FROM documents
    )
    SELECT source, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM s GROUP BY 1, 2
    """,
)
def stratified_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split summarized per source stratum:
    the first hex digit of md5(doc_id) buckets 12/16 to train and 2/16
    each to val/test — reproducible across engines, runs, partitionings,
    and backfills (the same property bernoulli_hash_sample pins for
    sampling). The split is a row-local projection that pushes to the
    scan; the summary is one hash aggregate."""
    docs = t(spark, sf_dir, "documents")
    return (docs.select("source", _split_col().alias("split"),
                        F.expr(_NTOK_SPARK).cast("long").alias("n_tokens"))
            .groupBy("source", "split")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("n_tokens")))
