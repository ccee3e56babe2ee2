"""Training-data curation wave 2: benchmark-contamination detection,
token-shard packing, and a per-source curation funnel.

These extend the dedup/similarity/text-stats family (registry_llm) with
the remaining ops a pretraining-data pipeline runs before materializing
shards: "is any training doc contaminated with eval-benchmark text?",
"how do documents pack into fixed-token shards?", and "what does each
source contribute after quality filtering?".

Scale notes (100 TB plans):
- Contamination: the benchmark n-gram set is tiny relative to the corpus
  (benchmarks are thousands of docs), so it is explicitly ``broadcast()``
  — the 100 TB corpus side streams map-side with no shuffle for the probe
  join; a Bloom filter over benchmark shingles is the documented
  further-scale variant. Corpus shingles are exploded *after* the
  distinct-per-doc dedup so join fan-out is bounded by document length.
- Shard packing uses a per-source running token sum (partitioned window,
  one shuffle on source); contiguous-fill assignment — shard boundaries
  may split a document, exactly how pretraining sequence packing
  concatenates-then-chunks. No global sort.
- The curation funnel is one hash aggregate over per-row flags.

Tokenization parity: split on a single space, the convention shared by
the whole dedup/text-stats family (DuckDB ``string_split(text, ' ')`` ==
Spark ``split(text, ' ')``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm import _CC_REACH_CTE, _SHINGLES_CTE


def _with_4gram_shingles(docs: DataFrame) -> DataFrame:
    """Add ``toks`` + distinct word 4-gram ``shingles`` columns.

    The token array is materialized as its own column first so the
    ``transform`` lambda slices an already-evaluated attribute —
    O(words·n) per row, avoiding the O(words²) re-split trap documented
    in operators/dedup.token_shingles."""
    return docs.withColumn("toks", F.split("text", " ")).withColumn(
        "shingles",
        F.expr(
            "array_distinct(transform("
            " sequence(1, greatest(1, size(toks) - 3)),"
            " i -> concat_ws(' ', slice(toks, i, 4))))"
        ),
    )


def _contamination_exact(docs: DataFrame, candidates: DataFrame | None = None) -> DataFrame:
    """Shared exact corpus-vs-benchmark 4-gram overlap: (doc_id, n_matched,
    n_shingles, contamination) for contaminated docs only. The benchmark
    slice (doc_id %% 97) is broadcast; passing ``candidates`` (a doc_id
    frame) semi-join-reduces the corpus BEFORE the wide string join — the
    Bloom-gated scale path. One definition, used by contamination_overlap,
    contamination_bloom_gated, and the curation pipeline, so the three
    gates cannot silently diverge."""
    sh = _with_4gram_shingles(docs.select("doc_id", "text")).select(
        "doc_id", F.explode("shingles").alias("s")
    )
    bench = F.broadcast(
        sh.filter(F.col("doc_id") % 97 == 0).select("s").distinct()
    )
    corpus = sh.filter(F.col("doc_id") % 97 != 0)
    if candidates is not None:
        corpus = corpus.join(candidates, "doc_id", "left_semi")
    totals = corpus.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_shingles")
    )
    hits = (
        corpus.join(bench, "s")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_matched"))
    )
    return hits.join(totals, "doc_id").select(
        "doc_id",
        "n_matched",
        "n_shingles",
        (F.col("n_matched").cast("double") / F.col("n_shingles")).alias("contamination"),
    )


# =========================================================================
# Benchmark contamination — n-gram overlap against a held-out set
# =========================================================================

_CONTAMINATION_SQL = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS l
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(1, len(l) - 3) + 1),
                   i -> array_to_string(l[i:i+3], ' ')))) AS s
        FROM toks
    ),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
    corpus AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
    totals AS (SELECT doc_id, COUNT(*) AS n_shingles FROM corpus GROUP BY 1),
    hits AS (
        SELECT c.doc_id, COUNT(*) AS n_matched
        FROM corpus c JOIN bench b USING (s)
        GROUP BY 1
    )
    SELECT h.doc_id,
           CAST(h.n_matched AS BIGINT) AS n_matched,
           CAST(t.n_shingles AS BIGINT) AS n_shingles,
           CAST(h.n_matched AS DOUBLE) / t.n_shingles AS contamination
    FROM hits h JOIN totals t USING (doc_id)
    """


@register("contamination_overlap", _CONTAMINATION_SQL)
def contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-benchmark contamination: word 4-gram overlap of every corpus
    document against a benchmark set (here the deterministic doc_id % 97
    slice; in production, the eval suites). Returns only contaminated
    docs with matched/total shingle counts and the overlap ratio.

    The benchmark shingle set is broadcast — the corpus side never
    shuffles for the probe, which is what makes the check affordable on
    the full pretraining corpus rather than a sample."""
    return _contamination_exact(t(spark, sf_dir, "documents"))


# =========================================================================
# Token-shard packing — contiguous fill into fixed-token shards
# =========================================================================

_SHARD_TOKENS = 2048

@register(
    "token_shard_assignment",
    f"""
    WITH counted AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM counted
    )
    SELECT doc_id, source, n_tokens,
           CAST((cum_tokens - n_tokens) // {_SHARD_TOKENS} AS BIGINT) AS shard_id,
           CAST(cum_tokens - n_tokens AS BIGINT) AS shard_offset_base
    FROM cum
    """,
)
def token_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing shard assignment: within each source (ordered by
    doc_id), documents are concatenated and chunked into 2048-token
    shards; a document belongs to the shard where its first token lands
    (contiguous fill — boundary documents straddle, exactly like
    concatenate-then-chunk pretraining packing). One partitioned running
    sum; integer arithmetic end-to-end."""
    counted = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        counted.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn("before", F.col("cum_tokens") - F.col("n_tokens"))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.expr(f"before div {_SHARD_TOKENS}").cast("long").alias("shard_id"),
            F.col("before").cast("long").alias("shard_offset_base"),
        )
    )


# =========================================================================
# Curation funnel — per-source yield after quality filtering
# =========================================================================

@register(
    "curation_funnel",
    """
    WITH flagged AS (
        SELECT source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CASE WHEN len(string_split(text, ' ')) >= 30
                     AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                         / len(string_split(text, ' ')) > 0.3
                    THEN 1 ELSE 0 END AS keep
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(keep) AS BIGINT) AS n_kept,
           CAST(SUM(keep * n_tokens) AS BIGINT) AS kept_tokens,
           CAST(SUM(keep) AS DOUBLE) / COUNT(*) AS keep_rate
    FROM flagged
    GROUP BY source
    """,
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation report: document and token yield of a quality
    filter (≥30 tokens and >0.3 distinct-token ratio — the same family of
    heuristics as text_profile's quality score). One pass, one hash
    aggregate; the flags are integer so counts/sums are exact across
    engines, and keep_rate is a single int/int division."""
    docs = t(spark, sf_dir, "documents").withColumn("toks", F.split("text", " "))
    flagged = docs.select(
        "source",
        F.size("toks").cast("long").alias("n_tokens"),
        F.when(
            (F.size("toks") >= 30)
            & (
                F.size(F.array_distinct("toks")).cast("double") / F.size("toks")
                > 0.3
            ),
            1,
        )
        .otherwise(0)
        .alias("keep"),
    )
    return flagged.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("keep").cast("long").alias("n_kept"),
        F.sum(F.col("keep") * F.col("n_tokens")).cast("long").alias("kept_tokens"),
        (F.sum("keep").cast("double") / F.count("*")).alias("keep_rate"),
    )


# =========================================================================
# Dedup clusters — connected components over the near-dup pair graph
# =========================================================================

_CLUSTERS_SQL = f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_CC_REACH_CTE}
    SELECT src AS doc_id,
           CAST(MIN(dst) AS BIGINT) AS cluster_id,
           CAST(CASE WHEN MIN(dst) = src THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
    FROM reach
    GROUP BY src
"""

@register("dedup_clusters", _CLUSTERS_SQL)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs resolved into clusters: connected components over the
    LSH-verified pair graph, cluster id = min doc_id in the component, the
    canonical doc flagged. This is the step that makes dedup *actionable*
    (keep one per cluster) rather than a pair list. Spark runs min-label
    propagation (operators/dedup.connected_components — per-round shuffle
    keyed on node id, converges in ~diameter rounds, lineage cut per
    round); the oracle is the transitive closure as a recursive CTE, so
    the iterative distributed algorithm is proven against the declarative
    fixpoint."""
    from .operators.dedup import connected_components, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        t(spark, sf_dir, "documents"), threshold=0.5
    ).select("d1", "d2")
    cc = connected_components(pairs)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("cluster_id"),
        (F.col("node") == F.col("cluster_id")).cast("long").alias("is_canonical"),
    )


def contamination_bloom_prefilter(
    docs: DataFrame, num_bits: int = 1_000_000
) -> DataFrame:
    """Bloom-style pre-pass for contamination: candidate (doc_id,
    candidate_hits) pairs whose 4-grams *might* overlap the benchmark set.

    The scale path SCALE.md documents for when the benchmark shingle set
    outgrows a comfortable broadcast of the strings themselves: broadcast
    only the SET BITS — ``xxhash64(s) % num_bits`` positions of benchmark
    shingles (8 bytes/position vs ~50+/string), probe the corpus with the
    same hash-mod and a broadcast semi-join. This is a single-hash Bloom
    filter realized with built-ins (Spark's internal ``bloom_filter_agg``
    is optimizer-private in 4.1): modular collisions can only ADD
    candidates, never drop one, so running the exact
    :func:`contamination_overlap` join on the candidate subset equals the
    one-phase exact result — false positives cost work, not correctness.
    """
    sh = _with_4gram_shingles(docs.select("doc_id", "text")).select(
        "doc_id", F.explode("shingles").alias("s")
    )
    pos = F.pmod(F.xxhash64("s"), F.lit(num_bits)).alias("bit_pos")
    bench_bits = (
        sh.filter(F.col("doc_id") % 97 == 0).select(pos).distinct()
    )
    corpus = sh.filter(F.col("doc_id") % 97 != 0).select("doc_id", pos)
    return (
        corpus.join(F.broadcast(bench_bits), "bit_pos", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("candidate_hits"))
    )


@register("contamination_bloom_gated", _CONTAMINATION_SQL)
def contamination_bloom_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase contamination at the 100 TB shape, proven EXACT: the
    Bloom bit-position prefilter narrows the corpus to candidate docs,
    then the exact shingle-string verify runs on candidates only. Because
    modular hash collisions can only ADD candidates (no false negatives),
    the result is identical to the one-phase exact scan — so this gate
    shares :data:`_CONTAMINATION_SQL` with ``contamination_overlap``, and
    a hash-mismatch here would mean the prefilter dropped a true positive.
    The string shingles of non-candidate docs are never joined, which is
    the entire point at scale: the expensive wide-string shuffle touches
    only the (tiny) candidate slice."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    candidates = contamination_bloom_prefilter(docs).select("doc_id")
    return _contamination_exact(docs, candidates=candidates)


# =========================================================================
# End-to-end curation pipeline — the whole preprocessing funnel as ONE plan
# =========================================================================

@register(
    "curation_pipeline_e2e",
    f"""
    WITH base AS (
        SELECT doc_id, source, text,
               string_split(text, ' ') AS l
        FROM documents
    ),
    quality AS (  -- stage 1: quality filter
        SELECT doc_id, source, text, len(l) AS n_tokens
        FROM base
        WHERE len(l) >= 30
          AND CAST(len(list_distinct(l)) AS DOUBLE) / len(l) > 0.3
    ),
    deduped AS (  -- stage 2: exact dedup, canonical = min doc_id per digest
        SELECT * FROM quality q
        WHERE doc_id = (SELECT MIN(doc_id) FROM quality q2
                        WHERE md5(q2.text) = md5(q.text))
    ),
    sh AS (  -- stage 3: 4-gram contamination vs the doc_id %% 97 benchmark
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(1, len(l) - 3) + 1),
                   i -> array_to_string(l[i:i+3], ' ')))) AS s
        FROM base
    ),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
    contaminated AS (
        SELECT c.doc_id
        FROM (SELECT * FROM sh WHERE doc_id % 97 <> 0) c
        JOIN bench b USING (s)
        GROUP BY c.doc_id
        HAVING CAST(COUNT(*) AS DOUBLE) /
               (SELECT COUNT(*) FROM sh s2 WHERE s2.doc_id = c.doc_id) > 0.2
    ),
    survivors AS (
        SELECT * FROM deduped
        WHERE doc_id % 97 <> 0
          AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING)
                 - n_tokens) // {_SHARD_TOKENS} AS BIGINT) AS shard_id
    FROM survivors
    """,
)
def curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data preprocessing funnel composed as ONE
    declarative Catalyst plan — quality filter, exact dedup (canonical =
    min doc_id per content digest), benchmark-contamination drop (>20%
    4-gram overlap), and per-source token-shard packing of the survivors.
    Each stage exists as its own oracled gate (curation_funnel,
    dedup_exact, contamination_overlap, token_shard_assignment); this gate
    proves they COMPOSE: filters stay pushed, the dedup window and the
    packing window share the corpus scan, the contamination probe is a
    broadcast semi-join, and the full pipeline remains one lazy plan a
    user can point at 100 TB."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = F.split("text", " ")

    # stage 1: quality filter
    quality = docs.withColumn("n_tokens", F.size(toks).cast("long")).filter(
        (F.size(toks) >= 30)
        & (F.size(F.array_distinct(toks)).cast("double") / F.size(toks) > 0.3)
    )

    # stage 2: exact dedup — keep the min-doc_id copy of each digest
    w = Window.partitionBy(F.md5(F.encode(F.col("text"), "UTF-8")))
    deduped = (
        quality.withColumn("_canon", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_canon"))
        .drop("_canon")
    )

    # stage 3: contamination drop (>20% of the doc's distinct 4-grams hit
    # the benchmark slice) + drop the benchmark docs themselves
    contaminated = (
        _contamination_exact(docs)
        .filter(F.col("contamination") > 0.2)
        .select("doc_id")
    )
    survivors = (
        deduped.filter(F.col("doc_id") % 97 != 0)
        .join(contaminated, "doc_id", "left_anti")
    )

    # stage 4: per-source token-shard packing of the survivors
    ws = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        survivors.withColumn("_cum", F.sum("n_tokens").over(ws))
        .select(
            "doc_id", "source", "n_tokens",
            F.expr(f"(_cum - n_tokens) div {_SHARD_TOKENS}")
            .cast("long").alias("shard_id"),
        )
    )


# =========================================================================
# Source-mix rebalancing — deterministic down-sampling to a target mix
# =========================================================================

@register(
    "source_mix_rebalance",
    """
    WITH sized AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
    tgt AS (SELECT MIN(n) AS n_min FROM sized),
    ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    )
    SELECT doc_id, source, CAST(rk AS BIGINT) AS mix_rank
    FROM ranked, tgt
    WHERE rk <= tgt.n_min
    """,
)
def source_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix rebalancing: down-sample every source to the size of
    the smallest one (uniform target mix) by keeping each source's lowest
    md5-ordered documents. Hash-ordering makes the mix deterministic
    across runs, engines, and partitionings — re-materializing the mix
    after a backfill selects the SAME documents, which is what keeps
    dataset lineage auditable. Per-source window rank (one shuffle on
    source) + a broadcast 1-row scalar for the target size; ordering by
    the md5 STRING keeps selection integer/string-exact — no float
    sampling keys anywhere."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    n_min = (
        docs.groupBy("source").count()
        .agg(F.min("count").alias("n_min"))
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.withColumn("mix_rank", F.row_number().over(w).cast("long"))
    return (
        ranked.join(F.broadcast(n_min))
        .filter(F.col("mix_rank") <= F.col("n_min"))
        .select("doc_id", "source", "mix_rank")
    )


# =========================================================================
# TF-IDF top terms — the classic relevance/keyword-extraction op
# =========================================================================

@register(
    "tfidf_top_terms",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.tok, tf.tf, df.df,
               tf.tf * CAST(round(ln(CAST(n.n AS DOUBLE) / df.df) * 1e6) AS BIGINT)
                   AS score
        FROM tf JOIN df USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           score, CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, tok) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per document by tf-idf with FIXED-POINT idf:
    idf_micro = round(ln(N/df) * 1e6) as BIGINT, so the score (tf *
    idf_micro) is integer-exact and hash-checkable. Raw double idf is NOT
    cross-engine stable — JVM Math.log and libm ln differ by 1 ulp on ~8%%
    of this very input domain (measured) — while micro-nat quantization
    absorbs the ulp except exactly at a .5 boundary, which the fixed
    corpus provably never hits (the gate would hash-fail, not silently
    drift). Production engines quantize idf the same way (e.g. Lucene's
    reduced-precision norms).

    Plan shape at 100 TB: tf is one (doc,tok) shuffle, df reuses tf with a
    map-side-combined (tok) shuffle, N broadcasts as a 1-row literal, and
    the final top-3 is a per-doc window with map-side WindowGroupLimit
    pruning — three shuffles, each on the natural key of its stage, no
    all-pairs anything."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n"))
    scored = (
        tf.join(df, "tok")
        .join(F.broadcast(n))
        .withColumn(
            "score",
            (F.col("tf") * F.round(
                F.log(F.col("n").cast("double") / F.col("df")) * 1e6
            ).cast("long")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "tok", F.col("tf").cast("long").alias("tf"),
                F.col("df").cast("long").alias("df"), "score", "rank")
    )


@register(
    "doc_unigram_surprise",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    freq AS (SELECT tok, COUNT(*) AS freq FROM toks GROUP BY 1),
    tot AS (SELECT COUNT(*) AS tot FROM toks)
    SELECT tf.doc_id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
           CAST(SUM(tf.tf * CAST(round(
               ln(CAST(tot.tot AS DOUBLE) / freq.freq) * 1e6) AS BIGINT))
               AS BIGINT) AS surprise_micro
    FROM tf JOIN freq USING (tok) CROSS JOIN tot
    GROUP BY tf.doc_id
    """,
)
def doc_unigram_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model surprise per document — the classic
    quality/outlier filter (a doc of corpus-rare tokens scores high, a
    doc of boilerplate scores low). Per token occurrence the surprise is
    -ln p(tok) with p = corpus_freq/total, quantized to micro-nats
    exactly like tfidf_top_terms (integer-exact cross-engine where raw
    double ln is not), and summed per doc — an integer sum, so the total
    is hash-exact and order-free at any parallelism. Same three-shuffle
    shape as tf-idf; at 100 TB the freq table is the only corpus-wide
    aggregate and it combines map-side."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    freq = toks.groupBy("tok").agg(F.count("*").alias("freq"))
    tot = toks.agg(F.count("*").alias("tot"))
    s_micro = F.round(
        F.log(F.col("tot").cast("double") / F.col("freq")) * 1e6
    ).cast("long")
    return (
        tf.join(freq, "tok")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * s_micro).cast("long").alias("surprise_micro"),
        )
    )


# =========================================================================
# Document chunking — fixed-size overlapping token windows (RAG/training)
# =========================================================================

@register(
    "doc_chunks",
    """
    WITH toked AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    )
    , idx AS (
        SELECT doc_id, toks,
               unnest(range(0, CAST(floor((n_tokens - 1) / 48.0) AS BIGINT) + 1))
                   AS i
        FROM toked
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_id,
           array_to_string(toks[i * 48 + 1 : i * 48 + 64], ' ') AS chunk_text,
           CAST(len(toks[i * 48 + 1 : i * 48 + 64]) AS BIGINT) AS n_chunk_tokens
    FROM idx
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping chunking — the op every RAG / training-data
    pipeline runs before embedding or packing: windows of 64 tokens at
    stride 48 (16-token overlap), last window short, starts at 0, stride,
    2*stride, ... while inside the document. Pure row-local codegen
    (split -> sequence -> explode -> slice/array_join): chunking at
    100 TB is scan-speed with zero shuffle, and the chunk rows inherit
    the scan's partitioning for whatever embeds or packs them next."""
    docs = t(spark, sf_dir, "documents")
    size, stride = 64, 48
    toked = docs.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
    ).withColumn("n_tokens", F.size("toks"))
    chunks = toked.select(
        "doc_id", "toks",
        F.explode(
            F.sequence(F.lit(0),
                       F.floor((F.col("n_tokens") - 1) / stride).cast("long"))
        ).alias("chunk_id"),
    )
    sliced = F.slice("toks", F.col("chunk_id") * stride + 1, size)
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(sliced, " ").alias("chunk_text"),
        F.size(sliced).cast("long").alias("n_chunk_tokens"),
    )


# =========================================================================
# Embedding int8 scalar quantization — vector-store compression op
# =========================================================================

def _int8_oracle_sql(dim: int = 64) -> str:
    mm = ", ".join(
        f"MIN(CAST(embedding[{i}] AS DOUBLE)) AS mn{i}, "
        f"MAX(CAST(embedding[{i}] AS DOUBLE)) AS mx{i}"
        for i in range(1, dim + 1))
    arms = "\n        UNION ALL\n".join(
        f"        SELECT vec_id, {i} AS dim,"
        f" CASE WHEN mx{i} = mn{i} THEN 0 ELSE"
        f" CAST(round((CAST(embedding[{i}] AS DOUBLE) - mn{i})"
        f" / (mx{i} - mn{i}) * 254) AS INTEGER) - 127 END AS code"
        f" FROM embeddings, mm"
        for i in range(1, dim + 1))
    return f"""
    WITH mm AS (SELECT {mm} FROM embeddings)
{arms}
    """


@register("embedding_int8_quantize", _int8_oracle_sql())
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension min-max int8 quantization of the embedding corpus —
    the standard vector-store compression (4x over float32, 8x over
    float64) next to PQ's 32x. The 64 (min,max) calibration scalars come
    from one wide map-side-combined aggregate (a 1-row frame, broadcast
    like PQ's codebook); encoding is then a row-local codegen expression,
    so at 100 TB calibration is one cheap pass and quantization is
    scan-speed. Codes are integers — hash-exact on both engines (the
    affine map is the same double arithmetic, and round() agrees away
    from the .5 boundary, which min-max-normalized data hits with
    probability ~0 — a hash mismatch here would surface it loudly).
    Output is the exploded (vec_id, dim, code) form so the gate hashes
    scalar columns, not arrays."""
    dim = 64
    e = t(spark, sf_dir, "embeddings")
    x = [F.element_at("embedding", i).cast("double") for i in range(1, dim + 1)]
    mm = e.agg(*[f for i, xi in enumerate(x, 1)
                 for f in (F.min(xi).alias(f"mn{i}"), F.max(xi).alias(f"mx{i}"))])
    joined = e.crossJoin(F.broadcast(mm))
    arms = []
    for i, xi in enumerate(x, 1):
        mn, mx = F.col(f"mn{i}"), F.col(f"mx{i}")
        code = (F.round((xi - mn) / (mx - mn) * 254).cast("int") - 127)
        arms.append(F.struct(
            F.lit(i).alias("dim"),
            F.when(mx == mn, F.lit(0)).otherwise(code).alias("code"),
        ))
    return (
        joined.select("vec_id", F.explode(F.array(*arms)).alias("dc"))
        .select("vec_id", F.col("dc.dim").cast("long").alias("dim"),
                F.col("dc.code").alias("code"))
    )
