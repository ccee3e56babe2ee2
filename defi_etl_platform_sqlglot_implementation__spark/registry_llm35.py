"""Coverage wave 36 (round 9) — blocklist screening, RAG chunk-space
redundancy, and the model-quality × duplication cross.

- ``blocklist_screening_report``: the lexicon-based safety filter
  (C4's badwords screen / RefinedWeb's URL+word blocklists) in its
  configurable form — per document, occurrences of blocklist terms
  (exact whitespace-token match), both deployed decision rules priced
  side by side: ``any_hit`` (C4 semantics: one hit drops the doc) and
  the ratio rule hit_bp >= 500 (Gopher-style: flag only
  concentration).  Per source: docs, docs with any hit, docs over the
  ratio bar, total hits, and the two flag rates in bp — the table that
  decides which rule a corpus can afford.  The lexicon here is a
  4-term stand-in wired through one constant; the operator (token
  match -> per-doc counts -> per-source rates) is the real thing.

- ``chunk_dedup_report``: near-dup pricing in the RAG CHUNK space —
  the vector-store question ("what share of my chunks are verbatim
  duplicates?") that document-level dedup does not answer.  Chunks are
  the ``doc_chunks`` windows (64 tokens, stride 48 — byte-shared
  construction); an occurrence is redundant iff its chunk text's md5
  appears elsewhere in the corpus and the occurrence is not the
  canonical (min packed (doc_id, chunk_id)) one — the paragraph-canon
  device at chunk granularity.  Per source: chunk occurrences,
  distinct hashes, redundant occurrences, redundant_bp.

- ``ccnet_bucket_dup_matrix``: is low-quality (high-perplexity) text
  more duplicated?  The CCNet head/middle/tail assignment (byte-shared
  with ``ccnet_perplexity_buckets`` via _CCNET_RANKED_CTES /
  _ccnet_bucketed) crossed with LSH near-dup membership (the
  ``dedup_minhash_lsh`` device) — per (lang, bucket): docs, dup docs,
  dup_bp.  The model-based twin of ``quality_dup_quartiles`` (which
  crosses the RULE-based uniq-ratio score); together they answer
  whether cheap rules and the LM agree about where duplication lives.

Scale shapes: screening is a row-local array intersection + one hash
aggregate; chunk dedup is the doc_chunks explode + one md5-keyed canon
aggregate + a per-source reduce (linear in chunks); the matrix joins
two per-doc frames (bucketed docs × dup doc-set) — no pair-valued
state beyond the already-banded LSH stream.

Reference scope: composes the reference's aggregation surface
(src/transform/etl_pipeline.py groupbys) with the LLM-pipeline
extension; no counterpart file exists — cited per SURVEY §6 as a scale
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm import _SHINGLES_CTE
from .registry_llm27 import _CCNET_RANKED_CTES

# the configurable blocklist — a 4-term stand-in over the corpus vocab
_BLOCKLIST = ("slow", "dup", "null", "drop")
_RATIO_BAR_BP = 500


# =========================================================================
# blocklist_screening_report — C4 any-hit vs Gopher ratio rule
# =========================================================================

def _bl_sql_list() -> str:
    return ", ".join(f"'{w}'" for w in _BLOCKLIST)


_BLOCKLIST_SQL = f"""
    WITH tk AS (
        SELECT doc_id, source,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ),
    per_doc AS (
        SELECT doc_id, source,
               CAST(len(toks) AS BIGINT) AS n_tok,
               CAST(len(list_filter(toks, x -> x IN ({_bl_sql_list()})))
                    AS BIGINT) AS hits
        FROM tk
    ),
    flagged AS (
        SELECT source, n_tok, hits,
               CASE WHEN hits > 0 THEN 1 ELSE 0 END AS any_hit,
               CASE WHEN n_tok > 0
                         AND 1e4 * hits / n_tok >= {_RATIO_BAR_BP}
                    THEN 1 ELSE 0 END AS ratio_hit
        FROM per_doc
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(any_hit) AS BIGINT) AS n_any_hit,
           CAST(SUM(ratio_hit) AS BIGINT) AS n_ratio_hit,
           CAST(SUM(hits) AS BIGINT) AS total_hits,
           CAST(round(1e4 * SUM(any_hit) / COUNT(*)) AS BIGINT)
               AS any_hit_bp,
           CAST(round(1e4 * SUM(ratio_hit) / COUNT(*)) AS BIGINT)
               AS ratio_hit_bp
    FROM flagged GROUP BY 1
"""


@register("blocklist_screening_report", _BLOCKLIST_SQL)
def blocklist_screening_report(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    """Lexicon screening with both deployed decision rules — see module
    docstring.  The ratio predicate 1e4·hits/n_tok >= bar is evaluated
    the same way on both engines (exact integers into one double
    compare against an integer bar; hits <= n_tok keeps the product
    well inside 2^53)."""
    docs = t(spark, sf_dir, "documents")
    bl = ", ".join(f"'{w}'" for w in _BLOCKLIST)
    per_doc = docs.select(
        "doc_id", "source",
        F.expr("size(filter(split(text, ' '), x -> x != ''))")
        .cast("long").alias("n_tok"),
        F.expr(f"size(filter(filter(split(text, ' '), x -> x != ''), "
               f"x -> x IN ({bl})))").cast("long").alias("hits"))
    any_hit = F.when(F.col("hits") > 0, 1).otherwise(0)
    ratio_hit = F.when(
        (F.col("n_tok") > 0)
        & (F.lit(1e4) * F.col("hits") / F.col("n_tok")
           >= _RATIO_BAR_BP), 1).otherwise(0)
    return (
        per_doc.select("source", "n_tok", "hits",
                       any_hit.alias("any_hit"),
                       ratio_hit.alias("ratio_hit"))
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.sum("any_hit").cast("long").alias("n_any_hit"),
             F.sum("ratio_hit").cast("long").alias("n_ratio_hit"),
             F.sum("hits").cast("long").alias("total_hits"),
             F.round(F.lit(1e4) * F.sum("any_hit") / F.count("*"))
             .cast("long").alias("any_hit_bp"),
             F.round(F.lit(1e4) * F.sum("ratio_hit") / F.count("*"))
             .cast("long").alias("ratio_hit_bp"))
    )


# =========================================================================
# chunk_dedup_report — verbatim redundancy in the RAG chunk space
# =========================================================================

_CHUNK_SIZE, _CHUNK_STRIDE = 64, 48      # the doc_chunks window contract

_CHUNK_DEDUP_SQL = f"""
    WITH toked AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    idx AS (
        SELECT doc_id, toks,
               unnest(range(0, CAST(floor((n_tokens - 1)
                                          / {_CHUNK_STRIDE}.0) AS BIGINT)
                               + 1)) AS i
        FROM toked
    ),
    ch AS (
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
               md5(array_to_string(
                   toks[i * {_CHUNK_STRIDE} + 1
                        : i * {_CHUNK_STRIDE} + {_CHUNK_SIZE}], ' '))
                   AS h
        FROM idx
    ),
    canon AS (
        SELECT h, COUNT(*) AS n_occ,
               MIN(doc_id * 100000 + chunk_id) AS ck
        FROM ch GROUP BY h
    ),
    tagged AS (
        SELECT ch.doc_id, ch.chunk_id, ch.h,
               CASE WHEN c.n_occ > 1
                         AND ch.doc_id * 100000 + ch.chunk_id <> c.ck
                    THEN 1 ELSE 0 END AS redundant
        FROM ch JOIN canon c USING (h)
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT t.h) AS BIGINT) AS distinct_hashes,
           CAST(SUM(t.redundant) AS BIGINT) AS redundant_chunks,
           CAST(round(1e4 * SUM(t.redundant) / COUNT(*)) AS BIGINT)
               AS redundant_bp
    FROM tagged t JOIN documents d USING (doc_id)
    GROUP BY 1
"""


@register("chunk_dedup_report", _CHUNK_DEDUP_SQL)
def chunk_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source verbatim redundancy of the RAG chunk space — see
    module docstring.  Chunk construction is the doc_chunks window
    contract (64/48, byte-shared constants; cross-gate chunk-count
    agreement pytest-pinned); canonical-occurrence selection is the
    paragraph packed-key MIN device at chunk granularity."""
    docs = t(spark, sf_dir, "documents")
    toked = docs.select("doc_id", F.split("text", " ").alias("toks")) \
        .withColumn("n_tokens", F.size("toks"))
    ch = (
        toked.select(
            "doc_id", "toks",
            F.explode(F.sequence(
                F.lit(0),
                F.floor((F.col("n_tokens") - 1) / _CHUNK_STRIDE)
                .cast("long"))).alias("chunk_id"))
        .select(
            "doc_id", F.col("chunk_id").cast("long").alias("chunk_id"),
            F.md5(F.array_join(
                F.slice("toks", F.col("chunk_id") * _CHUNK_STRIDE + 1,
                        _CHUNK_SIZE), " ")).alias("h"))
    )
    canon = ch.groupBy("h").agg(
        F.count("*").alias("n_occ"),
        F.min(F.col("doc_id") * 100000 + F.col("chunk_id")).alias("ck"))
    tagged = (
        ch.join(canon, "h")
        .select("doc_id", "h",
                F.when((F.col("n_occ") > 1)
                       & (F.col("doc_id") * 100000 + F.col("chunk_id")
                          != F.col("ck")), 1).otherwise(0)
                .alias("redundant"))
    )
    return (
        tagged.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_chunks"),
             F.countDistinct("h").cast("long").alias("distinct_hashes"),
             F.sum("redundant").cast("long").alias("redundant_chunks"),
             F.round(F.lit(1e4) * F.sum("redundant") / F.count("*"))
             .cast("long").alias("redundant_bp"))
    )


# =========================================================================
# ccnet_bucket_dup_matrix — LM-quality buckets × near-dup membership
# =========================================================================

_CCNET_DUP_SQL = f"""
    WITH {_SHINGLES_CTE},
    {_CCNET_RANKED_CTES},
    dupd AS (
        SELECT DISTINCT doc_id FROM (
            SELECT d1 AS doc_id FROM ipair
            JOIN sz sa ON sa.doc_id = d1 JOIN sz sb ON sb.doc_id = d2
            WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 5e-1
            UNION ALL
            SELECT d2 FROM ipair
            JOIN sz sa ON sa.doc_id = d1 JOIN sz sb ON sb.doc_id = d2
            WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 5e-1)
    )
    SELECT r.lang, CAST(r.bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN dupd.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup,
           CAST(round(1e4 * SUM(CASE WHEN dupd.doc_id IS NOT NULL
                                     THEN 1 ELSE 0 END) / COUNT(*))
                AS BIGINT) AS dup_bp
    FROM ranked r LEFT JOIN dupd USING (doc_id)
    GROUP BY 1, 2
"""


@register("ccnet_bucket_dup_matrix", _CCNET_DUP_SQL)
def ccnet_bucket_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity buckets × near-dup membership — see module docstring.
    Bucket assignment byte-shares _ccnet_bucketed (cross-gate agreement
    with ccnet_perplexity_buckets pinned); dup membership is the
    minhash_lsh_pairs endpoint set (the quality_dup_quartiles device,
    same banding caveat documented there).  Domain: docs with >= 2
    tokens (the bigram domain), like the bucket gate itself."""
    from .operators.dedup import minhash_lsh_pairs
    from .registry_llm27 import _ccnet_bucketed

    docs = t(spark, sf_dir, "documents")
    ranked = _ccnet_bucketed(spark, sf_dir)
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    dupd = (pairs.select(F.col("d1").alias("doc_id"))
            .unionAll(pairs.select(F.col("d2").alias("doc_id")))
            .distinct().withColumn("is_dup", F.lit(1)))
    dup = F.sum(F.when(F.col("is_dup").isNotNull(), 1).otherwise(0))
    return (
        ranked.join(dupd, "doc_id", "left")
        .groupBy("lang", F.col("bucket").cast("long").alias("bucket"))
        .agg(F.count("*").cast("long").alias("n_docs"),
             dup.cast("long").alias("n_dup"),
             F.round(F.lit(1e4) * dup / F.count("*")).cast("long")
             .alias("dup_bp"))
    )
