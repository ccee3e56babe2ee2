"""Coverage wave 15 — pipeline-composition diagnostics over the wave-14
stages: domain-level token budgeting, paragraph-dup quality filtering,
hash-family recall measurement, and cross-strategy agreement.

These are the gates a pipeline OPERATOR consults after the individual
stages exist: how much of the token budget each domain gets after URL
dedup + caps, which documents a block-level dup-rate rule would drop,
how much recall a cheap hash family (SimHash) buys against the exact
near-dup truth, and how strongly the four dedup strategies agree on
which documents are problematic.  Every output is integer/bool/string
(counts and basis points) — float-parity class 1 throughout.

Scale notes: each gate composes already-audited shapes (url canonical
HashAggregate, paragraph packed-key argmin, shingle equi-joins, simhash
band-able self-join) plus one small aggregate; nothing quadratic is
introduced — the agreement matrix joins FLAG SETS (doc ids), never pair
sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm import _JACCARD_SQL, _simhash_sql
from .registry_llm6 import _NTOK_DUCK, _NTOK_SPARK
from .registry_llm14 import (
    _CANON_DUCK,
    _DOMAIN_CAP,
    _PARA_CTE,
    _URL_DUCK,
    _canonicalized,
)

# =========================================================================
# per-domain token budget after URL dedup + domain caps
# =========================================================================

# a domain may hold at most 1/10 of the kept corpus tokens — the standard
# anti-domination budget, derived (not absolute) so it bites at every sf
_DOMAIN_TOKEN_SHARE = 10


@register(
    "domain_token_budget",
    f"""
    WITH raw_urls AS (
        SELECT doc_id, {_URL_DUCK} AS url FROM documents
    ),
    {_CANON_DUCK},
    grp AS (
        SELECT canonical_url, domain, MIN(doc_id) AS canonical_doc,
               COUNT(*) AS n_dups
        FROM urls GROUP BY canonical_url, domain
    ),
    sized AS (
        SELECT g.*, d.n_chars, {_NTOK_DUCK} AS n_tokens
        FROM grp g JOIN documents d ON d.doc_id = g.canonical_doc
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY domain
                   ORDER BY n_chars DESC, canonical_doc ASC) AS rk
        FROM sized
    ),
    kept AS (SELECT * FROM ranked WHERE rk <= {_DOMAIN_CAP}),
    dom AS (
        SELECT domain, COUNT(*) AS n_pages, SUM(n_tokens) AS n_tokens
        FROM kept GROUP BY domain
    ),
    tot AS (SELECT SUM(n_tokens) AS total_tokens FROM dom)
    SELECT domain,
           CAST(n_pages AS BIGINT) AS n_pages,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(round(1e4 * n_tokens / total_tokens) AS BIGINT)
               AS token_share_bp,
           CAST(least(n_tokens, total_tokens // {_DOMAIN_TOKEN_SHARE})
                AS BIGINT) AS alloc_tokens,
           n_tokens > total_tokens // {_DOMAIN_TOKEN_SHARE} AS capped
    FROM dom CROSS JOIN tot
    """,
)
def domain_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain token ledger AFTER the URL pipeline: canonical
    pages surviving the per-domain cap, their token mass, corpus share
    in basis points, and the budget-capped allocation (a domain holds at
    most 1/{share} of the kept tokens).  One row per domain — the table
    a mixing stage consumes.  Scale: two hash aggregates (canonical_url,
    then domain) + a 1-row broadcast total."""
    docs = t(spark, sf_dir, "documents")
    from pyspark.sql import Window

    urls = _canonicalized(spark, sf_dir)
    grp = urls.groupBy("canonical_url", "domain").agg(
        F.min("doc_id").alias("canonical_doc"))
    sized = grp.join(
        docs.select(F.col("doc_id").alias("canonical_doc"), "n_chars",
                    F.expr(_NTOK_SPARK).alias("n_tokens")),
        "canonical_doc",
    )
    w = Window.partitionBy("domain").orderBy(
        F.desc("n_chars"), F.asc("canonical_doc"))
    kept = (sized.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _DOMAIN_CAP))
    dom = kept.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_pages"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    tot = dom.agg(F.sum("n_tokens").alias("total_tokens"))
    cap = F.expr(f"total_tokens div {_DOMAIN_TOKEN_SHARE}")
    return dom.crossJoin(F.broadcast(tot)).select(
        "domain", "n_pages", "n_tokens",
        F.round(F.lit(1e4) * F.col("n_tokens") / F.col("total_tokens"))
        .cast("long").alias("token_share_bp"),
        F.least(F.col("n_tokens"), cap).cast("long").alias("alloc_tokens"),
        (F.col("n_tokens") > cap).alias("capped"),
    )


# =========================================================================
# paragraph-dup-rate quality filter
# =========================================================================

_DUP_RATE_KEEP_BP = 2500  # drop docs whose dup paragraph share exceeds 25%


@register(
    "paragraph_dup_rate_filter",
    f"""
    WITH {_PARA_CTE},
    dup AS (
        SELECT h.doc_id, COUNT(*) AS n_dup
        FROM hashed h JOIN canon c USING (para_hash)
        WHERE c.n_occ > 1 AND h.doc_id * 100000 + h.para_idx <> c.ck
        GROUP BY h.doc_id
    ),
    totals AS (
        SELECT doc_id, COUNT(*) AS n_paras FROM hashed GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(t.n_paras AS BIGINT) AS n_paras,
           CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup,
           CAST(round(1e4 * COALESCE(d.n_dup, 0) / t.n_paras) AS BIGINT)
               AS dup_rate_bp,
           round(1e4 * COALESCE(d.n_dup, 0) / t.n_paras)
               <= {_DUP_RATE_KEEP_BP} AS keep
    FROM totals t LEFT JOIN dup d USING (doc_id)
    """,
)
def paragraph_dup_rate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-level quality rule (the curation decision wave-14's spans
    feed): per doc, the share of its 10-token paragraphs that are
    non-canonical duplicates, in basis points, and the keep verdict at
    the 25% threshold.  All docs output."""
    from .registry_llm14 import _paragraphs

    paras = _paragraphs(spark, sf_dir)
    canon = paras.groupBy("para_hash").agg(
        F.count("*").alias("n_occ"),
        F.min(F.col("doc_id") * 100000 + F.col("para_idx")).alias("ck"),
    )
    dup = (
        paras.join(canon, "para_hash")
        .filter((F.col("n_occ") > 1)
                & (F.col("doc_id") * 100000 + F.col("para_idx")
                   != F.col("ck")))
        .groupBy("doc_id").agg(F.count("*").alias("n_dup"))
    )
    totals = paras.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_paras"))
    rate = F.round(F.lit(1e4) * F.coalesce("n_dup", F.lit(0))
                   / F.col("n_paras"))
    return totals.join(dup, "doc_id", "left").select(
        "doc_id", "n_paras",
        F.coalesce("n_dup", F.lit(0)).cast("long").alias("n_dup"),
        rate.cast("long").alias("dup_rate_bp"),
        (rate <= _DUP_RATE_KEEP_BP).alias("keep"),
    )


# =========================================================================
# SimHash recall vs the exact near-dup truth
# =========================================================================

@register(
    "simhash_recall",
    f"""
    WITH truth AS MATERIALIZED ({_JACCARD_SQL}),
    sig AS ({_simhash_sql()}),
    simp AS MATERIALIZED (
        SELECT a.doc_id AS d1, b.doc_id AS d2
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ),
    hit AS (SELECT t.d1, t.d2 FROM truth t JOIN simp s
            ON s.d1 = t.d1 AND s.d2 = t.d2)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM simp) AS n_simhash,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM hit) AS n_overlap,
           -- zero-denominator guard, identical on both engines: an
           -- empty truth/candidate set reads as 0 bp, not null/inf
           CAST(CASE WHEN (SELECT COUNT(*) FROM truth) = 0 THEN 0
                ELSE round(1e4 * (SELECT COUNT(*) FROM hit)
                               / (SELECT COUNT(*) FROM truth)) END
                AS BIGINT) AS recall_bp,
           CAST(CASE WHEN (SELECT COUNT(*) FROM simp) = 0 THEN 0
                ELSE round(1e4 * (SELECT COUNT(*) FROM hit)
                               / (SELECT COUNT(*) FROM simp)) END
                AS BIGINT) AS precision_bp
    """,
)
def simhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured quality of the cheap hash family: how many of the exact
    word-3-gram Jaccard>=0.5 near-dup pairs the 32-bit SimHash at
    Hamming<=3 recovers, and how many of its candidates are true — the
    same evidence pattern as semdedup_recall for cluster blocking, so
    every approximate dedup family in the registry now carries a
    numeric recall gate."""
    from .operators.dedup import ngram_jaccard_pairs, simhash_pairs

    docs = t(spark, sf_dir, "documents")
    truth = ngram_jaccard_pairs(docs, threshold=0.5, oracle=True) \
        .select("d1", "d2")
    simp = simhash_pairs(docs, max_hamming=3).select("d1", "d2")
    hit = truth.join(simp, ["d1", "d2"])
    n_true = truth.agg(F.count("*").cast("long").alias("n_true"))
    n_sim = simp.agg(F.count("*").cast("long").alias("n_simhash"))
    n_hit = hit.agg(F.count("*").cast("long").alias("n_overlap"))
    return (
        n_true.crossJoin(n_sim).crossJoin(n_hit)
        .select(
            "n_true", "n_simhash", "n_overlap",
            # zero-denominator guard mirrors the oracle: 0 bp, not null
            F.when(F.col("n_true") == 0, F.lit(0)).otherwise(
                F.round(F.lit(1e4) * F.col("n_overlap") / F.col("n_true")))
            .cast("long").alias("recall_bp"),
            F.when(F.col("n_simhash") == 0, F.lit(0)).otherwise(
                F.round(F.lit(1e4) * F.col("n_overlap")
                        / F.col("n_simhash")))
            .cast("long").alias("precision_bp"),
        )
    )


# =========================================================================
# cross-strategy agreement matrix
# =========================================================================

def _flags_duck() -> str:
    """DuckDB CTEs: one (doc_id, v) flag row per strategy that considers
    the doc a duplicate/victim. exact = non-canonical verbatim copy;
    jaccard3 = member of a word-3-gram Jaccard>=0.5 pair; simhash3 =
    member of a Hamming<=3 pair; paragraph = carries a non-canonical
    duplicate paragraph."""
    return f"""
    ex AS (
        SELECT doc_id, 'exact' AS v FROM (
            SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS c
            FROM documents) WHERE doc_id <> c
    ),
    truth AS MATERIALIZED ({_JACCARD_SQL}),
    ja AS (
        SELECT DISTINCT doc_id, 'jaccard3' AS v FROM (
            SELECT d1 AS doc_id FROM truth UNION ALL SELECT d2 FROM truth)
    ),
    sig AS ({_simhash_sql()}),
    simp AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ),
    sh AS (
        SELECT DISTINCT doc_id, 'simhash3' AS v FROM (
            SELECT d1 AS doc_id FROM simp UNION ALL SELECT d2 FROM simp)
    ),
    {_PARA_CTE},
    pa AS (
        SELECT DISTINCT h.doc_id, 'paragraph' AS v
        FROM hashed h JOIN canon c USING (para_hash)
        WHERE c.n_occ > 1 AND h.doc_id * 100000 + h.para_idx <> c.ck
    ),
    flags AS (
        SELECT * FROM ex UNION ALL SELECT * FROM ja
        UNION ALL SELECT * FROM sh UNION ALL SELECT * FROM pa
    )
    """


@register(
    "dedup_variant_agreement",
    f"""
    WITH {_flags_duck()},
    m AS (
        SELECT a.v AS v1, b.v AS v2, COUNT(*) AS n_both
        FROM flags a JOIN flags b
          ON a.doc_id = b.doc_id AND a.v <= b.v
        GROUP BY a.v, b.v
    ),
    c AS (SELECT v, COUNT(*) AS n FROM flags GROUP BY v)
    SELECT m.v1, m.v2,
           CAST(c1.n AS BIGINT) AS n1, CAST(c2.n AS BIGINT) AS n2,
           CAST(m.n_both AS BIGINT) AS n_both
    FROM m JOIN c c1 ON c1.v = m.v1 JOIN c c2 ON c2.v = m.v2
    """,
)
def dedup_variant_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement matrix of the four dedup strategies (doc-level flag-set
    intersections, upper triangle incl. the diagonal): how many docs
    each strategy flags and how many two strategies agree on.  Joins
    flag SETS (doc ids), never pair sets — linear in the corpus."""
    from pyspark.sql import Window

    from .operators.dedup import ngram_jaccard_pairs, simhash_pairs
    from .registry_llm14 import _paragraphs

    docs = t(spark, sf_dir, "documents")
    wmin = Window.partitionBy(F.md5("text"))
    ex = (docs.select("doc_id", F.min("doc_id").over(wmin).alias("c"))
          .filter(F.col("doc_id") != F.col("c"))
          .select("doc_id", F.lit("exact").alias("v")))
    truth = ngram_jaccard_pairs(docs, threshold=0.5, oracle=True)
    ja = (truth.select(F.col("d1").alias("doc_id"))
          .unionAll(truth.select(F.col("d2").alias("doc_id")))
          .distinct().select("doc_id", F.lit("jaccard3").alias("v")))
    simp = simhash_pairs(docs, max_hamming=3)
    sh = (simp.select(F.col("d1").alias("doc_id"))
          .unionAll(simp.select(F.col("d2").alias("doc_id")))
          .distinct().select("doc_id", F.lit("simhash3").alias("v")))
    paras = _paragraphs(spark, sf_dir)
    canon = paras.groupBy("para_hash").agg(
        F.count("*").alias("n_occ"),
        F.min(F.col("doc_id") * 100000 + F.col("para_idx")).alias("ck"),
    )
    pa = (paras.join(canon, "para_hash")
          .filter((F.col("n_occ") > 1)
                  & (F.col("doc_id") * 100000 + F.col("para_idx")
                     != F.col("ck")))
          .select("doc_id").distinct()
          .select("doc_id", F.lit("paragraph").alias("v")))
    flags = ex.unionAll(ja).unionAll(sh).unionAll(pa)
    from .operators.materialize import scoped_persist

    flags = scoped_persist(flags)
    m = (flags.alias("a")
         .join(flags.alias("b"),
               (F.col("a.doc_id") == F.col("b.doc_id"))
               & (F.col("a.v") <= F.col("b.v")))
         .groupBy(F.col("a.v").alias("v1"), F.col("b.v").alias("v2"))
         .agg(F.count("*").cast("long").alias("n_both")))
    c = flags.groupBy("v").agg(F.count("*").cast("long").alias("n"))
    return (
        m.join(c.select(F.col("v").alias("v1"), F.col("n").alias("n1")), "v1")
        .join(c.select(F.col("v").alias("v2"), F.col("n").alias("n2")), "v2")
        .select("v1", "v2", "n1", "n2", "n_both")
    )
