"""LLM-pipeline coverage wave 4 (round 4).

Two curation operators that complete existing families end-to-end:

- :func:`dedup_keep_canonical` — the ACTIONABLE end of the dedup chain:
  near-dup clusters (LSH pairs -> connected components, the
  dedup_clusters machinery) resolved into a per-document keep/drop
  decision — keep the longest doc per cluster, singletons keep
  themselves.  This is the step a training-data pipeline actually
  executes; pair lists and cluster ids are intermediates.
- :func:`doc_bigram_logprob` — bigram language-model scoring (the classic
  perplexity-proxy quality filter, one modeling step beyond
  doc_unigram_surprise): per-doc sum of ln p(b|a) over adjacent token
  pairs, micro-nat quantized so the integer sums are hash-exact and
  order-free cross-engine (raw double ln sums are neither).

Both registered past the driver's 50-slot verification window this round
(the window is exactly full with unproven entries — see NOTES_r4);
locally oracle-exact at sf0.001 and sf0.01, to be promoted next round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm import _CC_REACH_CTE, _SHINGLES_CTE

# =========================================================================
# Keep-canonical: dedup clusters -> per-doc keep/drop decision
# =========================================================================

_KEEP_CANONICAL_SQL = f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_CC_REACH_CTE},
    cc AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
           FROM reach GROUP BY src),
    lab AS (
        SELECT d.doc_id,
               COALESCE(cc.cluster_id, d.doc_id) AS cluster_id,
               length(d.text) AS n_chars
        FROM documents d LEFT JOIN cc USING (doc_id)
    )
    SELECT doc_id,
           CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(CASE WHEN ROW_NUMBER() OVER (
                    PARTITION BY cluster_id
                    ORDER BY n_chars DESC, doc_id) = 1
                THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM lab
"""


@register("dedup_keep_canonical", _KEEP_CANONICAL_SQL)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve near-dup clusters into the keep/drop decision a curation
    pipeline executes: within each connected component of the
    LSH-verified pair graph keep the LONGEST document (doc_id
    tie-break); documents in no pair are their own singleton cluster and
    keep themselves.  Spark runs min-label propagation over the banded
    LSH pairs (one bounded shuffle per round) then a per-cluster
    row_number argmax — cluster cardinality bounds the window partition,
    so the decision step is one shuffle on cluster_id at any corpus
    size.  The oracle proves the whole chain (shingle -> pair ->
    transitive closure -> argmax) against a declarative recursive-CTE
    fixpoint."""
    from .operators.dedup import connected_components, minhash_lsh_pairs

    docs = t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5).select("d1", "d2")
    cc = connected_components(pairs).withColumnRenamed("node", "doc_id")
    lab = (
        docs.select("doc_id", F.length("text").alias("n_chars"))
        .join(cc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
            "n_chars",
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return lab.select(
        "doc_id",
        "cluster_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        (F.row_number().over(w) == 1).cast("long").alias("keep"),
    )


# =========================================================================
# Bigram LM log-probability — perplexity-proxy quality score
# =========================================================================

_BIGRAM_SQL = """
    WITH toked AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    pos AS (
        SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        FROM toked WHERE len(toks) >= 2
    ),
    bg AS (SELECT doc_id, toks[i] AS a, toks[i + 1] AS b FROM pos),
    cab AS (SELECT a, b, COUNT(*) AS n_ab FROM bg GROUP BY 1, 2),
    ca  AS (SELECT a, COUNT(*) AS n_a FROM bg GROUP BY 1)
    SELECT bg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CAST(round(
               ln(CAST(cab.n_ab AS DOUBLE) / ca.n_a) * 1e6) AS BIGINT))
               AS BIGINT) AS logprob_micro
    FROM bg JOIN cab USING (a, b) JOIN ca USING (a)
    GROUP BY bg.doc_id
"""


@register("doc_bigram_logprob", _BIGRAM_SQL)
def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram LM score per document: Σ ln p(b|a) over
    adjacent token pairs with p(b|a) = count(a,b)/count(a,·) — the
    perplexity-proxy quality filter one modeling step beyond unigram
    surprise (boilerplate scores high/near-zero, incoherent token soup
    scores very negative).  Per-occurrence log-probs are quantized to
    micro-nats (the tfidf/unigram device) so the per-doc totals are
    order-free integer sums, hash-exact at any parallelism.  Shape: one
    bigram explode, two count aggregates (map-side combinable), two
    equi-joins back — the bigram count table is the only corpus-wide
    state, Zipf-bounded far below the corpus itself."""
    docs = t(spark, sf_dir, "documents")
    # guard: sequence(1, 0) is DESCENDING in Spark — a 1-token doc would
    # index past the array; the SQL twin's len(toks) >= 2 is this filter
    bg = docs.filter(F.size(F.split("text", " ")) >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(text, ' ')) - 1),"
                " i -> struct(element_at(split(text, ' '), i) AS a,"
                "             element_at(split(text, ' '), i + 1) AS b))"
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    cab = bg.groupBy("a", "b").agg(F.count("*").alias("n_ab"))
    ca = bg.groupBy("a").agg(F.count("*").alias("n_a"))
    lp_micro = F.round(
        F.log(F.col("n_ab").cast("double") / F.col("n_a")) * 1e6
    ).cast("long")
    return (
        bg.join(cab, ["a", "b"]).join(ca, "a")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(lp_micro).cast("long").alias("logprob_micro"),
        )
    )
