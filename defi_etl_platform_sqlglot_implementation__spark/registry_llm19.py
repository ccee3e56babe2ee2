"""Coverage wave 19 — pruning and example-construction stages:
prototypicality-ranked cluster pruning, a deterministic span-corruption
masking plan, and document prefix containment.

- ``cluster_prototype_pruning``: the data-pruning decision the SemDeDup
  / SSL-prototypes line of work makes AFTER clustering — inside every
  trained k-means cluster, vectors are ranked by centrality (the
  micro-quantized cosine distance to their own centroid — exactly the
  ``cluster_distance_outliers`` device, so the two gates can never
  disagree on distances) and the most-central ceil(half) are kept.
  The keep predicate is the pure-integer 2·rank <= n_c + 1; ranks
  tie-break on vec_id.  Output: one verdict row per vector.

- ``span_corruption_plan``: deterministic T5-style masking plan — a
  token position p of doc d is masked iff the first hex digit of
  md5('mask:' || d || ':' || p) is in ('0','1') (an exact 1/8
  Bernoulli, the llm6 hex-threshold device), and adjacent masked
  positions merge into corruption spans via gaps-and-islands.  Per
  doc: token count, masked count, span count, longest span, and the
  masked share in basis points — the plan a span-corruption objective
  (T5/UL2) materializes before batching, with zero-token docs keeping
  their row (NULL rate) per the one-row-per-doc contract.

- ``doc_prefix_containment``: token-level prefix containment between
  documents (doc A's full token sequence == doc B's first |A| tokens,
  |A| < |B|) — the containment case MinHash underprices (Jaccard
  |A|/|B| can sit under any threshold while A is still fully
  redundant).  Blocked on the md5 of the first 4 tokens — pigeonhole-
  complete for the declared domain (docs with >= 4 tokens): a proper
  prefix pair always shares its first 4 tokens, hence its block.
  Verification compares the space-joined token strings (split on ' '
  makes the join injective).

Scale shapes: pruning is the broadcast argmax assign + one per-cluster
window (partitioned, never global); the masking plan is row-local
position explode + an islands window partitioned by doc; containment
is one hash equi-join on the 4-token block key with a post-join
string-prefix verify — never all-pairs.

Reference scope: composes the reference's aggregation surface
(src/transform/etl_pipeline.py groupbys) with the LLM-pipeline
extension; no counterpart file exists — cited per SURVEY §6 as a scale
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, t

_MASK_HEX = ("0", "1")   # 2/16 of the hex alphabet -> exact 1/8 mask rate


# =========================================================================
# prototypicality-ranked cluster pruning — keep the central half
# =========================================================================

def _prototype_sql() -> str:
    from .registry_llm3 import _KM_ITERS, _km_ctes, _vchain

    cos = (f"({_vchain('e.embedding', 'c.ce')})"
           f" / (sqrt({_vchain('e.embedding', 'e.embedding')})"
           f" * sqrt({_vchain('c.ce', 'c.ce')}))")
    return f"""
    WITH {_km_ctes()},
    ad AS (
        SELECT vec_id, cid,
               CAST(round((1 - cs) * 1000000) AS BIGINT) AS dist_micro
        FROM (
            SELECT e.vec_id, c.cid, {cos} AS cs,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {cos} DESC, c.cid) AS rn
            FROM embeddings e, tc{_KM_ITERS} c
        ) WHERE rn = 1
    ),
    rk AS (
        SELECT vec_id, cid, dist_micro,
               ROW_NUMBER() OVER (PARTITION BY cid
                                  ORDER BY dist_micro, vec_id) AS rank
        FROM ad
    ),
    cl AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_c FROM ad GROUP BY 1)
    SELECT rk.vec_id, CAST(rk.cid AS BIGINT) AS cluster_id, rk.dist_micro,
           CAST(rk.rank AS BIGINT) AS rank,
           CAST(CASE WHEN 2 * rk.rank <= cl.n_c + 1 THEN 1 ELSE 0 END
                AS INT) AS keep
    FROM rk JOIN cl USING (cid)
    """


@register("cluster_prototype_pruning", _prototype_sql())
def cluster_prototype_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototypicality pruning over the TRAINED micro-k-means: per
    cluster, rank vectors by their micro-quantized cosine distance to
    the centroid (distance ASC, vec_id tie-break) and keep the central
    ceil(n_c/2) — the integer predicate 2·rank <= n_c + 1, so no float
    threshold crosses engines.  Distances are bit-identical to
    cluster_distance_outliers (same assign + quantize device); the
    oracle replays the k-means training as unrolled CTEs (the
    kmeans_micro contract).

    Scale: broadcast argmax assignment (k x dim codebook in the Arrow
    UDF closure), one per-cluster window (partitioned by cluster_id —
    never a global sort), one k-row size aggregate joined back."""
    from .operators.materialize import scoped_persist
    from .operators.similarity import assign_clusters, kmeans_micro
    from .registry_llm3 import _KM_ITERS, _KM_K

    e = t(spark, sf_dir, "embeddings")
    cents = kmeans_micro(e, k=_KM_K, iters=_KM_ITERS)
    a = assign_clusters(
        e, cents.select(F.col("centroid_id").alias("vec_id"), "embedding"),
        keep_sim=True)
    # assignment feeds the window AND the size aggregate — evaluate the
    # k x dim argmax once (the cluster_distance_outliers precedent)
    d = scoped_persist(a.select(
        "vec_id", "cluster_id",
        F.round((F.lit(1.0) - F.col("csim")) * 1e6).cast("long")
        .alias("dist_micro")))
    w = Window.partitionBy("cluster_id").orderBy(F.asc("dist_micro"),
                                                 F.asc("vec_id"))
    rk = d.withColumn("rank", F.row_number().over(w).cast("long"))
    cl = d.groupBy("cluster_id").agg(F.count("*").cast("long").alias("n_c"))
    return rk.join(cl, "cluster_id").select(
        "vec_id", F.col("cluster_id").cast("long").alias("cluster_id"),
        "dist_micro", "rank",
        F.when(2 * F.col("rank") <= F.col("n_c") + 1, 1).otherwise(0)
        .cast("int").alias("keep"),
    )


# =========================================================================
# span-corruption masking plan — deterministic 1/8 Bernoulli + islands
# =========================================================================

_SPAN_SQL = f"""
    WITH tk AS (
        SELECT doc_id,
               len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_tokens
        FROM documents
    ),
    pos AS (
        SELECT doc_id, n_tokens, unnest(range(1, n_tokens + 1)) AS p
        FROM tk WHERE n_tokens >= 1
    ),
    mk AS (
        SELECT doc_id, n_tokens, p
        FROM pos
        WHERE substr(md5('mask:' || CAST(doc_id AS VARCHAR) || ':'
                         || CAST(p AS VARCHAR)), 1, 1)
              IN ({", ".join(f"'{h}'" for h in _MASK_HEX)})
    ),
    isl AS (
        SELECT doc_id, n_tokens, p,
               p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p)
                   AS grp
        FROM mk
    ),
    spans AS (
        SELECT doc_id, n_tokens, grp, CAST(COUNT(*) AS BIGINT) AS span_len
        FROM isl GROUP BY 1, 2, 3
    ),
    agg AS (
        SELECT doc_id, n_tokens,
               CAST(SUM(span_len) AS BIGINT) AS n_masked,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(MAX(span_len) AS BIGINT) AS longest_span
        FROM spans GROUP BY 1, 2
    )
    SELECT tk.doc_id, CAST(tk.n_tokens AS BIGINT) AS n_tokens,
           COALESCE(a.n_masked, 0) AS n_masked,
           COALESCE(a.n_spans, 0) AS n_spans,
           COALESCE(a.longest_span, 0) AS longest_span,
           CASE WHEN tk.n_tokens > 0
                THEN CAST(round(1e4 * COALESCE(a.n_masked, 0) / tk.n_tokens)
                          AS BIGINT)
                ELSE NULL END AS masked_bp
    FROM tk LEFT JOIN agg a USING (doc_id)
"""


@register("span_corruption_plan", _SPAN_SQL)
def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic span-corruption masking plan — see module
    docstring.  Spark's ``sequence(1, 0)`` DESCENDS instead of being
    empty, so zero-token docs are filtered before the position explode
    and re-attached by the final LEFT join (the one-row-per-doc
    contract, NULL rate for empty docs)."""
    docs = t(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id",
        F.expr("size(filter(split(text, ' '), x -> x != ''))")
        .cast("long").alias("n_tokens"))
    pos = (tk.filter(F.col("n_tokens") >= 1)
           .select("doc_id", "n_tokens",
                   F.explode(F.sequence(F.lit(1), F.col("n_tokens")))
                   .alias("p")))
    mk = pos.filter(
        F.substring(F.md5(F.concat(
            F.lit("mask:"), F.col("doc_id").cast("string"),
            F.lit(":"), F.col("p").cast("string"))), 1, 1)
        .isin(*_MASK_HEX))
    w = Window.partitionBy("doc_id").orderBy("p")
    spans = (mk.withColumn("grp", F.col("p") - F.row_number().over(w))
             .groupBy("doc_id", "n_tokens", "grp")
             .agg(F.count("*").cast("long").alias("span_len")))
    agg = spans.groupBy("doc_id").agg(
        F.sum("span_len").cast("long").alias("n_masked"),
        F.count("*").cast("long").alias("n_spans"),
        F.max("span_len").cast("long").alias("longest_span"))
    return tk.join(agg, "doc_id", "left").select(
        "doc_id", "n_tokens",
        F.coalesce("n_masked", F.lit(0)).cast("long").alias("n_masked"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("longest_span", F.lit(0)).cast("long")
        .alias("longest_span"),
        F.when(F.col("n_tokens") > 0,
               F.round(F.lit(1e4) * F.coalesce("n_masked", F.lit(0))
                       / F.col("n_tokens")).cast("long"))
        .alias("masked_bp"),
    )


# =========================================================================
# document prefix containment — blocked on the first-4-token hash
# =========================================================================

_PREFIX_SQL = """
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ),
    dk AS (
        SELECT doc_id, toks, len(toks) AS n,
               md5(array_to_string(toks[1:4], ' ')) AS k
        FROM d WHERE len(toks) >= 4
    )
    SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
           CAST(a.n AS BIGINT) AS n_contained,
           CAST(b.n AS BIGINT) AS n_container,
           CAST(round(1e4 * a.n / b.n) AS BIGINT) AS coverage_bp
    FROM dk a JOIN dk b ON a.k = b.k AND a.n < b.n
    WHERE array_to_string(a.toks, ' ') = array_to_string(b.toks[1:a.n], ' ')
"""


@register("doc_prefix_containment", _PREFIX_SQL)
def doc_prefix_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level prefix containment (A == B's first |A| tokens,
    |A| < |B|) over docs with >= 4 tokens — blocked on the md5 of the
    first 4 tokens (pigeonhole-complete for the domain), verified by
    comparing space-joined token strings.  The containment family
    member Jaccard-thresholded dedup underprices: a short doc fully
    embedded at the head of a long one.

    Scale: one hash equi-join on the block key; the verify is a
    row-local string compare on the joined candidates — never
    all-pairs."""
    docs = t(spark, sf_dir, "documents")
    dk = (docs.select(
            "doc_id",
            F.expr("filter(split(text, ' '), x -> x != '')").alias("toks"))
          .withColumn("n", F.size("toks"))
          .filter(F.col("n") >= 4)
          .withColumn("k", F.md5(F.concat_ws(" ", F.slice("toks", 1, 4)))))
    a = dk.select(F.col("doc_id").alias("contained_id"),
                  F.col("toks").alias("ta"), F.col("n").alias("na"), "k")
    b = dk.select(F.col("doc_id").alias("container_id"),
                  F.col("toks").alias("tb"), F.col("n").alias("nb"), "k")
    return (
        a.join(b, "k")
        .filter(F.col("na") < F.col("nb"))
        .filter(F.concat_ws(" ", F.col("ta"))
                == F.expr("concat_ws(' ', slice(tb, 1, na))"))
        .select(
            "contained_id", "container_id",
            F.col("na").cast("long").alias("n_contained"),
            F.col("nb").cast("long").alias("n_container"),
            F.round(F.lit(1e4) * F.col("na") / F.col("nb")).cast("long")
            .alias("coverage_bp"),
        )
    )
