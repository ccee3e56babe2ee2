"""Coverage wave 41 (round 9) — the Bloom false-positive pricing curve
and the principal-direction projection report.

- ``bloom_fpr_curve``: the bits-per-filter dial of the two-phase
  contamination pipeline, PRICED — contamination_bloom_gated proves
  the Bloom prefilter exact-after-verify at one size; this gate prices
  the knob itself: per num_bits ∈ {4096, 16384, 65536}, how many
  corpus docs the bit-position prefilter flags as candidates, how many
  are TRUE (exact 4-gram overlap — the ``contamination_overlap``
  inventory), and the document-level false-positive rate in bp (the
  work wasted on the verify stage).  The position family here is the
  engine-neutral md5 12-hex integer mod num_bits (the production path
  uses xxhash64, which no oracle can replay — the
  minhash_estimate_error precedent: the gate pins the ALGEBRA with a
  replayable family); candidate supersets nest downward (fewer bits ->
  more collisions -> more candidates) and every true doc is a
  candidate at every size (no false negatives) — both pinned.

- ``embedding_projection_outliers``: the APPLICATION of the wave-38
  power-iteration direction — every vector's exact integer projection
  onto v3 (Σ q_d·v3_d over milli coordinates, BIGINT — the direction a
  whitening/outlier pass would deflate), reported as the top 20 |proj|
  vectors with their labels (|proj| DESC, vec_id tie-break).  Closes
  the loop from computing a direction to USING it.

Scale shapes: the FPR curve reuses the one shingle scan (positions are
row-local arithmetic; the bench-bit sets are broadcast-sized by
construction); the projection is one 64-row broadcast against the
vector scan + a TakeOrdered top-20.

Reference scope: composes the reference's aggregation surface
(src/transform/etl_pipeline.py groupbys) with the LLM-pipeline
extension; no counterpart file exists — cited per SURVEY §6 as a scale
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm34 import _hex12_to_int
from .registry_llm37 import _top_component_sql

_BLOOM_BITS = (4096, 16384, 65536)


# =========================================================================
# bloom_fpr_curve — document-level false positives per filter size
# =========================================================================

def _bloom_sql() -> str:
    pos12 = _hex12_to_int("md5(s)")
    per_bits = "\n        UNION ALL\n        ".join(
        f"""SELECT {nb} AS num_bits, c.doc_id
        FROM corpus c
        WHERE ({pos12.replace('md5(s)', 'md5(c.s)')}) % {nb} IN
              (SELECT ({pos12.replace('md5(s)', 'md5(b.s)')}) % {nb}
               FROM bench b)"""
        for nb in _BLOOM_BITS
    )
    return f"""
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
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
    corpus AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
    truth AS (
        SELECT DISTINCT c.doc_id FROM corpus c JOIN bench b USING (s)
    ),
    nc AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_corpus
           FROM corpus),
    cand AS (
        SELECT DISTINCT num_bits, doc_id FROM (
        {per_bits}
        )
    )
    SELECT CAST(cand.num_bits AS BIGINT) AS num_bits,
           nc.n_corpus,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN t.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_true,
           CAST(COUNT(*)
                - SUM(CASE WHEN t.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos,
           CAST(round(1e4 * (COUNT(*)
                - SUM(CASE WHEN t.doc_id IS NOT NULL THEN 1 ELSE 0 END))
                / (nc.n_corpus
                   - (SELECT COUNT(*) FROM truth))) AS BIGINT)
               AS fpr_bp
    FROM cand
    LEFT JOIN truth t USING (doc_id)
    CROSS JOIN nc
    GROUP BY 1, 2
"""


@register("bloom_fpr_curve", _bloom_sql())
def bloom_fpr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom prefilter FPR per filter size — see module docstring.
    One shingle scan; per size, candidates = corpus docs with >= 1
    shingle whose md5-position collides with a benchmark position
    (broadcast bit-set semi-join, the contamination_bloom_prefilter
    shape with the replayable md5 family); fpr_bp is over the
    non-contaminated population (false positives / true negatives)."""
    from .registry_llm2 import _with_4gram_shingles

    docs = t(spark, sf_dir, "documents")
    sh = _with_4gram_shingles(docs.select("doc_id", "text")).select(
        "doc_id", F.explode("shingles").alias("s"))
    pos = F.conv(F.substring(F.md5("s"), 1, 12), 16, 10).cast("long")
    bench = sh.filter(F.col("doc_id") % 97 == 0)
    corpus = sh.filter(F.col("doc_id") % 97 != 0).withColumn("pos", pos)
    truth = (corpus.join(bench.select("s").distinct(), "s", "left_semi")
             .select("doc_id").distinct().withColumn("_true", F.lit(1)))
    from .operators.materialize import scoped_persist

    corpus = scoped_persist(corpus)
    truth = scoped_persist(truth)
    n_corpus = corpus.select("doc_id").distinct().count()
    n_true = truth.count()
    parts = []
    for nb in _BLOOM_BITS:
        bits = (bench.select((pos % nb).alias("bit_pos")).distinct())
        cand = (corpus.select("doc_id", (F.col("pos") % nb).alias("bit_pos"))
                .join(F.broadcast(bits), "bit_pos", "left_semi")
                .select("doc_id").distinct())
        parts.append(
            cand.join(truth, "doc_id", "left")
            .agg(F.lit(nb).cast("long").alias("num_bits"),
                 F.lit(n_corpus).cast("long").alias("n_corpus"),
                 F.count("*").cast("long").alias("n_candidates"),
                 F.sum(F.coalesce("_true", F.lit(0))).cast("long")
                 .alias("n_true"),
                 (F.count("*") - F.sum(F.coalesce("_true", F.lit(0))))
                 .cast("long").alias("n_false_pos"),
                 F.round(F.lit(1e4)
                         * (F.count("*")
                            - F.sum(F.coalesce("_true", F.lit(0))))
                         / F.lit(float(n_corpus - n_true))).cast("long")
                 .alias("fpr_bp")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# =========================================================================
# embedding_projection_outliers — apply the power-iteration direction
# =========================================================================

def _projection_sql() -> str:
    # reuse the ENTIRE power-iteration chain, then project every vector
    pi = _top_component_sql()
    # strip the trailing SELECT (keep the WITH ... v3 chain)
    chain = pi[:pi.rindex("SELECT CAST(v1.i AS BIGINT)")].rstrip()
    return f"""{chain},
    proj AS (
        SELECT el.vec_id,
               CAST(SUM(el.q * CAST(v3.v AS BIGINT)) AS BIGINT) AS proj
        FROM el JOIN v3 ON v3.i = el.dim
        GROUP BY 1
    ),
    lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label
            FROM embeddings)
    SELECT p.vec_id, lab.label, p.proj AS proj_milli_v,
           CAST(abs(p.proj) AS BIGINT) AS abs_proj
    FROM proj p JOIN lab USING (vec_id)
    ORDER BY abs(p.proj) DESC, p.vec_id
    LIMIT 20
"""


@register("embedding_projection_outliers", _projection_sql())
def embedding_projection_outliers(spark: SparkSession, sf_dir: str
                                  ) -> DataFrame:
    """Top-20 |projection| vectors along the wave-38 direction — see
    module docstring.  v3 comes from covariance_power_iteration's own
    construction (byte-shared; cross-gate agreement pinned), broadcast
    as a 64-row frame; the projection is an exact BIGINT dot of milli
    coordinates with the ±1000 direction; the top-20 is a TakeOrdered
    (|proj| DESC, vec_id)."""
    from .registry_llm37 import covariance_power_iteration

    e = t(spark, sf_dir, "embeddings")
    # the real-data direction = the 'corpus' population (the r10
    # _PERTURB rows carry the planted direction, not the corpus one)
    v3 = (covariance_power_iteration(spark, sf_dir)
          .filter(F.col("population") == "corpus")
          .select(F.col("dim"), F.col("v3")))
    el = e.select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    ).select("vec_id", "dim",
             F.round(F.col("x").cast("double") * 1e3).cast("long")
             .alias("q"))
    proj = (el.join(F.broadcast(v3), "dim")
            .groupBy("vec_id")
            .agg(F.sum(F.col("q") * F.col("v3")).cast("long")
                 .alias("proj")))
    lab = e.select("vec_id", F.col("label").cast("long").alias("label"))
    return (
        proj.join(lab, "vec_id")
        .select("vec_id", "label",
                F.col("proj").alias("proj_milli_v"),
                F.abs("proj").cast("long").alias("abs_proj"))
        .orderBy(F.desc("abs_proj"), F.asc("vec_id"))
        .limit(20)
    )
