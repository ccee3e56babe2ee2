"""Coverage wave 13 — winnowing fingerprints (Schleimer/Wilkerson/Aiken).

``winnowing_fingerprints`` is the LOCAL fingerprint-selection scheme
(MOSS) next to the repo's global ones (full-doc normalization hash,
MinHash signatures, SimHash): hash every word k-gram, slide a window of
``w`` consecutive hashes, and select the minimum of each window
(rightmost position on ties). The selection guarantee — any shared run
of at least w+k−1 tokens between two documents yields at least one
SHARED selected fingerprint — is what makes winnowed sets a sound
candidate index for plagiarism/near-dup detection at a fraction of the
full k-gram set's size (expected density 2/(w+1)).

Devices reused: word 4-grams via the llm2 ``slice``-based construction
(O(words) per doc, the documented anti-O(words²) shape), fixed-width
lowercase md5-prefix hashes compared lexicographically (the llm6
min-hex device), and the all-docs-output discipline (short docs carry a
neutral zero row).

Scale: positions explode linearly; each position replicates into at
most ``w`` covering windows (bounded ×4 fan-out, expression-level
``sequence`` — never a positions×windows join); window argmin is one
(doc, window)-keyed hash aggregate of a NUMERIC min — the selection
key packs the 60-bit hash and the complemented position into one
decimal(38,0)/HUGEINT, because Spark's HashAggregate requires
fixed-size mutable aggregation buffers: min over a STRING or STRUCT
falls back to SortAggregate (measured — 6 SortAggregates), min over a
16-byte decimal stays hash + map-side partials. No
window functions over corpus-sized partitions, nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, t

_K = 4    # tokens per gram
_W = 4    # window: consecutive gram positions per selection


@register(
    "winnowing_fingerprints",
    f"""
    WITH toked AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    base AS (
        SELECT doc_id,
               len(toks) - {_K - 1} AS n_pos,
               greatest(1, len(toks) - {_K - 1} - {_W - 1}) AS n_win,
               toks
        FROM toked WHERE len(toks) >= {_K}
    ),
    pos AS (
        SELECT doc_id, n_pos, n_win,
               unnest(range(1, n_pos + 1)) AS p
        FROM base
    ),
    hashed AS (
        SELECT pos.doc_id, pos.n_win, pos.p,
               substr(md5(array_to_string(
                   b.toks[pos.p:pos.p + {_K - 1}], ' ')), 1, 15) AS h
        FROM pos JOIN base b USING (doc_id)
    ),
    cand AS (
        SELECT doc_id, p, h,
               unnest(range(greatest(1, p - {_W - 1}),
                            least(p, n_win) + 1)) AS j
        FROM hashed
    ),
    sel AS (
        SELECT doc_id, j,
               MIN(CAST(CAST(('0x' || h) AS BIGINT) AS HUGEINT)
                   * 4294967296 + (4294967295 - p)) AS sk
        FROM cand GROUP BY doc_id, j
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(COUNT(DISTINCT sk) AS BIGINT) AS n_fingerprints,
               printf('%015x', CAST(MIN(sk) // 4294967296 AS BIGINT))
                   AS min_fp
        FROM sel GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(CASE WHEN len(t.toks) >= {_K}
                     THEN len(t.toks) - {_K - 1} ELSE 0 END AS BIGINT)
               AS n_positions,
           CAST(CASE WHEN len(t.toks) >= {_K}
                     THEN greatest(1, len(t.toks) - {_K - 1} - {_W - 1})
                     ELSE 0 END AS BIGINT) AS n_windows,
           COALESCE(p.n_fingerprints, 0) AS n_fingerprints,
           p.min_fp AS min_fp
    FROM toked t
    LEFT JOIN per_doc p USING (doc_id)
    """,
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed fingerprint report per document — see module docstring.
    Selection: per window of {w} consecutive k-gram hashes, the minimum
    hash, RIGHTMOST position on ties (the canonical scheme); the
    reported set is the distinct selected positions. min_fp (the doc's
    smallest selected hash, a fixed-width hex string) is carried as a
    cross-engine VALUE column. Docs with fewer than {k} tokens emit the
    neutral zero row (all-docs-output discipline)."""
    docs = t(spark, sf_dir, "documents")
    toked = docs.select("doc_id", F.split("text", " ").alias("toks"))
    base = toked.filter(F.size("toks") >= _K).select(
        "doc_id",
        (F.size("toks") - (_K - 1)).alias("n_pos"),
        F.greatest(F.lit(1), F.size("toks") - (_K - 1) - (_W - 1))
         .alias("n_win"),
        "toks",
    )
    hashed = base.select(
        "doc_id", "n_win",
        F.explode(F.expr("sequence(1, n_pos)")).alias("p"),
        "toks",
    ).select(
        "doc_id", "n_win", "p",
        F.substring(
            F.md5(F.encode(
                F.expr(f"concat_ws(' ', slice(toks, p, {_K}))"), "UTF-8")),
            1, 15).alias("h"),
    )
    cand = hashed.select(
        "doc_id", "p", "h",
        F.explode(F.expr(
            f"sequence(greatest(1, p - {_W - 1}), least(p, n_win))"
        )).alias("j"),
    )
    # rightmost-tie argmin as a NUMERIC min: the key packs the 60-bit
    # hash (15 hex chars — fits a signed BIGINT) above the complemented
    # position, so min(key) picks the smallest hash and, among equal
    # hashes, the LARGEST position. Numeric because Spark's
    # HashAggregate needs fixed-size mutable buffers — min(string) and
    # min(struct) both fall back to SortAggregate, min(decimal(38,0))
    # is a 16-byte fixed buffer and stays hash with map-side partials.
    # Position determines the hash, so distinct selected keys ==
    # distinct selected positions.
    key = (
        F.conv(F.col("h"), 16, 10).cast("decimal(38,0)")
        * F.lit(4294967296)
        + (F.lit(4294967295) - F.col("p"))
    )
    sel = cand.groupBy("doc_id", "j").agg(F.min(key).alias("sk"))
    per_doc = sel.groupBy("doc_id").agg(
        F.countDistinct("sk").cast("long").alias("n_fingerprints"),
        F.format_string(
            "%015x",
            F.expr("CAST(min(sk) div 4294967296 AS BIGINT)"),
        ).alias("min_fp"),
    )
    return (
        toked.select(
            "doc_id",
            F.when(F.size("toks") >= _K, F.size("toks") - (_K - 1))
             .otherwise(F.lit(0)).cast("long").alias("n_positions"),
            F.when(F.size("toks") >= _K,
                   F.greatest(F.lit(1),
                              F.size("toks") - (_K - 1) - (_W - 1)))
             .otherwise(F.lit(0)).cast("long").alias("n_windows"),
        )
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id", "n_positions", "n_windows",
            F.coalesce("n_fingerprints", F.lit(0)).cast("long")
             .alias("n_fingerprints"),
            "min_fp",
        )
    )


winnowing_fingerprints.__doc__ = winnowing_fingerprints.__doc__.format(
    w=_W, k=_K)


# =========================================================================
# winnowing candidate pairs — the MOSS use-case realized
# =========================================================================

_FP_DF_CAP = 32    # drop fingerprints selected in more docs (stop-grams)
_MIN_SHARED = 2    # report pairs sharing at least this many fingerprints

_WINNOW_FPS_CTES = f"""toked AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    base AS (
        SELECT doc_id,
               len(toks) - {_K - 1} AS n_pos,
               greatest(1, len(toks) - {_K - 1} - {_W - 1}) AS n_win,
               toks
        FROM toked WHERE len(toks) >= {_K}
    ),
    pos AS (
        SELECT doc_id, n_pos, n_win,
               unnest(range(1, n_pos + 1)) AS p
        FROM base
    ),
    hashed AS (
        SELECT pos.doc_id, pos.n_win, pos.p,
               substr(md5(array_to_string(
                   b.toks[pos.p:pos.p + {_K - 1}], ' ')), 1, 15) AS h
        FROM pos JOIN base b USING (doc_id)
    ),
    cand AS (
        SELECT doc_id, p, h,
               unnest(range(greatest(1, p - {_W - 1}),
                            least(p, n_win) + 1)) AS j
        FROM hashed
    ),
    sel AS (
        SELECT doc_id, j,
               MIN(CAST(CAST(('0x' || h) AS BIGINT) AS HUGEINT)
                   * 4294967296 + (4294967295 - p)) AS sk
        FROM cand GROUP BY doc_id, j
    ),
    fps AS (
        SELECT DISTINCT doc_id,
               CAST(sk // 4294967296 AS BIGINT) AS fp
        FROM sel
    )"""


@register(
    "winnowing_candidate_pairs",
    f"""
    WITH {_WINNOW_FPS_CTES},
    rare AS (
        SELECT fp FROM fps GROUP BY fp
        HAVING COUNT(*) <= {_FP_DF_CAP}
    )
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM fps a
    JOIN rare USING (fp)
    JOIN fps b USING (fp)
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= {_MIN_SHARED}
    """,
)
def winnowing_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MOSS use-case realized: candidate near-dup pairs from a
    bucket-join on SHARED selected fingerprints. Each doc's winnowed
    set (distinct selected hash values from the wave-13 selection)
    joins on the fingerprint value; fingerprints selected in more than
    {cap} documents are dropped first (stop-gram control — a hot
    fingerprint would join quadratically, exactly the skew the dedup
    auto-cap guards; the cap is part of the gate's definition, replayed
    by the oracle), and pairs sharing fewer than {ms} fingerprints are
    filtered. By the winnowing guarantee, any pair sharing a token run
    of >= 2(w+k-1) tokens shares >= 2 fingerprints, so true near-dups
    survive the {ms}-shared floor. Scale: fingerprint sets are
    ~2/(w+1) of positions; the join is equi-keyed on fp with the df-cap
    bounding per-key fan-out at {cap}^2 — the LSH-band-join shape."""
    docs = t(spark, sf_dir, "documents")
    toked = docs.select("doc_id", F.split("text", " ").alias("toks"))
    base = toked.filter(F.size("toks") >= _K).select(
        "doc_id",
        (F.size("toks") - (_K - 1)).alias("n_pos"),
        F.greatest(F.lit(1), F.size("toks") - (_K - 1) - (_W - 1))
         .alias("n_win"),
        "toks",
    )
    hashed = base.select(
        "doc_id", "n_win",
        F.explode(F.expr("sequence(1, n_pos)")).alias("p"),
        "toks",
    ).select(
        "doc_id", "n_win", "p",
        F.substring(
            F.md5(F.encode(
                F.expr(f"concat_ws(' ', slice(toks, p, {_K}))"), "UTF-8")),
            1, 15).alias("h"),
    )
    cand = hashed.select(
        "doc_id", "p", "h",
        F.explode(F.expr(
            f"sequence(greatest(1, p - {_W - 1}), least(p, n_win))"
        )).alias("j"),
    )
    key = (
        F.conv(F.col("h"), 16, 10).cast("decimal(38,0)")
        * F.lit(4294967296)
        + (F.lit(4294967295) - F.col("p"))
    )
    sel = cand.groupBy("doc_id", "j").agg(F.min(key).alias("sk"))
    fps = sel.select(
        "doc_id",
        F.expr("CAST(sk div 4294967296 AS BIGINT)").alias("fp"),
    ).distinct()
    rare = fps.groupBy("fp").agg(F.count("*").alias("_df")) \
              .filter(F.col("_df") <= _FP_DF_CAP).select("fp")
    a = fps.join(rare, "fp").select("fp", F.col("doc_id").alias("d1"))
    b = fps.select("fp", F.col("doc_id").alias("d2"))
    return (
        a.join(b, "fp")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= _MIN_SHARED)
    )


winnowing_candidate_pairs.__doc__ = winnowing_candidate_pairs.__doc__.format(
    cap=_FP_DF_CAP, ms=_MIN_SHARED)
