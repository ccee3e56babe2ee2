"""Coverage wave 42 (round 10) — the suffix-array-style maximal-repeat
inventory and the span-clipping dividend (VERDICT r9 #7a: exact
substring dedup depth beyond per-doc span coverage).

- ``maximal_repeat_inventory``: the output a suffix array gives that
  the per-doc span gates don't — repeat CLASSES.  The existing chain
  (``substring_dup_spans``) merges duplicated 8-gram windows into
  maximal spans per doc; this gate extracts each span's actual token
  content and groups spans BY CONTENT (md5 of the token run): one row
  per distinct maximal duplicated substring with its exact token
  length, how many docs carry it and how often (multiplicity — the
  suffix-array LCP-interval statistics), plus the minimum carrier
  doc_id as the attribution anchor.  ``shared = 1`` marks classes
  whose full maximal extent occurs verbatim in >= 2 docs; ``shared =
  0`` rows are the RAGGED cases — a doc whose island merged adjacent
  copies from different partners into an extent no other doc carries
  in full (exactly the distinction a true suffix array draws and
  window-coverage alone cannot).  This is the
  trained-on-duplicated-substrings audit: the long shared classes are
  the passages an LM would memorize (Lee et al. 2022).

- ``span_dedup_token_savings``: the PER-SOURCE economics of span
  clipping — the strategy ``dedup_token_savings`` (registry_llm32)
  does not price.  Every token position covered by a cross-document
  duplicated 8-gram window (the ``curation_clip_spans`` coverage
  device, byte-shared) is a removed token; per source: docs affected,
  tokens before/removed, savings bp.  Token counts use len(l) over
  the UNFILTERED whitespace split — the position space the span
  machinery operates in — so removed <= total positionally by
  construction (cross-gate conservation vs curation_clip_spans pinned
  in tests/test_llm41.py).

Scale shapes: both gates ride the one duplicated-shingle shuffle the
span family already pays (same cost class as MinHash); the repeat
inventory adds one per-doc window (island merge), a row-local slice,
and a hash aggregate keyed on the span md5 — repeat classes, not the
corpus, size the reduce side; the savings gate is coverage explode
(8 rows per hit) + two hash aggregates (doc, then source).

Reference scope: composes the reference's aggregation surface
(src/transform/etl_pipeline.py groupbys) with the LLM-pipeline
extension; no counterpart file exists — cited per SURVEY §6 as a scale
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm3 import _DUP_SHINGLE_CTES, _dup_shingle_frames


# =========================================================================
# maximal_repeat_inventory — suffix-array-style repeat classes
# =========================================================================

_REPEAT_SQL = f"""
    WITH {_DUP_SHINGLE_CTES},
    isl AS (
        SELECT doc_id, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS grp
        FROM hits
    ),
    spans AS (
        SELECT doc_id,
               MIN(pos) AS s,
               MAX(pos) + 7 AS e
        FROM isl GROUP BY doc_id, grp
    ),
    runs AS (
        SELECT sp.doc_id,
               CAST(sp.e - sp.s + 1 AS BIGINT) AS span_tokens,
               md5(array_to_string(tk.l[sp.s:sp.e], ' ')) AS span_md5
        FROM spans sp JOIN toks tk ON tk.doc_id = sp.doc_id
    )
    SELECT span_md5,
           CAST(MAX(span_tokens) AS BIGINT) AS span_tokens,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(CASE WHEN COUNT(DISTINCT doc_id) > 1 THEN 1 ELSE 0 END
                AS BIGINT) AS shared
    FROM runs GROUP BY span_md5
"""


@register("maximal_repeat_inventory", _REPEAT_SQL)
def maximal_repeat_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat classes of maximal duplicated token runs — see module
    docstring.  Byte-shares the duplicated-shingle chain and the
    gaps-and-islands merge with ``substring_dup_spans``
    (registry_llm3._dup_shingle_frames), then one row-local slice
    rebuilds each span's content and one hash aggregate on the span
    md5 forms the classes.  span_tokens is constant within a class
    (identical content — MAX is the oracle-stable way to say so)."""
    toks, hits = _dup_shingle_frames(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        hits.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(F.min("pos").alias("s"), (F.max("pos") + 7).alias("e"))
    )
    runs = (
        spans.join(toks.select("doc_id", "l"), "doc_id")
        .select(
            "doc_id",
            (F.col("e") - F.col("s") + 1).cast("long").alias("span_tokens"),
            F.md5(F.concat_ws(
                " ", F.expr("slice(l, s, e - s + 1)"))).alias("span_md5"),
        )
    )
    return (
        runs.groupBy("span_md5")
        .agg(F.max("span_tokens").cast("long").alias("span_tokens"),
             F.countDistinct("doc_id").cast("long").alias("n_docs"),
             F.count("*").cast("long").alias("n_occurrences"),
             F.min("doc_id").cast("long").alias("min_doc_id"),
             F.when(F.countDistinct("doc_id") > 1, 1).otherwise(0)
             .cast("long").alias("shared"))
    )


# =========================================================================
# span_dedup_token_savings — the per-source span-clipping dividend
# =========================================================================

_SPAN_SAVINGS_SQL = f"""
    WITH {_DUP_SHINGLE_CTES},
    covered AS (
        SELECT DISTINCT doc_id, pos + o AS pos
        FROM hits, LATERAL unnest(range(0, 8)) AS u(o)
    ),
    rem AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_removed
        FROM covered GROUP BY doc_id
    ),
    base AS (
        SELECT d.source, d.doc_id,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
               COALESCE(r.n_removed, 0) AS n_removed
        FROM documents d LEFT JOIN rem r USING (doc_id)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_removed > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_affected,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
           CAST(SUM(n_removed) AS BIGINT) AS tokens_removed,
           CAST(round(1e4 * SUM(n_removed) / SUM(n_tok)) AS BIGINT)
               AS savings_bp
    FROM base GROUP BY source
"""


@register("span_dedup_token_savings", _SPAN_SAVINGS_SQL)
def span_dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source span-clipping dividend — see module docstring.  The
    coverage expansion byte-shares ``curation_clip_spans``'s device
    (8-row explode on hits only), reduced per doc then per source; a
    left join keeps unaffected sources in the table at 0 bp."""
    _, hits = _dup_shingle_frames(spark, sf_dir)
    covered = (
        hits.select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + 7))
            .alias("pos"))
        .distinct()
    )
    rem = covered.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_removed"))
    docs = t(spark, sf_dir, "documents")
    base = (
        docs.select("source", "doc_id",
                    F.size(F.split("text", " ")).cast("long")
                    .alias("n_tok"))
        .join(rem, "doc_id", "left")
        .withColumn("n_removed", F.coalesce("n_removed", F.lit(0)))
    )
    return (
        base.groupBy("source")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.sum(F.when(F.col("n_removed") > 0, 1).otherwise(0))
             .cast("long").alias("docs_affected"),
             F.sum("n_tok").cast("long").alias("tokens_total"),
             F.sum("n_removed").cast("long").alias("tokens_removed"),
             F.round(F.lit(1e4) * F.sum("n_removed") / F.sum("n_tok"))
             .cast("long").alias("savings_bp"))
    )
