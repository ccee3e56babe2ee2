"""Coverage wave 26 — dedup QA and safety analysis:
ingest-transitivity gap pricing and a per-source PII inventory with a
Luhn-validated card class.

- ``ingest_transitivity_gap``: what the non-transitive ingest path
  (``dedup_minhash_incremental`` — direct index matches only) misses
  relative to full connected-components clustering: a doc is
  CC-flagged when it is not its cluster's canonical minimum, and
  arrival-flagged when some EARLIER doc pairs with it directly; the
  gap is CC-flagged-but-not-arrival-flagged — exactly the docs whose
  only edges point at LATER arrivals yet who lose canonicality to a
  smaller id reached transitively.  One summary row: both flag counts,
  the gap count, and gap share in bp of CC-flagged.  On this corpus
  the near-dup components are cliques rooted at their minimum, so the
  gap is provably 0 — the cross-engine row pins that, and the unit
  test constructs a path graph where the gap is positive to prove the
  metric detects what it claims to.

- ``pii_inventory``: the per-source safety report a release review
  wants — the corpus is synthetic and PII-free, so (the pii_scrub
  convention) every row PLANTS a deterministic PII-bearing envelope
  from its own key: one email (+ a second for doc_id % 3 == 0), one
  555-phone, one 10.x.y.z IPv4, and one 16-digit card number whose
  Luhn check digit is made VALID for even doc_ids and corrupted (+1
  mod 10) for odd ones.  The inventory then re-detects everything with
  regexes (the Java/RE2-common subset) and re-validates cards with a
  full 16-digit unrolled Luhn sum — pure integer CASE terms, identical
  on both engines — so exactly the even-id cards must pass.  Output
  per source: doc count, email/phone/ipv4/card counts, Luhn-valid card
  count, and PII items per kilotoken in bp.

Scale: the gap gate adds two count-aggregates over the pair stream +
the CC labels; the inventory is row-local regex/arithmetic + one
per-source aggregate.

Reference scope: composes the reference's aggregation surface with the
LLM-pipeline extension; no counterpart file exists — cited per SURVEY
§6 as a scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm import _CC_REACH_CTE, _SHINGLES_CTE
from .registry_llm3 import _EMAIL_RE, _PHONE_RE

_IPV4_RE = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
_CARD_RE = "[0-9]{16}"


# =========================================================================
# ingest-transitivity gap — the cost of not re-clustering at ingest
# =========================================================================

_GAP_SQL = f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_CC_REACH_CTE},
    lbl AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
            FROM reach GROUP BY 1),
    ccf AS (SELECT doc_id FROM lbl WHERE cluster_id <> doc_id),
    arr AS (SELECT DISTINCT d2 AS doc_id FROM pairs)
    SELECT CAST((SELECT COUNT(*) FROM ccf) AS BIGINT) AS n_cc_flagged,
           CAST((SELECT COUNT(*) FROM arr) AS BIGINT) AS n_arrival_flagged,
           CAST((SELECT COUNT(*) FROM ccf
                 WHERE doc_id NOT IN (SELECT doc_id FROM arr)) AS BIGINT)
               AS n_gap,
           CASE WHEN (SELECT COUNT(*) FROM ccf) > 0
                THEN CAST(round(1e4 * (SELECT COUNT(*) FROM ccf
                                       WHERE doc_id NOT IN
                                           (SELECT doc_id FROM arr))
                                / (SELECT COUNT(*) FROM ccf)) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS gap_bp
"""


@register("ingest_transitivity_gap", _GAP_SQL)
def ingest_transitivity_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitivity-gap pricing — see module docstring.  Composes the
    exact operators its two sides already gate (``minhash_lsh_pairs``
    + ``connected_components`` vs the arrival reduction); the oracle
    walks the recursive closure (sf-scale only, the CC-oracle
    convention)."""
    from .operators.dedup import connected_components, minhash_lsh_pairs
    from .operators.materialize import scoped_persist

    docs = t(spark, sf_dir, "documents")
    pairs = scoped_persist(
        minhash_lsh_pairs(docs, threshold=0.5).select("d1", "d2"))
    cc = connected_components(pairs).withColumnRenamed("node", "doc_id")
    ccf = cc.filter(F.col("cluster_id") != F.col("doc_id")) \
        .select("doc_id")
    arr = pairs.select(F.col("d2").alias("doc_id")).distinct()
    n_cc = ccf.agg(F.count("*").cast("long").alias("n_cc_flagged"))
    n_ar = arr.agg(F.count("*").cast("long").alias("n_arrival_flagged"))
    n_gap = (ccf.join(arr, "doc_id", "left_anti")
             .agg(F.count("*").cast("long").alias("n_gap")))
    return (
        n_cc.crossJoin(F.broadcast(n_ar)).crossJoin(F.broadcast(n_gap))
        .select(
            "n_cc_flagged", "n_arrival_flagged", "n_gap",
            F.when(F.col("n_cc_flagged") > 0,
                   F.round(F.lit(1e4) * F.col("n_gap")
                           / F.col("n_cc_flagged")).cast("long"))
            .otherwise(F.lit(0).cast("long")).alias("gap_bp"))
    )


# =========================================================================
# per-source PII inventory with Luhn-validated cards
# =========================================================================

def _luhn_terms_sql(col: str, n_digits: int = 16) -> str:
    """Unrolled Luhn sum over a fixed-width digit string: position i
    (1-based from the LEFT) is doubled iff its position from the RIGHT
    (n_digits - i + 1) is even."""
    terms = []
    for i in range(1, n_digits + 1):
        d = f"CAST(substr({col}, {i}, 1) AS INT)"
        if (n_digits - i + 1) % 2 == 0:   # doubled
            terms.append(f"(CASE WHEN {d} >= 5 THEN 2 * {d} - 9 "
                         f"ELSE 2 * {d} END)")
        else:
            terms.append(d)
    return " + ".join(terms)


def _luhn_sum_col(col: str, n_digits: int = 16):
    total = None
    for i in range(1, n_digits + 1):
        d = F.substring(F.col(col), i, 1).cast("int")
        if (n_digits - i + 1) % 2 == 0:
            term = F.when(d >= 5, 2 * d - 9).otherwise(2 * d)
        else:
            term = d
        total = term if total is None else total + term
    return total


# the 15 payload digits; the check digit is appended valid (even ids)
# or corrupted +1 mod 10 (odd ids)
_CARD15_DUCK = ("'4' || lpad(CAST(doc_id % 10000000 AS VARCHAR), 7, '0')"
                " || lpad(CAST((doc_id * 7) % 10000000 AS VARCHAR), 7, '0')")

_PII_SQL = f"""
    WITH c15 AS (
        SELECT doc_id, source,
               len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_tokens,
               {_CARD15_DUCK} AS c15
        FROM documents
    ),
    card AS (
        SELECT doc_id, source, n_tokens,
               c15 || CAST(
                   CASE WHEN doc_id % 2 = 0
                        THEN (10 - ({_luhn_terms_sql("c15 || '0'", 16)}) % 10)
                             % 10
                        ELSE ((10 - ({_luhn_terms_sql("c15 || '0'", 16)})
                               % 10) % 10 + 1) % 10
                   END AS VARCHAR) AS card16
        FROM c15
    ),
    synth AS (
        SELECT doc_id, source, n_tokens,
               concat('contact user', CAST(doc_id AS VARCHAR),
                      '@example.com ',
                      CASE WHEN doc_id % 3 = 0
                           THEN concat('cc admin', CAST(doc_id AS VARCHAR),
                                       '@corp.net ') ELSE '' END,
                      'or call 555-',
                      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                      ' ip 10.', CAST(doc_id % 256 AS VARCHAR),
                      '.', CAST((doc_id * 3) % 256 AS VARCHAR),
                      '.', CAST((doc_id * 5) % 256 AS VARCHAR),
                      ' card ', card16) AS raw,
               card16
        FROM card
    ),
    per_doc AS (
        SELECT source, n_tokens,
               len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS e,
               len(regexp_extract_all(raw, '{_PHONE_RE}')) AS p,
               len(regexp_extract_all(raw, '{_IPV4_RE}')) AS ip,
               len(regexp_extract_all(raw, '{_CARD_RE}')) AS cd,
               CASE WHEN ({_luhn_terms_sql("card16", 16)}) % 10 = 0
                    THEN 1 ELSE 0 END AS lv
        FROM synth
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(e) AS BIGINT) AS n_emails,
           CAST(SUM(p) AS BIGINT) AS n_phones,
           CAST(SUM(ip) AS BIGINT) AS n_ipv4,
           CAST(SUM(cd) AS BIGINT) AS n_cards,
           CAST(SUM(lv) AS BIGINT) AS n_cards_luhn_valid,
           CAST(round(1e7 * SUM(e + p + ip + cd) / SUM(n_tokens))
                AS BIGINT) AS pii_per_kilotoken_bp
    FROM per_doc
    GROUP BY source
"""


@register("pii_inventory", _PII_SQL)
def pii_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII inventory — see module docstring.  Planting uses
    the pii_scrub convention (deterministic envelopes from doc_id);
    detection re-runs regexes over the planted text and re-validates
    the card class with the unrolled integer Luhn sum (identical CASE
    terms both engines).  ``pii_per_kilotoken_bp`` = 1e7 * items /
    tokens (items per 1000 tokens, in bp)."""
    docs = t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "source",
        F.expr("size(filter(split(text, ' '), x -> x != ''))")
        .cast("long").alias("n_tokens"),
        F.concat(
            F.lit("4"),
            F.lpad((F.col("doc_id") % 10000000).cast("string"), 7, "0"),
            F.lpad(((F.col("doc_id") * 7) % 10000000).cast("string"), 7,
                   "0")).alias("c15"))
    base = base.withColumn("_c16probe", F.concat(F.col("c15"), F.lit("0")))
    luhn15 = _luhn_sum_col("_c16probe", 16)
    valid_check = (10 - (luhn15 % 10)) % 10
    card = base.withColumn(
        "card16",
        F.concat(F.col("c15"),
                 F.when(F.col("doc_id") % 2 == 0, valid_check)
                 .otherwise((valid_check + 1) % 10).cast("string"))
    ).drop("_c16probe")
    raw = F.concat(
        F.lit("contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com "),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("cc admin"), F.col("doc_id").cast("string"),
                        F.lit("@corp.net "))).otherwise(F.lit("")),
        F.lit("or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10."), (F.col("doc_id") % 256).cast("string"),
        F.lit("."), ((F.col("doc_id") * 3) % 256).cast("string"),
        F.lit("."), ((F.col("doc_id") * 5) % 256).cast("string"),
        F.lit(" card "), F.col("card16"))
    per_doc = card.withColumn("raw", raw).select(
        "source", "n_tokens",
        F.regexp_count("raw", F.lit(_EMAIL_RE)).alias("e"),
        F.regexp_count("raw", F.lit(_PHONE_RE)).alias("p"),
        F.regexp_count("raw", F.lit(_IPV4_RE)).alias("ip"),
        F.regexp_count("raw", F.lit(_CARD_RE)).alias("cd"),
        F.when(_luhn_sum_col("card16", 16) % 10 == 0, 1).otherwise(0)
        .alias("lv"))
    items = F.col("e") + F.col("p") + F.col("ip") + F.col("cd")
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("e").cast("long").alias("n_emails"),
        F.sum("p").cast("long").alias("n_phones"),
        F.sum("ip").cast("long").alias("n_ipv4"),
        F.sum("cd").cast("long").alias("n_cards"),
        F.sum("lv").cast("long").alias("n_cards_luhn_valid"),
        F.round(F.lit(1e7) * F.sum(items) / F.sum("n_tokens")).cast("long")
        .alias("pii_per_kilotoken_bp"))
