"""Coverage wave 14 — URL/domain dedup, robust (normalized-token) MinHash,
paragraph-level dedup with reassembly, incremental decontamination.

The four standard pre-text stages of a web-scale LLM data pipeline the
registry did not yet cover (VERDICT r6 "Next round" #1):

- ``url_canonicalize`` / ``url_domain_dedup``: URL-level dedup runs BEFORE
  any text is fetched or compared — canonicalize (case-fold scheme+host,
  strip fragment/default port/``www.``/tracking params, normalize the
  trailing slash, sort surviving query params), group by canonical URL,
  keep the minimum doc id, then cap documents per registered domain (the
  standard anti-domination rule, cf. C4/RefinedWeb's per-domain limits).
  The corpus has no URL column, so a deterministic synthetic URL is
  DERIVED inside the gate from (doc_id, source) with deliberate case /
  port / tracking-param / trailing-slash / fragment variation — both
  engines build the identical string, so the canonicalizer is fully
  oracle-checked. Scale: everything is per-row string work until one
  hash aggregate on canonical_url and one window partitioned by domain
  (domains are the natural partition key; a hot domain is exactly the
  thing the cap truncates).

- ``dedup_minhash_normalized``: cross-lingual / robust near-dup — fold
  case, digits (→'0') and punctuation (→' ') BEFORE shingling, then the
  standard MinHash-LSH pipeline (operators/dedup.py devices) over the
  normalized text. The gate deterministically PERTURBS the corpus first
  (upper-case every 3rd doc, comma-join every (3k+1)-th, append a
  doc-varying 4-digit token to the rest) so the normalization is
  exercised for real on both engines, not a no-op. Oracle: brute-force
  exact Jaccard over the identically normalized text.

- ``paragraph_dup_spans`` / ``paragraph_dedup_reassembly``: the
  paragraph-granularity variant of ``substring_dup_spans`` (Lee et al.
  dedup at block level): split every doc into consecutive ``_PARA``-token
  paragraphs, hash each, call an occurrence duplicate when its hash
  occurs elsewhere in the corpus, keep only the canonical (lowest
  (doc_id, para_idx)) occurrence, and reassemble each doc from its kept
  paragraphs. Scale: one shuffle keyed on the 16-byte paragraph hash +
  one groupBy doc_id for reassembly; paragraph counts are linear in
  tokens, nothing quadratic.

- ``decontamination_incremental``: the batch twin of STREAMING
  decontamination (streaming/decontamination.py — stream-static join +
  stateful dedup; parity-tested in tests/test_streaming_decontamination
  the same way view_purchase_attribution twins its stream-stream join):
  train docs arrive in 8 deterministic micro-batches (doc_id order); per
  batch, report the novel train 4-gram count and the CUMULATIVE
  contamination of the static eval split (matched distinct (eval doc,
  shingle) pairs, contaminated eval docs). First-seen batch per shingle
  is one MIN aggregate; cumulative curves are windows over the 8-row
  batch spine. Reuses the md5 split (registry_llm6) and 4-gram shingles
  (registry_llm2) definitions, so it can never disagree with
  split_decontamination_report about what "train" or "a shingle" means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm2 import _with_4gram_shingles
from .registry_llm6 import _SPLIT_CASE_DUCK, _split_col

# =========================================================================
# URL canonicalization + domain-level dedup
# =========================================================================

_DOMAIN_CAP = 10  # canonical pages kept per registered domain

# --- deterministic synthetic URL (both engines build the same string) ---
# pk (page key) collides across docs -> real dedup groups; site spreads
# pages over 8 registered domains; scheme/www/host case, the default
# port, tracking params, the trailing slash and the fragment all vary so
# the canonicalizer has actual work to do on every component.
_URL_DUCK = """
        CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' WHEN doc_id % 3 = 1
             THEN 'Https' ELSE 'https' END
        || '://'
        || CASE WHEN doc_id % 4 = 0 THEN 'WWW.' WHEN doc_id % 4 = 2
                THEN 'www.' ELSE '' END
        || CASE WHEN doc_id % 5 = 0
                THEN upper('news.example' || CAST(doc_id % 100 % 8 AS VARCHAR) || '.com')
                ELSE 'news.example' || CAST(doc_id % 100 % 8 AS VARCHAR) || '.com' END
        || CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END
        || '/articles/' || substr(md5(CAST(doc_id % 100 AS VARCHAR)), 1, 8)
        || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
        || CASE WHEN doc_id % 2 = 0
                THEN '?utm_source=feed&id=' || CAST(doc_id % 100 AS VARCHAR)
                     || '&utm_campaign=news'
                ELSE '?id=' || CAST(doc_id % 100 AS VARCHAR) END
        || CASE WHEN doc_id % 6 = 0 THEN '#section-2' ELSE '' END
"""

_URL_SPARK = """
        CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' WHEN doc_id % 3 = 1
             THEN 'Https' ELSE 'https' END
        || '://'
        || CASE WHEN doc_id % 4 = 0 THEN 'WWW.' WHEN doc_id % 4 = 2
                THEN 'www.' ELSE '' END
        || CASE WHEN doc_id % 5 = 0
                THEN upper('news.example' || CAST(doc_id % 100 % 8 AS STRING) || '.com')
                ELSE 'news.example' || CAST(doc_id % 100 % 8 AS STRING) || '.com' END
        || CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END
        || '/articles/' || substr(md5(CAST(doc_id % 100 AS STRING)), 1, 8)
        || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
        || CASE WHEN doc_id % 2 = 0
                THEN '?utm_source=feed&id=' || CAST(doc_id % 100 AS STRING)
                     || '&utm_campaign=news'
                ELSE '?id=' || CAST(doc_id % 100 AS STRING) END
        || CASE WHEN doc_id % 6 = 0 THEN '#section-2' ELSE '' END
"""

# --- the generic canonicalizer, as engine-specific column pipelines ---
# steps (RFC 3986 normalization + the standard tracking-param scrub):
#   1 strip fragment; 2 lower scheme+host; 3 strip default :443;
#   4 strip leading www.; 5 split path?query; 6 drop trailing '/' on a
#   non-root path; 7 drop utm_* params, sort the survivors; 8 reassemble.
_CANON_DUCK = """
    u0 AS (SELECT doc_id, url, split_part(url, '#', 1) AS u FROM raw_urls),
    parts AS (
        SELECT doc_id, url,
               lower(split_part(u, '://', 1)) AS scheme,
               lower(split_part(split_part(u, '://', 2), '/', 1)) AS hostport,
               substr(split_part(u, '://', 2),
                      length(split_part(split_part(u, '://', 2), '/', 1)) + 1)
                   AS rest
        FROM u0
    ),
    hostfix AS (
        SELECT doc_id, url, scheme, rest,
               CASE WHEN scheme = 'https' AND hostport LIKE '%:443'
                    THEN substr(hostport, 1, length(hostport) - 4)
                    ELSE hostport END AS h1
        FROM parts
    ),
    comps AS (
        SELECT doc_id, url, scheme,
               CASE WHEN h1 LIKE 'www.%' THEN substr(h1, 5) ELSE h1 END AS host,
               split_part(rest, '?', 1) AS path0,
               split_part(rest, '?', 2) AS q0
        FROM hostfix
    ),
    canon AS (
        SELECT doc_id, url, scheme, host,
               CASE WHEN path0 = '' THEN '/'
                    WHEN path0 <> '/' AND path0 LIKE '%/'
                    THEN substr(path0, 1, length(path0) - 1)
                    ELSE path0 END AS path,
               array_to_string(list_sort(list_filter(
                   string_split(q0, '&'),
                   p -> NOT starts_with(p, 'utm_'))), '&') AS q
        FROM comps
    ),
    urls AS (
        SELECT doc_id, url, host,
               -- domain = last two labels of the PORT-STRIPPED host
               -- ('sub.example.com:8443' -> 'example.com', not
               -- 'example.com:8443'); greatest(1, ..) start: a
               -- single-label host ('localhost') yields start 0, which
               -- Spark's slice() rejects — both engines must return the
               -- host itself on that edge
               array_to_string(
                   string_split(split_part(host, ':', 1), '.')[greatest(
                       1, len(string_split(split_part(host, ':', 1), '.'))
                       - 1):],
                   '.') AS domain,
               path,
               scheme || '://' || host || path
               || CASE WHEN q <> '' THEN '?' || q ELSE '' END AS canonical_url
        FROM canon
    )
"""


def _canonicalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, url, host, domain, path, canonical_url) — Spark twin of
    the _CANON_DUCK CTE chain over the same synthetic URLs."""
    docs = t(spark, sf_dir, "documents")
    return canonicalize_urls(docs.select("doc_id", F.expr(_URL_SPARK).alias("url")))


def canonicalize_urls(urls: DataFrame) -> DataFrame:
    """Generic URL canonicalizer over a (doc_id, url) frame — pure
    per-row column work (scan-speed at any scale); see the step list on
    _CANON_DUCK.  Exposed standalone so tests can drive hand-built edge
    URLs (no query, root path, non-default port, bare domain) directly."""
    u = urls
    u = u.withColumn("u", F.expr("split_part(url, '#', 1)"))
    u = (
        u.withColumn("scheme", F.expr("lower(split_part(u, '://', 1))"))
        .withColumn("hostport",
                    F.expr("lower(split_part(split_part(u, '://', 2), '/', 1))"))
        .withColumn("rest", F.expr(
            "substr(split_part(u, '://', 2),"
            " length(split_part(split_part(u, '://', 2), '/', 1)) + 1)"))
    )
    u = u.withColumn("h1", F.expr(
        "CASE WHEN scheme = 'https' AND hostport LIKE '%:443'"
        " THEN substr(hostport, 1, length(hostport) - 4) ELSE hostport END"))
    u = (
        u.withColumn("host", F.expr(
            "CASE WHEN h1 LIKE 'www.%' THEN substr(h1, 5) ELSE h1 END"))
        .withColumn("path0", F.expr("split_part(rest, '?', 1)"))
        .withColumn("q0", F.expr("split_part(rest, '?', 2)"))
    )
    u = (
        u.withColumn("path", F.expr(
            "CASE WHEN path0 = '' THEN '/'"
            " WHEN path0 <> '/' AND path0 LIKE '%/'"
            " THEN substr(path0, 1, length(path0) - 1) ELSE path0 END"))
        .withColumn("q", F.expr(
            "array_join(array_sort(filter(split(q0, '&'),"
            " p -> NOT startswith(p, 'utm_'))), '&')"))
    )
    return u.select(
        "doc_id", "url", "host",
        F.expr("array_join(slice(split(split_part(host, ':', 1), '\\\\.'),"
               " greatest(1, size(split(split_part(host, ':', 1),"
               " '\\\\.')) - 1), 2), '.')")
        .alias("domain"),
        "path",
        F.expr("scheme || '://' || host || path"
               " || CASE WHEN q <> '' THEN '?' || q ELSE '' END")
        .alias("canonical_url"),
    )


@register(
    "url_canonicalize",
    f"""
    WITH raw_urls AS (
        SELECT doc_id, {_URL_DUCK} AS url FROM documents
    ),
    {_CANON_DUCK}
    SELECT doc_id, url, host, domain, path, canonical_url FROM urls
    """,
)
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc URL canonicalization report — see module docstring.
    Every component the canonicalizer touches (scheme/host case, :443,
    www., utm_* params, trailing slash, fragment) varies in the input,
    and every output column is an exact string."""
    return _canonicalized(spark, sf_dir)


@register(
    "url_domain_dedup",
    f"""
    WITH raw_urls AS (
        SELECT doc_id, {_URL_DUCK} AS url FROM documents
    ),
    {_CANON_DUCK},
    grp AS (
        -- domain is functionally dependent on canonical_url (it derives
        -- from the host), so it rides as a GROUP KEY: numeric-only
        -- aggregates keep the whole thing a hash aggregate (a MIN over a
        -- string column would demote Spark's twin to SortAggregate)
        SELECT canonical_url, domain,
               MIN(doc_id) AS canonical_doc,
               COUNT(*) AS n_dups
        FROM urls GROUP BY canonical_url, domain
    ),
    sized AS (
        SELECT g.*, d.n_chars
        FROM grp g JOIN documents d ON d.doc_id = g.canonical_doc
    ),
    ranked AS (
        SELECT canonical_url, domain, canonical_doc,
               CAST(n_dups AS BIGINT) AS n_dups,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY domain
                   ORDER BY n_chars DESC, canonical_doc ASC) AS BIGINT)
                   AS domain_rank
        FROM sized
    )
    SELECT canonical_url, domain, canonical_doc, n_dups, domain_rank,
           domain_rank <= {_DOMAIN_CAP} AS kept
    FROM ranked
    """,
)
def url_domain_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup + per-domain cap: one row per CANONICAL URL with
    its duplicate count, the kept doc (min id), its rank inside the
    registered domain (by n_chars DESC then doc id — keep the largest
    pages) and whether the {cap}-per-domain cap keeps it.  At 100 TB the
    groupBy key is canonical_url (high cardinality, well spread) and the
    window partitions by domain — the skew object the cap itself
    truncates."""
    docs = t(spark, sf_dir, "documents")
    urls = _canonicalized(spark, sf_dir)
    grp = urls.groupBy("canonical_url", "domain").agg(
        F.min("doc_id").alias("canonical_doc"),
        F.count("*").cast("long").alias("n_dups"),
    )
    sized = grp.join(
        docs.select(F.col("doc_id").alias("canonical_doc"), "n_chars"),
        "canonical_doc",
    )
    w = Window.partitionBy("domain").orderBy(
        F.desc("n_chars"), F.asc("canonical_doc"))
    return sized.select(
        "canonical_url", "domain", "canonical_doc", "n_dups",
        F.row_number().over(w).cast("long").alias("domain_rank"),
    ).withColumn("kept", F.col("domain_rank") <= _DOMAIN_CAP)


# =========================================================================
# normalized-token (cross-lingual / robust) MinHash
# =========================================================================

# deterministic perturbation so the normalizer is exercised for real:
# doc_id%3==0 -> ALL CAPS; ==1 -> comma-joined tokens; ==2 -> a varying
# 4-digit version token appended (digit-folding maps them all to '0000').
_PERTURB_DUCK = """
        CASE WHEN doc_id % 3 = 0 THEN upper(text)
             WHEN doc_id % 3 = 1 THEN replace(text, ' ', ', ')
             ELSE text || ' v' || CAST(1000 + doc_id % 9000 AS VARCHAR) END
"""
_PERTURB_SPARK = """
        CASE WHEN doc_id % 3 = 0 THEN upper(text)
             WHEN doc_id % 3 = 1 THEN replace(text, ' ', ', ')
             ELSE text || ' v' || CAST(1000 + doc_id % 9000 AS STRING) END
"""

# normalization: case-fold, digits -> '0', punctuation -> space, collapse
# runs of spaces, trim.  Spark regexp_replace is global by default;
# DuckDB needs the 'g' flag.
_NORM_DUCK = ("trim(regexp_replace(regexp_replace(regexp_replace("
              "lower({x}), '[0-9]', '0', 'g'), '[^a-z0 ]', ' ', 'g'),"
              " '  *', ' ', 'g'))")
_NORM_SPARK = ("trim(regexp_replace(regexp_replace(regexp_replace("
               "lower({x}), '[0-9]', '0'), '[^a-z0 ]', ' '),"
               " '  *', ' '))")


@register(
    "dedup_minhash_normalized",
    f"""
    WITH pert AS (
        SELECT doc_id, {_PERTURB_DUCK} AS ptext FROM documents
    ),
    norm AS (
        SELECT doc_id, {_NORM_DUCK.format(x='ptext')} AS ntext FROM pert
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(1, len(string_split(ntext, ' ')) - 2) + 1),
                   i -> array_to_string(string_split(ntext, ' ')[i:i+2], ' '))))
                   AS s
        FROM norm
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    ipair AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT d1, d2, inter, sa.n AS n1, sb.n AS n2,
           CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
    FROM ipair
    JOIN sz sa ON sa.doc_id = d1
    JOIN sz sb ON sb.doc_id = d2
    WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 5e-1
    """,
)
def dedup_minhash_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust near-dup pairs: normalize (case/digit/punct-fold) the
    deterministically perturbed corpus, then MinHash-LSH + exact-Jaccard
    verification over the NORMALIZED text (same b=16/r=2 S-curve
    argument as dedup_minhash_lsh, so the verified output equals the
    brute-force oracle).  This is the cross-lingual/robust dedup shape:
    two documents differing only in case, punctuation or numbers are
    caught; tests/test_llm14 pins that the raw-text pipeline misses
    exactly those pairs."""
    from .operators.dedup import minhash_lsh_pairs

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_NORM_SPARK.format(
            x=f"({_PERTURB_SPARK})")).alias("ntext"),
    )
    return minhash_lsh_pairs(docs, threshold=0.5, text_col="ntext")


# =========================================================================
# paragraph-level dedup + reassembly
# =========================================================================

_PARA = 10  # tokens per paragraph block

_PARA_CTE = f"""
    toked AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    paras AS (
        SELECT doc_id,
               CAST(j AS BIGINT) AS para_idx,
               array_to_string(l[(j * {_PARA} + 1):(j * {_PARA} + {_PARA})],
                               ' ') AS para
        FROM toked,
             unnest(range(0, CAST(ceil(len(l) / {_PARA}.0) AS BIGINT))) AS t(j)
    ),
    hashed AS (
        SELECT doc_id, para_idx, para, md5(para) AS para_hash FROM paras
    ),
    canon AS (
        SELECT para_hash,
               COUNT(*) AS n_occ,
               MIN(doc_id * 100000 + para_idx) AS ck
        FROM hashed GROUP BY para_hash
    )
"""


@register(
    "paragraph_dup_spans",
    f"""
    WITH {_PARA_CTE}
    SELECT h.doc_id, h.para_idx, h.para_hash,
           c.ck // 100000 AS canonical_doc,
           c.ck % 100000 AS canonical_idx
    FROM hashed h JOIN canon c USING (para_hash)
    WHERE c.n_occ > 1 AND h.doc_id * 100000 + h.para_idx <> c.ck
    """,
)
def paragraph_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-canonical duplicate paragraph occurrences: every {p}-token
    block whose hash appears elsewhere in the corpus, pointing at the
    canonical (lowest (doc_id, para_idx)) occurrence.  The packed
    ``doc_id*100000+para_idx`` (sound below 100k paragraphs/doc — 1M tokens) key makes the canonical argmin ONE numeric
    MIN aggregate on the paragraph hash — the same fixed-size-buffer
    HashAggregate device as winnowing's selection key."""
    paras = _paragraphs(spark, sf_dir)
    canon = paras.groupBy("para_hash").agg(
        F.count("*").alias("n_occ"),
        F.min(F.col("doc_id") * 100000 + F.col("para_idx")).alias("ck"),
    )
    return (
        paras.join(canon, "para_hash")
        .filter((F.col("n_occ") > 1)
                & (F.col("doc_id") * 100000 + F.col("para_idx") != F.col("ck")))
        .select(
            "doc_id", "para_idx", "para_hash",
            F.expr("ck div 100000").alias("canonical_doc"),
            (F.col("ck") % 100000).alias("canonical_idx"),
        )
    )


def _paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, para_idx, para, para_hash): consecutive _PARA-token blocks.
    posexplode over a transform of the token array — linear per-row work,
    the anti-O(words²) shape (the lambda slices an already-evaluated
    attribute, cf. registry_llm2._with_4gram_shingles)."""
    docs = t(spark, sf_dir, "documents")
    toked = docs.select("doc_id", F.split("text", " ").alias("l"))
    return (
        toked.select(
            "doc_id",
            F.posexplode(F.expr(
                f"transform(sequence(0, CAST(ceil(size(l) / {_PARA}.0) AS INT) - 1),"
                f" j -> array_join(slice(l, j * {_PARA} + 1, {_PARA}), ' '))"
            )).alias("para_idx", "para"),
        )
        .select(
            "doc_id", F.col("para_idx").cast("long").alias("para_idx"),
            "para", F.md5("para").alias("para_hash"),
        )
    )


@register(
    "paragraph_dedup_reassembly",
    f"""
    WITH {_PARA_CTE},
    kept AS (
        SELECT h.doc_id, h.para_idx, h.para
        FROM hashed h JOIN canon c USING (para_hash)
        WHERE c.n_occ = 1 OR h.doc_id * 100000 + h.para_idx = c.ck
    ),
    rebuilt AS (
        SELECT doc_id,
               COUNT(*) AS n_kept,
               string_agg(para, ' ' ORDER BY para_idx) AS kept_text
        FROM kept GROUP BY doc_id
    ),
    totals AS (
        SELECT doc_id, COUNT(*) AS n_paras FROM hashed GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(t.n_paras AS BIGINT) AS n_paras,
           CAST(t.n_paras - COALESCE(r.n_kept, 0) AS BIGINT) AS n_dropped,
           COALESCE(r.kept_text, '') AS kept_text
    FROM totals t LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def paragraph_dedup_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc paragraph dedup with reassembly: drop every non-canonical
    duplicate paragraph and rebuild the document from the surviving
    blocks in order (Spark's order-free twin of ``string_agg(... ORDER
    BY)``: sort_array over (para_idx, para) structs inside the row).
    All docs output (a fully-duplicated doc keeps the empty string)."""
    paras = _paragraphs(spark, sf_dir)
    canon = paras.groupBy("para_hash").agg(
        F.count("*").alias("n_occ"),
        F.min(F.col("doc_id") * 100000 + F.col("para_idx")).alias("ck"),
    )
    kept = (
        paras.join(canon, "para_hash")
        .filter((F.col("n_occ") == 1)
                | (F.col("doc_id") * 100000 + F.col("para_idx") == F.col("ck")))
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.expr("array_join(transform(array_sort("
               "collect_list(struct(para_idx, para))), x -> x.para), ' ')")
        .alias("kept_text"),
    )
    totals = paras.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_paras"))
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id", "n_paras",
        (F.col("n_paras") - F.coalesce("n_kept", F.lit(0)))
        .cast("long").alias("n_dropped"),
        F.coalesce("kept_text", F.lit("")).alias("kept_text"),
    )


# =========================================================================
# incremental decontamination (batch twin of the streaming stage)
# =========================================================================

_N_BATCHES = 8


@register(
    "decontamination_incremental",
    f"""
    WITH n AS (SELECT MAX(doc_id) + 1 AS n_docs FROM documents),
    spl AS (
        SELECT doc_id, {_SPLIT_CASE_DUCK.format(id='doc_id')} AS split
        FROM documents
    ),
    toks AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(1, len(l) - 3) + 1),
                   i -> array_to_string(l[i:i+3], ' ')))) AS s
        FROM toks
    ),
    tr AS (
        SELECT sh.doc_id * {_N_BATCHES} // n.n_docs AS batch, sh.s
        FROM sh JOIN spl USING (doc_id) CROSS JOIN n
        WHERE spl.split = 'train'
    ),
    tr_first AS (SELECT s, MIN(batch) AS first_batch FROM tr GROUP BY s),
    new_per_batch AS (
        SELECT first_batch AS batch, COUNT(*) AS new_shingles
        FROM tr_first GROUP BY first_batch
    ),
    ev AS (
        SELECT sh.doc_id, sh.s FROM sh JOIN spl USING (doc_id)
        WHERE spl.split <> 'train'
    ),
    hits AS (
        SELECT ev.doc_id, tf.first_batch AS fb
        FROM ev JOIN tr_first tf ON tf.s = ev.s
    ),
    pair_cum AS (
        SELECT fb AS batch, COUNT(*) AS pairs_at
        FROM hits GROUP BY fb
    ),
    doc_first AS (SELECT doc_id, MIN(fb) AS fb FROM hits GROUP BY doc_id),
    doc_cum AS (
        SELECT fb AS batch, COUNT(*) AS docs_at FROM doc_first GROUP BY fb
    ),
    spine AS (
        SELECT unnest(range(0, {_N_BATCHES})) AS batch
    )
    SELECT s.batch,
           CAST(COALESCE(np.new_shingles, 0) AS BIGINT) AS new_train_shingles,
           CAST(SUM(COALESCE(pc.pairs_at, 0)) OVER (
               ORDER BY s.batch ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS matched_pairs_cum,
           CAST(SUM(COALESCE(dc.docs_at, 0)) OVER (
               ORDER BY s.batch ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS docs_contaminated_cum
    FROM spine s
    LEFT JOIN new_per_batch np ON np.batch = s.batch
    LEFT JOIN pair_cum pc ON pc.batch = s.batch
    LEFT JOIN doc_cum dc ON dc.batch = s.batch
    """,
)
def decontamination_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental train→eval contamination curve — see module docstring.
    Per arrival batch of train docs: novel distinct train 4-grams, plus
    the cumulative matched (eval doc, shingle) pairs and contaminated
    eval docs once those batches are in the train set.  The final row
    equals the static split_decontamination_report totals (pinned in
    tests/test_llm14); the per-batch prefix is exactly the state the
    streaming twin (streaming/decontamination.py) holds after each
    micro-batch."""
    docs = t(spark, sf_dir, "documents")
    n = docs.agg((F.max("doc_id") + 1).alias("n_docs"))
    sh = (_with_4gram_shingles(docs.select("doc_id", "text"))
          .select("doc_id", F.explode("shingles").alias("s"))
          .withColumn("split", _split_col()))
    # shingle device note: split_decontamination_report shares this exact
    # construction; the 4-gram definition lives in registry_llm2.
    tr = (sh.filter(F.col("split") == "train")
          .crossJoin(F.broadcast(n))
          .select(F.expr(f"(doc_id * {_N_BATCHES}) div n_docs").alias("batch"),
                  "s"))
    # tr_first feeds the novelty count AND both contamination branches
    # (pairs + docs): scoped-persist it, or the whole corpus shingle scan
    # re-runs three times (measured: 3 BroadcastNestedLoopJoin copies of
    # the 1-row size frame in the unpersisted plan)
    from .operators.materialize import scoped_persist

    tr_first = scoped_persist(
        tr.groupBy("s").agg(F.min("batch").alias("first_batch")))
    new_per_batch = tr_first.groupBy(
        F.col("first_batch").alias("batch")
    ).agg(F.count("*").alias("new_shingles"))
    ev = sh.filter(F.col("split") != "train").select("doc_id", "s")
    hits = scoped_persist(
        ev.join(tr_first, "s").select("doc_id",
                                      F.col("first_batch").alias("fb")))
    pair_cum = hits.groupBy(F.col("fb").alias("batch")).agg(
        F.count("*").alias("pairs_at"))
    doc_first = hits.groupBy("doc_id").agg(F.min("fb").alias("fb"))
    doc_cum = doc_first.groupBy(F.col("fb").alias("batch")).agg(
        F.count("*").alias("docs_at"))
    spine = spark.range(_N_BATCHES).select(F.col("id").alias("batch"))
    w = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding,
                                            Window.currentRow)
    return (
        spine.join(new_per_batch, "batch", "left")
        .join(pair_cum, "batch", "left")
        .join(doc_cum, "batch", "left")
        .select(
            "batch",
            F.coalesce("new_shingles", F.lit(0)).cast("long")
            .alias("new_train_shingles"),
            F.sum(F.coalesce("pairs_at", F.lit(0))).over(w).cast("long")
            .alias("matched_pairs_cum"),
            F.sum(F.coalesce("docs_at", F.lit(0))).over(w).cast("long")
            .alias("docs_contaminated_cum"),
        )
    )
