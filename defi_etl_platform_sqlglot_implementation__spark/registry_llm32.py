"""Coverage wave 32 (round 9) — the dedup dividend, affix-redundancy
closure, classifier calibration, and the crossed corpus datasheet.

- ``dedup_token_savings``: the token-weighted dedup DIVIDEND table —
  what each deployed strategy actually buys in training tokens.  Four
  strategies price their removals against one shared token metric
  (non-empty whitespace tokens, the _TOKS device): ``exact`` (verbatim
  md5 copies, non-canonical victims), ``lsh_canonical`` (the
  dedup_keep_canonical decision: CC over LSH-verified Jaccard>=0.5
  pairs, keep the longest doc per cluster), ``url_domain`` (the
  url_domain_dedup decision: one doc per canonical URL, capped per
  domain — everything else removed), and ``paragraph`` (non-canonical
  duplicate 10-token blocks removed IN PLACE, docs survive).  The
  token-weighted twin of ``dedup_variant_agreement``: that gate counts
  flagged DOCS, this one counts the tokens a strategy actually deletes
  — the number a pretraining-budget owner asks for.

- ``doc_suffix_containment``: mirror of ``doc_prefix_containment`` —
  A == B's LAST |A| tokens with |A| < |B|, blocked on the md5 of the
  last 4 tokens (pigeonhole-complete for docs with >= 4 tokens).
  Closes the affix-redundancy pair: boilerplate headers surface as
  prefix containment, boilerplate footers/signatures as suffix
  containment; Jaccard-threshold dedup underprices both.

- ``quality_score_calibration``: does the trained classifier's
  CONFIDENCE mean anything?  Per held-out doc, the NB posterior margin
  (top1 − top2 integer micro-nat score, byte-shared with
  nb_source_classifier via registry_llm18._NB_SCORED_CTES /
  _nb_scored) is quartiled WITHIN its true source (NTILE(4), margin
  DESC, doc_id tie-break — the ccnet_perplexity_buckets partitioned-
  window device) and crossed with prediction correctness, the gopher
  keep verdict, and LSH near-dup membership.  A calibrated classifier
  shows accuracy rising with margin quartile; dup/low-quality docs
  concentrating in the low-margin tail is the classic
  classifier-confidence × rule-based-quality curation cross-check.

- ``source_lang_datasheet``: the per-(source, lang) crossed corpus
  datasheet with full marginals — (source, lang), (source, *), (*,
  lang), (*, *) — in ONE base pass: unigram counts reduce to the
  (source, lang, token) frame once, and the three rollup levels
  re-aggregate THAT reduced frame (never the token stream again — the
  cascade the CUBE operator would run internally, stated explicitly so
  both engines share one plan shape).  Per group: docs, tokens, vocab,
  and Shannon entropy in micro-nats (the wave-31 A − round(B/N)
  integer device).  Rolled-up dimensions carry the literal '<all>'.

Scale shapes: token savings joins victim DOC SETS against the per-doc
token frame (linear; the only pair machinery is the already-banded LSH
chain and the hash-grouped paragraph canon); suffix containment is one
hash equi-join on the 4-token block key + a row-local string verify;
calibration is |heldout|x|classes| integer sums (the NB shape) + two
partitioned windows; the datasheet is one explode + one hash aggregate
+ vocabulary-sized re-aggregations.

Reference scope: composes the reference's aggregation surface
(src/transform/etl_pipeline.py groupbys) with the LLM-pipeline
extension; no counterpart file exists — cited per SURVEY §6 as a scale
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm import _CC_REACH_CTE, _SHINGLES_CTE
from .registry_llm14 import _CANON_DUCK, _DOMAIN_CAP, _PARA_CTE, _URL_DUCK
from .registry_llm18 import _NB_SCORED_CTES

_TOKS_DUCK = "list_filter(string_split(text, ' '), x -> x <> '')"
_TOKS_SPARK = "filter(split(text, ' '), x -> x != '')"


# =========================================================================
# dedup_token_savings — the token-weighted dedup dividend
# =========================================================================

# The url and paragraph chains live in NESTED subquery CTE scopes: both
# _CANON_DUCK and _PARA_CTE define a CTE named `canon`, so they cannot
# share the outer WITH.
_SAVINGS_SQL = f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_CC_REACH_CTE},
    cc AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
           FROM reach GROUP BY src),
    tok AS (
        SELECT doc_id, CAST(len({_TOKS_DUCK}) AS BIGINT) AS n_tok
        FROM documents
    ),
    tot AS (
        SELECT CAST(SUM(n_tok) AS BIGINT) AS t,
               CAST(COUNT(*) AS BIGINT) AS nd
        FROM tok
    ),
    exv AS (
        SELECT doc_id FROM (
            SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS c
            FROM documents) WHERE doc_id <> c
    ),
    lab AS (
        SELECT d.doc_id,
               COALESCE(cc.cluster_id, d.doc_id) AS cluster_id,
               length(d.text) AS n_chars
        FROM documents d LEFT JOIN cc USING (doc_id)
    ),
    lshv AS (
        SELECT doc_id FROM (
            SELECT doc_id, ROW_NUMBER() OVER (
                PARTITION BY cluster_id
                ORDER BY n_chars DESC, doc_id) AS rk
            FROM lab) WHERE rk <> 1
    ),
    urlkeep AS (
        SELECT doc_id FROM (
            WITH raw_urls AS (
                SELECT doc_id, {_URL_DUCK} AS url FROM documents
            ),
            {_CANON_DUCK},
            grp AS (
                SELECT canonical_url, domain,
                       MIN(doc_id) AS canonical_doc
                FROM urls GROUP BY 1, 2
            ),
            sized AS (
                SELECT g.*, d.n_chars
                FROM grp g JOIN documents d ON d.doc_id = g.canonical_doc
            ),
            ranked AS (
                SELECT canonical_doc AS doc_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY domain
                           ORDER BY n_chars DESC, canonical_doc) AS r
                FROM sized
            )
            SELECT doc_id FROM ranked WHERE r <= {_DOMAIN_CAP}
        )
    ),
    parav AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(para, ' '),
                                    x -> x <> '')) AS BIGINT) AS p_tok
        FROM (
            WITH {_PARA_CTE}
            SELECT h.doc_id, h.para
            FROM hashed h JOIN canon c USING (para_hash)
            WHERE c.n_occ > 1 AND h.doc_id * 100000 + h.para_idx <> c.ck
        )
    ),
    rows_ AS (
        SELECT 'exact' AS strategy,
               CAST(COUNT(*) AS BIGINT) AS n_victims,
               CAST(COALESCE(SUM(tok.n_tok), 0) AS BIGINT) AS removed
        FROM exv JOIN tok USING (doc_id)
        UNION ALL
        SELECT 'lsh_canonical',
               CAST(COUNT(*) AS BIGINT),
               CAST(COALESCE(SUM(tok.n_tok), 0) AS BIGINT)
        FROM lshv JOIN tok USING (doc_id)
        UNION ALL
        SELECT 'url_domain',
               CAST(COUNT(*) AS BIGINT),
               CAST(COALESCE(SUM(n_tok), 0) AS BIGINT)
        FROM tok WHERE doc_id NOT IN (SELECT doc_id FROM urlkeep)
        UNION ALL
        SELECT 'paragraph',
               CAST(COUNT(DISTINCT doc_id) AS BIGINT),
               CAST(COALESCE(SUM(p_tok), 0) AS BIGINT)
        FROM parav
    )
    SELECT r.strategy, r.n_victims,
           tot.t AS tokens_total,
           r.removed AS tokens_removed,
           tot.t - r.removed AS tokens_kept,
           CAST(round(1e4 * r.removed / tot.t) AS BIGINT) AS savings_bp
    FROM rows_ r CROSS JOIN tot
"""


@register("dedup_token_savings", _SAVINGS_SQL)
def dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted dedup dividend — see module docstring.  Victim
    DOC SETS (never pair sets) join the per-doc token frame; the
    paragraph strategy sums the non-empty tokens of each removed block
    (partial tails at true length, the boilerplate_block_removal
    convention).  Every strategy reuses its standalone gate's exact
    construction: the md5-window exact device
    (dedup_variant_agreement), minhash_lsh_pairs + CC + longest-doc
    argmax (dedup_keep_canonical), _canonicalized + the per-domain cap
    (url_domain_dedup), and _paragraphs + canon (paragraph_dup_spans)
    — so this gate can never disagree with the strategies it prices."""
    from concurrent.futures import ThreadPoolExecutor

    from .operators.dedup import connected_components, minhash_lsh_pairs
    from .operators.materialize import scoped_persist
    from .registry_llm14 import _canonicalized, _paragraphs

    docs = t(spark, sf_dir, "documents")
    tok_src = docs.select(
        "doc_id",
        F.expr(f"size({_TOKS_SPARK})").cast("long").alias("n_tok"))
    pairs = minhash_lsh_pairs(docs, threshold=0.5).select("d1", "d2")
    # the token-count cache fill and the CC edge materialization are
    # independent driver-blocking actions over disjoint cache subtrees
    # — overlap them (guide §2.6) so the second job's stages back-fill
    # the first's tail; results are the same deterministic frames
    with ThreadPoolExecutor(max_workers=2) as _pool:
        _tok_f = _pool.submit(scoped_persist, tok_src)
        _cc_f = _pool.submit(
            lambda: connected_components(pairs)
            .withColumnRenamed("node", "doc_id"))
        tok = _tok_f.result()
        cc = _cc_f.result()
    tot = tok.agg(F.sum("n_tok").cast("long").alias("t"),
                  F.count("*").cast("long").alias("nd"))

    def savings(name: str, victims: DataFrame, removed_col=None,
                distinct_victims: bool = False) -> DataFrame:
        if removed_col is None:
            j = victims.join(tok, "doc_id")
            return j.agg(
                F.lit(name).alias("strategy"),
                F.count("*").cast("long").alias("n_victims"),
                F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long")
                .alias("removed"))
        n_v = (F.countDistinct("doc_id") if distinct_victims
               else F.count("*"))
        return victims.agg(
            F.lit(name).alias("strategy"),
            n_v.cast("long").alias("n_victims"),
            F.coalesce(F.sum(removed_col), F.lit(0)).cast("long")
            .alias("removed"))

    # exact: non-canonical verbatim copies
    wmin = Window.partitionBy(F.md5("text"))
    exv = (docs.select("doc_id", F.min("doc_id").over(wmin).alias("c"))
           .filter(F.col("doc_id") != F.col("c")).select("doc_id"))
    # lsh_canonical: keep-the-longest per CC cluster, victims = rest
    lab = (docs.select("doc_id", F.length("text").alias("n_chars"))
           .join(cc, "doc_id", "left")
           .select("doc_id",
                   F.coalesce("cluster_id", F.col("doc_id"))
                   .alias("cluster_id"), "n_chars"))
    wk = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id"))
    lshv = (lab.withColumn("rk", F.row_number().over(wk))
            .filter(F.col("rk") != 1).select("doc_id"))
    # url_domain: survivors = capped canonical docs; victims = the rest
    urls = _canonicalized(spark, sf_dir)
    grp = urls.groupBy("canonical_url", "domain").agg(
        F.min("doc_id").alias("canonical_doc"))
    sized = grp.join(
        docs.select(F.col("doc_id").alias("canonical_doc"), "n_chars"),
        "canonical_doc")
    wu = Window.partitionBy("domain").orderBy(
        F.desc("n_chars"), F.asc("canonical_doc"))
    urlkeep = (sized.withColumn("r", F.row_number().over(wu))
               .filter(F.col("r") <= _DOMAIN_CAP)
               .select(F.col("canonical_doc").alias("doc_id")))
    urlv = tok.join(urlkeep, "doc_id", "left_anti")
    # paragraph: removed non-canonical duplicate blocks, tokens in place
    paras = _paragraphs(spark, sf_dir)
    canon = paras.groupBy("para_hash").agg(
        F.count("*").alias("n_occ"),
        F.min(F.col("doc_id") * 100000 + F.col("para_idx")).alias("ck"))
    parav = (paras.join(canon, "para_hash")
             .filter((F.col("n_occ") > 1)
                     & (F.col("doc_id") * 100000 + F.col("para_idx")
                        != F.col("ck")))
             .select("doc_id",
                     F.expr("size(filter(split(para, ' '), x -> x != ''))")
                     .cast("long").alias("p_tok")))

    rows = (
        savings("exact", exv)
        .unionByName(savings("lsh_canonical", lshv))
        .unionByName(savings("url_domain", urlv, removed_col="n_tok"))
        .unionByName(savings("paragraph", parav, removed_col="p_tok",
                             distinct_victims=True))
    )
    return rows.crossJoin(F.broadcast(tot)).select(
        "strategy", "n_victims",
        F.col("t").alias("tokens_total"),
        F.col("removed").alias("tokens_removed"),
        (F.col("t") - F.col("removed")).cast("long").alias("tokens_kept"),
        F.round(F.lit(1e4) * F.col("removed") / F.col("t")).cast("long")
        .alias("savings_bp"),
    )


# =========================================================================
# doc_suffix_containment — blocked on the last-4-token hash
# =========================================================================

# The driver corpus grows docs by APPENDING (prefix redundancy exists,
# suffix redundancy does not — doc_prefix_containment finds 25 pairs at
# sf0.01, the suffix mirror over raw documents finds 0, verified on both
# engines).  A structurally-0-row gate is a silent gate, so per the
# _PERTURB convention (registry_llm14.dedup_minhash_normalized) the
# population is AUGMENTED with deterministic tail fragments: every
# doc_id % 9 == 0 doc with >= 8 tokens contributes a second doc
# (id + 10^7) holding its last floor(n/2) tokens — the truncated
# re-crawl / pagination-tail redundancy the suffix operator exists to
# catch.  Fragments are >= 4 tokens so the last-4-token block key stays
# pigeonhole-complete.
_SUFFIX_FRAG_OFFSET = 10_000_000

_SUFFIX_SQL = f"""
    WITH d0 AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ),
    d AS (
        SELECT doc_id, toks FROM d0
        UNION ALL
        SELECT doc_id + {_SUFFIX_FRAG_OFFSET},
               toks[(len(toks) - len(toks) // 2 + 1):len(toks)]
        FROM d0 WHERE doc_id % 9 = 0 AND len(toks) >= 8
    ),
    dk AS (
        SELECT doc_id, toks, len(toks) AS n,
               md5(array_to_string(toks[len(toks)-3:len(toks)], ' ')) AS k
        FROM d WHERE len(toks) >= 4
    )
    SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
           CAST(a.n AS BIGINT) AS n_contained,
           CAST(b.n AS BIGINT) AS n_container,
           CAST(round(1e4 * a.n / b.n) AS BIGINT) AS coverage_bp
    FROM dk a JOIN dk b ON a.k = b.k AND a.n < b.n
    WHERE array_to_string(a.toks, ' ')
        = array_to_string(b.toks[(b.n - a.n + 1):b.n], ' ')
"""


@register("doc_suffix_containment", _SUFFIX_SQL)
def doc_suffix_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level suffix containment (A == B's last |A| tokens,
    |A| < |B|) over docs with >= 4 tokens — blocked on the md5 of the
    LAST 4 tokens (pigeonhole-complete: if A is a suffix of B, their
    last 4 tokens coincide), verified by comparing space-joined token
    strings.  Mirror of :func:`registry_llm19.doc_prefix_containment`
    (same join shape, same verify, opposite end) — together they close
    the affix-redundancy family.  The population carries the
    deterministic tail-fragment augmentation (see _SUFFIX_SQL comment)
    so the gate exercises real suffix matches instead of certifying an
    empty set.

    Scale: one hash equi-join on the block key; the verify is a
    row-local string compare on the joined candidates — never
    all-pairs."""
    docs = t(spark, sf_dir, "documents")
    d0 = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("toks"))
    frags = (d0.filter((F.col("doc_id") % 9 == 0)
                       & (F.size("toks") >= 8))
             .select(
                 (F.col("doc_id") + _SUFFIX_FRAG_OFFSET).alias("doc_id"),
                 F.expr("slice(toks, size(toks) - size(toks) div 2 + 1, "
                        "size(toks) div 2)").alias("toks")))
    dk = (d0.unionByName(frags)
          .withColumn("n", F.size("toks"))
          .filter(F.col("n") >= 4)
          .withColumn("k", F.md5(F.concat_ws(
              " ", F.expr("slice(toks, -4, 4)")))))
    a = dk.select(F.col("doc_id").alias("contained_id"),
                  F.col("toks").alias("ta"), F.col("n").alias("na"), "k")
    b = dk.select(F.col("doc_id").alias("container_id"),
                  F.col("toks").alias("tb"), F.col("n").alias("nb"), "k")
    return (
        a.join(b, "k")
        .filter(F.col("na") < F.col("nb"))
        .filter(F.concat_ws(" ", F.col("ta"))
                == F.expr("concat_ws(' ', slice(tb, nb - na + 1, na))"))
        .select(
            "contained_id", "container_id",
            F.col("na").cast("long").alias("n_contained"),
            F.col("nb").cast("long").alias("n_container"),
            F.round(F.lit(1e4) * F.col("na") / F.col("nb")).cast("long")
            .alias("coverage_bp"),
        )
    )


# =========================================================================
# quality_score_calibration — NB margin quartiles x correctness/quality/dup
# =========================================================================

_CALIB_SQL = f"""
    WITH {_SHINGLES_CTE},
    {_NB_SCORED_CTES},
    rk AS (
        SELECT doc_id, true_source, cls, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, cls) AS rk
        FROM scored
    ),
    marg AS (
        SELECT a.doc_id, a.true_source, a.cls AS predicted,
               CAST(a.score - b.score AS BIGINT) AS margin
        FROM rk a JOIN rk b ON b.doc_id = a.doc_id
        WHERE a.rk = 1 AND b.rk = 2
    ),
    mq AS (
        SELECT doc_id, true_source, predicted, margin,
               NTILE(4) OVER (PARTITION BY true_source
                              ORDER BY margin DESC, doc_id) AS margin_q
        FROM marg
    ),
    gtoks AS (
        SELECT doc_id, tok FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents) WHERE tok <> ''
    ),
    gtc AS (SELECT doc_id, tok, COUNT(*) AS c FROM gtoks GROUP BY 1, 2),
    gm AS (
        SELECT doc_id, SUM(c) AS n_words, SUM(len(tok) * c) AS n_chars,
               COUNT(*) AS n_distinct, MAX(c) AS top_tok,
               SUM(CASE WHEN tok IN ('the', 'a') THEN c ELSE 0 END)
                   AS stop_hits
        FROM gtc GROUP BY 1
    ),
    gk AS (
        SELECT doc_id,
               CASE WHEN n_words BETWEEN 30 AND 2500
                     AND (n_chars * 100) // n_words BETWEEN 300 AND 1000
                     AND n_distinct * 5 > n_words
                     AND top_tok * 100 < n_words * 15
                     AND stop_hits >= 2
                THEN 1 ELSE 0 END AS keep
        FROM gm
    ),
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
    SELECT mq.true_source,
           CAST(mq.margin_q AS BIGINT) AS margin_q,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN mq.predicted = mq.true_source
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(SUM(COALESCE(gk.keep, 0)) AS BIGINT) AS n_keep,
           CAST(SUM(CASE WHEN dupd.doc_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           CAST(MIN(mq.margin) AS BIGINT) AS min_margin,
           CAST(MAX(mq.margin) AS BIGINT) AS max_margin
    FROM mq
    LEFT JOIN gk USING (doc_id)
    LEFT JOIN dupd USING (doc_id)
    GROUP BY 1, 2
"""


@register("quality_score_calibration", _CALIB_SQL)
def quality_score_calibration(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """Classifier-confidence calibration — see module docstring.  The
    margin is an exact BIGINT difference of the two top per-class
    integer scores (byte-shared with nb_source_classifier via
    registry_llm18._nb_scored, so the two gates can never disagree on
    a posterior); the quartile window partitions by true_source (the
    ccnet device — no global sort); gopher keep reuses
    registry_llm5._gopher_flags_core and dup membership reuses
    minhash_lsh_pairs, each a green gate's own construction."""
    from .operators.dedup import minhash_lsh_pairs
    from .registry_llm18 import _nb_scored
    from .registry_llm5 import _gopher_flags_core

    docs = t(spark, sf_dir, "documents")
    scored = _nb_scored(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cls"))
    rk = scored.withColumn("rk", F.row_number().over(w))
    a = (rk.filter(F.col("rk") == 1)
         .select("doc_id", "true_source",
                 F.col("cls").alias("predicted"),
                 F.col("score").alias("s1")))
    b = rk.filter(F.col("rk") == 2).select("doc_id",
                                           F.col("score").alias("s2"))
    marg = a.join(b, "doc_id").select(
        "doc_id", "true_source", "predicted",
        (F.col("s1") - F.col("s2")).cast("long").alias("margin"))
    wq = Window.partitionBy("true_source").orderBy(
        F.desc("margin"), F.asc("doc_id"))
    mq = marg.withColumn("margin_q", F.ntile(4).over(wq))
    gk = _gopher_flags_core(spark, sf_dir).select("doc_id", "keep")
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    dupd = (pairs.select(F.col("d1").alias("doc_id"))
            .unionAll(pairs.select(F.col("d2").alias("doc_id")))
            .distinct().withColumn("is_dup", F.lit(1)))
    correct = F.sum(F.when(F.col("predicted") == F.col("true_source"), 1)
                    .otherwise(0))
    return (
        mq.join(gk, "doc_id", "left")
        .join(dupd, "doc_id", "left")
        .groupBy("true_source", F.col("margin_q").cast("long")
                 .alias("margin_q"))
        .agg(F.count("*").cast("long").alias("n_docs"),
             correct.cast("long").alias("n_correct"),
             F.sum(F.coalesce("keep", F.lit(0))).cast("long")
             .alias("n_keep"),
             F.sum(F.when(F.col("is_dup").isNotNull(), 1).otherwise(0))
             .cast("long").alias("n_dup"),
             F.min("margin").cast("long").alias("min_margin"),
             F.max("margin").cast("long").alias("max_margin"))
    )


# =========================================================================
# source_lang_datasheet — crossed datasheet with full marginals
# =========================================================================

_DATASHEET_SQL = f"""
    WITH tk AS (
        SELECT source, lang, tok FROM (
            SELECT source, lang, unnest({_TOKS_DUCK}) AS tok
            FROM documents)
    ),
    base AS (
        SELECT source, lang, tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM tk GROUP BY 1, 2, 3
    ),
    lvl AS (
        SELECT source, lang, tok, c FROM base
        UNION ALL
        SELECT source, '<all>', tok, CAST(SUM(c) AS BIGINT)
        FROM base GROUP BY 1, 3
        UNION ALL
        SELECT '<all>', lang, tok, CAST(SUM(c) AS BIGINT)
        FROM base GROUP BY 2, 3
        UNION ALL
        SELECT '<all>', '<all>', tok, CAST(SUM(c) AS BIGINT)
        FROM base GROUP BY 3
    ),
    ag AS (
        SELECT source, lang,
               CAST(SUM(c) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS vocab,
               CAST(SUM(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1e6)
                                 AS BIGINT)) AS BIGINT) AS b
        FROM lvl GROUP BY 1, 2
    ),
    dc0 AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    ),
    dc AS (
        SELECT source, lang, n FROM dc0
        UNION ALL
        SELECT source, '<all>', CAST(SUM(n) AS BIGINT) FROM dc0 GROUP BY 1
        UNION ALL
        SELECT '<all>', lang, CAST(SUM(n) AS BIGINT) FROM dc0 GROUP BY 2
        UNION ALL
        SELECT '<all>', '<all>', CAST(SUM(n) AS BIGINT) FROM dc0
    )
    SELECT ag.source, ag.lang, dc.n AS n_docs,
           ag.total AS n_tokens, ag.vocab,
           CAST(round(ln(CAST(ag.total AS DOUBLE)) * 1e6) AS BIGINT)
           - CAST(round(CAST(ag.b AS DOUBLE) / ag.total) AS BIGINT)
               AS entropy_micro
    FROM ag JOIN dc USING (source, lang)
"""


@register("source_lang_datasheet", _DATASHEET_SQL)
def source_lang_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) crossed datasheet with marginals — see module
    docstring.  The rollup cascade re-aggregates the reduced
    (source, lang, tok) count frame (persisted once), never the token
    stream: at 100 TB the base reduction is the only stream-sized
    shuffle and each marginal costs a vocabulary-sized hash aggregate.
    Docs with zero non-empty tokens count in n_docs but contribute no
    tokens (and no ln terms) — both engines share the convention."""
    from .operators.materialize import scoped_persist

    docs = t(spark, sf_dir, "documents")
    tk = docs.select("source", "lang",
                     F.explode(F.expr(_TOKS_SPARK)).alias("tok"))
    base = scoped_persist(
        tk.groupBy("source", "lang", "tok")
        .agg(F.count("*").cast("long").alias("c")))
    all_ = F.lit("<all>")
    lvl = (
        base
        .unionByName(base.groupBy("source", "tok")
                     .agg(F.sum("c").cast("long").alias("c"))
                     .select("source", all_.alias("lang"), "tok", "c"))
        .unionByName(base.groupBy("lang", "tok")
                     .agg(F.sum("c").cast("long").alias("c"))
                     .select(all_.alias("source"), "lang", "tok", "c"))
        .unionByName(base.groupBy("tok")
                     .agg(F.sum("c").cast("long").alias("c"))
                     .select(all_.alias("source"), all_.alias("lang"),
                             "tok", "c"))
    )
    lnc = F.round(F.log(F.col("c").cast("double")) * 1e6).cast("long")
    ag = lvl.groupBy("source", "lang").agg(
        F.sum("c").cast("long").alias("total"),
        F.count("*").cast("long").alias("vocab"),
        F.sum(F.col("c") * lnc).cast("long").alias("b"))
    dc0 = docs.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("n"))
    dc = (
        dc0
        .unionByName(dc0.groupBy("source")
                     .agg(F.sum("n").cast("long").alias("n"))
                     .select("source", all_.alias("lang"), "n"))
        .unionByName(dc0.groupBy("lang")
                     .agg(F.sum("n").cast("long").alias("n"))
                     .select(all_.alias("source"), "lang", "n"))
        .unionByName(dc0.agg(F.sum("n").cast("long").alias("n"))
                     .select(all_.alias("source"), all_.alias("lang"),
                             "n"))
    )
    return ag.join(dc, ["source", "lang"]).select(
        "source", "lang",
        F.col("n").alias("n_docs"),
        F.col("total").alias("n_tokens"),
        "vocab",
        (F.round(F.log(F.col("total").cast("double")) * 1e6).cast("long")
         - F.round(F.col("b").cast("double") / F.col("total")).cast("long"))
        .alias("entropy_micro"),
    )
