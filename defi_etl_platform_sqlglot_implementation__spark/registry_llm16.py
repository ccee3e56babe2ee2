"""Coverage wave 16 — cross-modal dedup, DoReMi-style source
reweighting, and granularity-parameterized exact-substring dedup.

The three gates close the highest-leverage gaps VERDICT r7 named in the
LLM-pipeline surface:

- ``cross_modal_dedup``: image/caption pairs deduplicate as a UNIT —
  the aHash near-dup graph over the synthetic image bytes (the
  registry_media chain) and the caption MinHash near-dup graph (the
  dedup_clusters chain) union into ONE edge set, resolve to connected
  components, and produce a single per-document keep decision plus the
  modality that caused it.  This is the LAION-style rule: a pair is a
  duplicate if EITHER modality says so (visual near-dups with rewritten
  alt-text, and verbatim captions on re-encoded images, both fold).

- ``doremi_source_weights``: excess-loss-driven mixture reweighting in
  the spirit of DoReMi (Xie et al. 2023, arXiv:2305.10429) — composes
  the two published devices end-to-end: the held-out bigram NLL
  (registry_llm12's train-split LM, here scored PER SOURCE) supplies
  per-domain loss, the temperature-weighted base distribution
  (registry_llm9/11's sqrt fold) supplies the prior, and one
  multiplicative-weights step reprices the mixture toward
  higher-excess-loss sources.  The update is the FIRST-ORDER
  exponentiated-gradient step, w_s ∝ base_s · max(0, 1 + excess_s)
  (exp(x) ≈ 1+x): deliberate, because IEEE-754 guarantees correct
  rounding for +,*,/,sqrt but NOT exp, so the exp form could diverge
  across engines by an ulp and flip a rounded basis point — the linear
  step keeps the whole gate in policy class 1 (bit-exact).

- ``dup_span_granularity``: the Lee et al. 2022 exact-substring span
  discovery (registry_llm3's ``substring_dup_spans``) generalized over
  the match-length knob n — the paper's min-match-length hyperparameter
  — and run at n=6 and n=12 side by side, so the pipeline can PRICE the
  granularity choice (shorter n → more, shorter spans clipped; the gate
  emits both inventories keyed by n).

Scale shapes (100 TB): cross-modal adds ONE union of two
already-bucketed pair streams + the bounded-shuffle CC — no new
quadratic; DoReMi is two hash aggregates to |sources| rows and a
driver-sized ordered fold (the wave-9 device); the span sweep is the
substring-dedup shingle shuffle run per n (linear in tokens per n, same
cost class as MinHash).

Reference scope: composes the reference's aggregation surface
(src/transform/etl_pipeline.py groupbys) with the LLM-pipeline
extension; no counterpart file exists — cited per SURVEY §6 as a scale
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm import _SHINGLES_CTE
from .registry_llm6 import _SPLIT_CASE_DUCK, _split_col
from .registry_llm9 import _PER_SRC_DEN_CTES, _per_src_den
from .registry_media import _IMAGE_HASH_CTES


# =========================================================================
# cross-modal dedup — image aHash graph ∪ caption MinHash graph → one keep
# =========================================================================

_CROSS_MODAL_SQL = f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_IMAGE_HASH_CTES},
    -- caption near-dups: exact word-3-gram Jaccard >= 0.5 (the
    -- dedup_clusters truth — minhash_lsh_pairs verifies candidates at
    -- exactly this predicate, so Spark and oracle agree by construction)
    tpairs AS (
        SELECT d1, d2
        FROM ipair
        JOIN sz sa ON sa.doc_id = d1
        JOIN sz sb ON sb.doc_id = d2
        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 5e-1
    ),
    -- image near-dups: 64-bit aHash Hamming <= 3 (brute-force here;
    -- Spark uses the pigeonhole-complete banded join)
    ipairs AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2
        FROM h a JOIN h b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.band0, b.band0))
            + bit_count(xor(a.band1, b.band1))
            + bit_count(xor(a.band2, b.band2))
            + bit_count(xor(a.band3, b.band3)) <= 3
    ),
    edges AS (SELECT d1, d2 FROM tpairs UNION SELECT d1, d2 FROM ipairs),
    symm AS (
        SELECT d1 AS a, d2 AS b FROM edges
        UNION
        SELECT d2 AS a, d1 AS b FROM edges
    ),
    reach(src, dst) AS (
        SELECT DISTINCT a, a FROM symm
        UNION
        SELECT r.src, s.b FROM reach r JOIN symm s ON s.a = r.dst
    ),
    lbl AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
            FROM reach GROUP BY src),
    imgd AS (SELECT DISTINCT doc_id FROM (
        SELECT d1 AS doc_id FROM ipairs UNION ALL SELECT d2 FROM ipairs)),
    txtd AS (SELECT DISTINCT doc_id FROM (
        SELECT d1 AS doc_id FROM tpairs UNION ALL SELECT d2 FROM tpairs))
    SELECT d.doc_id,
           CAST(COALESCE(l.cluster_id, d.doc_id) AS BIGINT) AS joint_cluster,
           COALESCE(l.cluster_id, d.doc_id) = d.doc_id AS keep,
           i.doc_id IS NOT NULL AS img_dup,
           x.doc_id IS NOT NULL AS txt_dup,
           CASE WHEN i.doc_id IS NOT NULL AND x.doc_id IS NOT NULL
                THEN 'both'
                WHEN i.doc_id IS NOT NULL THEN 'image'
                WHEN x.doc_id IS NOT NULL THEN 'text'
                ELSE 'none' END AS modality
    FROM documents d
    LEFT JOIN lbl l USING (doc_id)
    LEFT JOIN imgd i USING (doc_id)
    LEFT JOIN txtd x USING (doc_id)
"""


@register("cross_modal_dedup", _CROSS_MODAL_SQL)
def cross_modal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One keep decision per (image, caption) document from BOTH
    modalities' near-dup graphs — see module docstring.  Composes the
    exact operators its two halves already gate (``image_ahash_pairs``'s
    banded signature join, ``dedup_clusters``' LSH-verified caption
    pairs, ``connected_components``): this gate cannot disagree with the
    per-modality dedups it fuses.

    Scale: both pair streams are banded/bucketed (never all-pairs); the
    union adds one map-side concat; CC is the bounded-shuffle
    min-label loop.  The oracle brute-forces both pair sets and walks a
    recursive closure — sf-scale only, like every CC oracle here.

    Each pair stream feeds TWO plan branches (the CC edge union and its
    modality-tag doc set), so both are query-scoped persisted — without
    it the banded candidate joins re-execute per branch (and the edge
    list is tiny next to the joins that produce it)."""
    from .operators.dedup import connected_components, minhash_lsh_pairs
    from .operators.materialize import scoped_persist_all
    from .operators.media_dedup import ahash_near_pairs, image_ahash_signatures

    docs = t(spark, sf_dir, "documents")
    # the two modalities' pair streams are independent plans over
    # disjoint persisted subtrees — fill both caches concurrently so
    # the second stream's stages back-fill the first's tail (§2.6)
    img, txt = scoped_persist_all([
        ahash_near_pairs(image_ahash_signatures(docs), max_hamming=3)
        .select(F.col("doc_a").alias("d1"), F.col("doc_b").alias("d2")),
        minhash_lsh_pairs(docs, threshold=0.5).select("d1", "d2"),
    ])
    edges = img.unionAll(txt)
    cc = connected_components(edges).withColumnRenamed("node", "doc_id")
    img_docs = (
        img.select(F.col("d1").alias("doc_id"))
        .unionAll(img.select(F.col("d2").alias("doc_id")))
        .distinct().withColumn("img_dup", F.lit(True))
    )
    txt_docs = (
        txt.select(F.col("d1").alias("doc_id"))
        .unionAll(txt.select(F.col("d2").alias("doc_id")))
        .distinct().withColumn("txt_dup", F.lit(True))
    )
    out = (
        docs.select("doc_id")
        .join(cc, "doc_id", "left")
        .join(img_docs, "doc_id", "left")
        .join(txt_docs, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).cast("long")
             .alias("joint_cluster"),
            (F.coalesce("cluster_id", F.col("doc_id")) == F.col("doc_id"))
            .alias("keep"),
            F.coalesce("img_dup", F.lit(False)).alias("img_dup"),
            F.coalesce("txt_dup", F.lit(False)).alias("txt_dup"),
        )
    )
    return out.withColumn(
        "modality",
        F.when(F.col("img_dup") & F.col("txt_dup"), "both")
         .when(F.col("img_dup"), "image")
         .when(F.col("txt_dup"), "text")
         .otherwise("none"),
    )


# =========================================================================
# DoReMi-style source reweighting — excess held-out loss reprices the mix
# =========================================================================

_DOREMI_SQL = f"""
    WITH {_PER_SRC_DEN_CTES},
    tf AS (
        SELECT doc_id, source,
               {_SPLIT_CASE_DUCK.format(id='doc_id')} AS split,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ),
    pos AS (
        SELECT source, split, toks, unnest(range(1, len(toks))) AS i
        FROM tf WHERE len(toks) >= 2
    ),
    bg AS (SELECT source, split, toks[i] AS a, toks[i + 1] AS b FROM pos),
    cab AS (SELECT a, b, COUNT(*) AS n_ab FROM bg
            WHERE split = 'train' GROUP BY 1, 2),
    ca  AS (SELECT a, COUNT(*) AS n_a FROM bg
            WHERE split = 'train' GROUP BY 1),
    vt AS (
        SELECT CAST(COUNT(DISTINCT tk) AS BIGINT) AS v
        FROM (SELECT unnest(toks) AS tk FROM tf WHERE split = 'train')
    ),
    srcstats AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_heldout_bigrams,
               CAST(-SUM(CAST(round(ln(
                   CAST(COALESCE(cab.n_ab, 0) + 1 AS DOUBLE)
                   / CAST(COALESCE(ca.n_a, 0) + vt.v AS DOUBLE)) * 1e6)
                   AS BIGINT)) AS BIGINT) AS nll_micro_total
        FROM bg
        LEFT JOIN cab USING (a, b)
        LEFT JOIN ca USING (a)
        CROSS JOIN vt
        WHERE split <> 'train'
        GROUP BY source
    ),
    tots AS (
        SELECT CAST(SUM(n_heldout_bigrams) AS BIGINT) AS tn,
               CAST(SUM(nll_micro_total) AS BIGINT) AS tnll
        FROM srcstats
    ),
    scored AS (
        SELECT p.source, p.n_tokens,
               COALESCE(s.n_heldout_bigrams, 0) AS n_heldout_bigrams,
               COALESCE(s.nll_micro_total, 0) AS nll_micro_total,
               CASE WHEN COALESCE(s.n_heldout_bigrams, 0) = 0 THEN 0
                    ELSE CAST(ROUND(CAST(s.nll_micro_total AS DOUBLE)
                                    / s.n_heldout_bigrams) AS BIGINT)
                    END AS mean_nll_micro,
               CAST(ROUND(CAST(t.tnll AS DOUBLE) / t.tn) AS BIGINT)
                   AS corpus_nll_micro
        FROM per_src p
        LEFT JOIN srcstats s USING (source)
        CROSS JOIN tots t
    ),
    fac AS (
        SELECT source, n_tokens, n_heldout_bigrams, nll_micro_total,
               mean_nll_micro,
               CASE WHEN n_heldout_bigrams = 0 THEN 0
                    ELSE mean_nll_micro - corpus_nll_micro
                    END AS excess_micro,
               GREATEST(0, 1000000 + CASE WHEN n_heldout_bigrams = 0
                        THEN 0 ELSE mean_nll_micro - corpus_nll_micro END)
                   AS factor_micro
        FROM scored
    ),
    wsum AS (
        SELECT list_reduce(
                   list_transform(
                       LIST(struct_pack(source := source,
                                        u := sqrt(CAST(n_tokens AS DOUBLE))
                                             * CAST(factor_micro AS DOUBLE))
                            ORDER BY source),
                       x -> x.u),
                   (a, b) -> a + b) AS usum
        FROM fac
    )
    SELECT f.source, f.n_tokens, f.n_heldout_bigrams, f.nll_micro_total,
           f.mean_nll_micro, f.excess_micro, f.factor_micro,
           CAST(ROUND(1.0e4 * ((sqrt(CAST(f.n_tokens AS DOUBLE))
                                * CAST(f.factor_micro AS DOUBLE)) / w.usum))
                AS BIGINT) AS weight_bp
    FROM fac f, wsum w
"""


@register("doremi_source_weights", _DOREMI_SQL)
def doremi_source_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess-loss-driven mixture weights per source — see module
    docstring for the DoReMi framing and the deliberate first-order
    (exp-free) update.  Composes the published devices verbatim: the
    llm6 md5 split, the llm12 train-split Laplace bigram LM with
    per-bigram micro-nat quantization (order-free BIGINT sums), the
    llm9 sqrt-temperature base via the ordered sqrt fold.  excess_micro
    = per-source held-out mean NLL minus the bigram-weighted corpus
    mean (so token-share-weighted excess ≈ 0); factor = max(0, 1 +
    excess) in micro units; weight_bp = the repriced, renormalized
    mixture in basis points.

    Floats: sqrt/*/÷ are IEEE-correctly-rounded over bit-identical
    inputs; the one cross-source double sum runs as the wave-9 ordered
    fold on BOTH engines — bit-identical, policy class 1.  A zero
    denominator (all factors zero) would divide to NaN and fail the
    cast LOUDLY on both engines — unreachable while any source has
    n_tokens > 0, because mean-centered excess cannot be <= -1 for
    every source simultaneously.

    Scale: two hash aggregates to |sources| rows, one broadcast scalar,
    one driver-sized ordered fold — the corpus shuffles once for bigram
    counts (Zipf-bounded count tables), exactly the
    heldout_bigram_perplexity cost."""
    docs = t(spark, sf_dir, "documents").withColumn("split", _split_col())
    per_src, _ = _per_src_den(docs)
    tf = docs.select(
        "doc_id", "source", "split",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("toks"))
    bg = tf.filter(F.size("toks") >= 2).select(
        "source", "split",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS a,"
                "             element_at(toks, i + 1) AS b))"
            )
        ).alias("p"),
    ).select("source", "split", F.col("p.a").alias("a"),
             F.col("p.b").alias("b"))
    tr = bg.filter(F.col("split") == "train")
    cab = tr.groupBy("a", "b").agg(F.count("*").alias("n_ab"))
    ca = tr.groupBy("a").agg(F.count("*").alias("n_a"))
    vt = (
        tf.filter(F.col("split") == "train")
        .select(F.explode("toks").alias("tk"))
        .agg(F.countDistinct("tk").cast("long").alias("v"))
    )
    lp = F.round(F.log(
        (F.coalesce(F.col("n_ab"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("n_a"), F.lit(0)) + F.col("v")).cast("double")
    ) * 1e6).cast("long")
    srcstats = (
        bg.filter(F.col("split") != "train")
        .join(cab, ["a", "b"], "left")
        .join(ca, "a", "left")
        .crossJoin(F.broadcast(vt))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_heldout_bigrams"),
            (-F.sum(lp)).cast("long").alias("nll_micro_total"),
        )
    )
    tots = srcstats.agg(
        F.sum("n_heldout_bigrams").cast("long").alias("tn"),
        F.sum("nll_micro_total").cast("long").alias("tnll"),
    )
    scored = (
        per_src.join(srcstats, "source", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "source", "n_tokens",
            F.coalesce("n_heldout_bigrams", F.lit(0)).cast("long")
             .alias("n_heldout_bigrams"),
            F.coalesce("nll_micro_total", F.lit(0)).cast("long")
             .alias("nll_micro_total"),
            F.when(F.coalesce("n_heldout_bigrams", F.lit(0)) == 0, F.lit(0))
             .otherwise(F.round(F.col("nll_micro_total").cast("double")
                                / F.col("n_heldout_bigrams")))
             .cast("long").alias("mean_nll_micro"),
            F.round(F.col("tnll").cast("double") / F.col("tn"))
             .cast("long").alias("corpus_nll_micro"),
        )
    )
    excess = F.when(F.col("n_heldout_bigrams") == 0, F.lit(0)) \
        .otherwise(F.col("mean_nll_micro") - F.col("corpus_nll_micro")) \
        .cast("long")
    fac = scored.select(
        "source", "n_tokens", "n_heldout_bigrams", "nll_micro_total",
        "mean_nll_micro",
        excess.alias("excess_micro"),
        F.greatest(F.lit(0).cast("long"),
                   F.lit(1000000) + excess).cast("long")
         .alias("factor_micro"),
    )
    u = F.sqrt(F.col("n_tokens").cast("double")) \
        * F.col("factor_micro").cast("double")
    wsum = fac.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("source", u.alias("u")))),
            F.lit(0.0),
            lambda acc, x: acc + x["u"],
        ).alias("usum")
    )
    return fac.crossJoin(F.broadcast(wsum)).select(
        "source", "n_tokens", "n_heldout_bigrams", "nll_micro_total",
        "mean_nll_micro", "excess_micro", "factor_micro",
        F.round(F.lit(1.0e4) * (u / F.col("usum"))).cast("long")
         .alias("weight_bp"),
    )


# =========================================================================
# granularity-parameterized exact-substring dedup (Lee et al. min-match n)
# =========================================================================

def _span_ctes(n: int, sfx: str) -> str:
    """The registry_llm3 _DUP_SHINGLE_CTES chain parameterized over the
    match length n (tokens per window), CTE names suffixed for
    side-by-side composition."""
    return f"""sh{sfx} AS (
        SELECT doc_id, i AS pos, array_to_string(l[i:i+{n - 1}], ' ') AS s
        FROM toks, LATERAL unnest(range(1, len(l) - {n - 2})) AS t(i)
        WHERE len(l) >= {n}
    ),
    dups{sfx} AS (
        SELECT s FROM sh{sfx} GROUP BY s HAVING COUNT(DISTINCT doc_id) > 1
    ),
    hits{sfx} AS (SELECT sh{sfx}.doc_id, sh{sfx}.pos
                  FROM sh{sfx} JOIN dups{sfx} USING (s)),
    isl{sfx} AS (
        SELECT doc_id, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS grp
        FROM hits{sfx}
    ),
    spans{sfx} AS (
        SELECT CAST({n} AS BIGINT) AS n, doc_id,
               CAST(MIN(pos) AS BIGINT) AS span_start,
               CAST(MAX(pos) + {n - 1} AS BIGINT) AS span_end,
               CAST(MAX(pos) + {n - 1} - MIN(pos) + 1 AS BIGINT)
                   AS span_tokens
        FROM isl{sfx} GROUP BY doc_id, grp
    )"""


def dup_token_spans(docs: DataFrame, n: int) -> DataFrame:
    """Maximal cross-document duplicated token spans at match length
    ``n`` — the registry_llm3 ``substring_dup_spans`` pipeline (fixed
    n=8 there; cf. Lee et al. 2022's min-match-length hyperparameter)
    exposed as a generic operator: n-token shingles with positions
    (row-local transform), cross-doc duplicated shingles (one shuffle
    on the shingle), gaps-and-islands merge to maximal spans (one
    per-doc window).  Returns (n, doc_id, span_start, span_end,
    span_tokens); positions are 1-based token indices."""
    if n < 2:
        raise ValueError(f"dup_token_spans: match length n={n} must be >= 2")
    toks = docs.select("doc_id", F.split("text", " ").alias("l"))
    sh = (
        toks.filter(F.size("l") >= n)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(l) - {n - 1}),"
                    f" i -> concat_ws(' ', slice(l, i, {n})))"
                )
            ).alias("pos0", "s"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "s")
    )
    dups = (
        sh.groupBy("s")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("s")
    )
    hits = sh.join(dups, "s").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + (n - 1)).cast("long").alias("span_end"),
            (F.max("pos") + (n - 1) - F.min("pos") + 1).cast("long")
             .alias("span_tokens"),
        )
        .select(F.lit(n).cast("long").alias("n"), "doc_id",
                "span_start", "span_end", "span_tokens")
    )


@register(
    "dup_span_granularity",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    {_span_ctes(6, '6')},
    {_span_ctes(12, '12')}
    SELECT * FROM spans6
    UNION ALL
    SELECT * FROM spans12
    """,
)
def dup_span_granularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The min-match-length sweep: exact duplicated-span inventories at
    n=6 and n=12 in one result, keyed by n — shorter n finds more and
    shorter spans (every n=12 span contains an n=6 span, never the
    reverse; test_llm16 pins the containment).  Lets a curation run
    price the Lee et al. granularity knob before committing a clip
    pass.  Scale: one shingle shuffle per n over the same tokenized
    scan; each is the substring_dup_spans cost."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return dup_token_spans(docs, 6).unionAll(dup_token_spans(docs, 12))
