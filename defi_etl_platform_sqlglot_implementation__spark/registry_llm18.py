"""Coverage wave 18 — the model-shaped curation stages: a trained
source classifier, a random-projection (JL) retrieval sketch, and
span-level alignment of near-dup pairs.

- ``nb_source_classifier``: the model-based quality-filter family
  (fastText/CCNet-style classifier filtering) in its exactly-replayable
  form — a Laplace-smoothed multinomial naive-Bayes classifier over
  whitespace tokens, TRAINED on the train split (the llm6 md5 split
  device, so it can never disagree with the split assignment) and
  evaluated on every val/test doc.  Per-token log-likelihoods and the
  class priors are micro-nat quantized BIGINTs (the doc_bigram_logprob
  device), so per-(doc, class) scores are order-free integer sums and
  the argmax (score DESC, class ASC tie-break) is integer-exact on both
  engines.  Output: the confusion matrix (true_source,
  predicted_source, n_docs).

- ``random_projection_recall``: the Johnson-Lindenstrauss member of the
  vector-compression toolkit next to IVF routing, PQ codes, and SQ8 —
  a 64→16 signed (Rademacher ±1) projection with its retrieval cost
  priced as recall@10 against the exact ``similarity_topk`` truth.
  The projection matrix is the frozen md5-seeded plane family the LSH
  gate already embeds cross-engine (``rademacher_planes``, fresh tag),
  each projected coordinate is one left-assoc fold-order dot product
  (bit-exact — the similarity_topk device), and recall_bp = 1000·hits
  is pure integer.

- ``pair_alignment_spans``: WHERE two near-dups overlap, not just
  whether — for every exact-Jaccard>=0.5 pair (the inventory the dedup
  gates verify), positional 3-gram matches are grouped by diagonal
  (pos1 − pos2) and merged gaps-and-islands style into aligned runs:
  per pair, the match count, the number of distinct diagonals, and the
  longest aligned run in tokens (the Lee-et-al-style span evidence that
  separates a verbatim block copy from scattered phrase reuse).

Scale shapes: the classifier is two Zipf-bounded train-count aggregates
+ one broadcast class fan-out (|classes| rows) over the held-out token
stream — the heldout_bigram_perplexity shape with a 20-way class
dimension; the projection is map-only per vector (16 fused dot chains)
with the 5-query probe a broadcast attach; the alignment join is keyed
on (doc, shingle) and semi-reduced to the pair inventory's docs first,
so its cost scales with the candidate set, never the corpus.

Reference scope: composes the reference's aggregation surface
(src/transform/etl_pipeline.py groupbys) with the LLM-pipeline
extension; no counterpart file exists — cited per SURVEY §6 as a scale
extension.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm import _SHINGLES_CTE, _dot_chain, DIM
from .registry_llm6 import _SPLIT_CASE_DUCK as _SPLIT
from .registry_llm6 import _split_col

_N_PROJ = 16       # JL target dimensionality (64 -> 16: 4x compression)
_RP_TAG = "rp18"   # fresh plane family — independent of the LSH tables
_TOPK = 10


# =========================================================================
# naive-Bayes source classifier — confusion matrix on the held-out split
# =========================================================================

# The CTE chain up to the per-(doc, class) integer score frame
# ``scored`` — shared verbatim by nb_source_classifier (argmax ->
# confusion matrix) and registry_llm32.quality_score_calibration
# (top1-top2 margin -> calibration buckets), so the two gates can never
# disagree about a posterior score.
_NB_SCORED_CTES = f"""
    tf AS (
        SELECT doc_id, source,
               {_SPLIT.format(id='doc_id')} AS split,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ),
    tkn AS (SELECT doc_id, source, split, unnest(toks) AS tok FROM tf),
    cst AS (SELECT source AS cls, tok, CAST(COUNT(*) AS BIGINT) AS n_st
            FROM tkn WHERE split = 'train' GROUP BY 1, 2),
    nst AS (SELECT source AS cls, CAST(COUNT(*) AS BIGINT) AS n_s
            FROM tkn WHERE split = 'train' GROUP BY 1),
    vt AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
           FROM tkn WHERE split = 'train'),
    dtr AS (SELECT source AS cls, CAST(COUNT(*) AS BIGINT) AS n_docs_s
            FROM tf WHERE split = 'train' GROUP BY 1),
    ntr AS (SELECT CAST(SUM(n_docs_s) AS BIGINT) AS n FROM dtr),
    cls AS (
        SELECT d.cls, d.n_docs_s, COALESCE(s.n_s, 0) AS n_s
        FROM dtr d LEFT JOIN nst s USING (cls)
    ),
    pri AS (
        SELECT c.cls, c.n_s,
               CAST(round(1e6 * ln(CAST(c.n_docs_s AS DOUBLE)
                                   / CAST(t.n AS DOUBLE))) AS BIGINT)
                   AS prior_micro
        FROM cls c CROSS JOIN ntr t
    ),
    cdt AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM tkn WHERE split <> 'train' GROUP BY 1, 2),
    sc AS (
        SELECT cdt.doc_id, p.cls,
               CAST(SUM(cdt.c * CAST(round(1e6 * ln(
                   CAST(COALESCE(cst.n_st, 0) + 1 AS DOUBLE)
                   / CAST(p.n_s + vt.v AS DOUBLE))) AS BIGINT)) AS BIGINT)
                   AS tok_score
        FROM cdt
        CROSS JOIN pri p
        CROSS JOIN vt
        LEFT JOIN cst ON cst.cls = p.cls AND cst.tok = cdt.tok
        GROUP BY 1, 2
    ),
    vd AS (SELECT doc_id, source AS true_source
           FROM tf WHERE split <> 'train'),
    scored AS (
        SELECT vd.doc_id, vd.true_source, p.cls,
               p.prior_micro + COALESCE(sc.tok_score, 0) AS score
        FROM vd
        CROSS JOIN pri p
        LEFT JOIN sc ON sc.doc_id = vd.doc_id AND sc.cls = p.cls
    )
"""

_NB_SQL = f"""
    WITH {_NB_SCORED_CTES},
    pred AS (
        SELECT true_source, cls,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, cls) AS rk
        FROM scored
    )
    SELECT true_source, cls AS predicted_source,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred WHERE rk = 1
    GROUP BY 1, 2
"""


def _nb_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-(held-out doc, class) integer NB score frame (doc_id,
    true_source, cls, score) — the Spark twin of ``_NB_SCORED_CTES``,
    factored out so nb_source_classifier and
    registry_llm32.quality_score_calibration share one scoring
    construction (cross-gate agreement by byte-sharing).  The class
    fan-out (every held-out (doc, tok) count scored against every train
    class) is a broadcast of the |classes|-row prior table; the
    per-class token likelihood attach is a LEFT equi-join on (cls, tok)
    against the Zipf-bounded train count table; unseen (cls, tok) pairs
    cost round(1e6·ln(1/(n_s+V)))·c, never −inf."""
    docs = t(spark, sf_dir, "documents").withColumn("split", _split_col())
    tf = docs.select(
        "doc_id", "source", "split",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("toks"))
    tkn = tf.select("doc_id", "source", "split",
                    F.explode("toks").alias("tok"))
    tr = tkn.filter(F.col("split") == "train")
    cst = tr.groupBy(F.col("source").alias("cls"), "tok") \
            .agg(F.count("*").cast("long").alias("n_st"))
    nst = tr.groupBy(F.col("source").alias("cls")) \
            .agg(F.count("*").cast("long").alias("n_s"))
    vt = tr.agg(F.countDistinct("tok").cast("long").alias("v"))
    dtr = (tf.filter(F.col("split") == "train")
           .groupBy(F.col("source").alias("cls"))
           .agg(F.count("*").cast("long").alias("n_docs_s")))
    ntr = dtr.agg(F.sum("n_docs_s").cast("long").alias("n"))
    cls = dtr.join(nst, "cls", "left").select(
        "cls", "n_docs_s",
        F.coalesce("n_s", F.lit(0)).cast("long").alias("n_s"))
    pri = cls.crossJoin(F.broadcast(ntr)).select(
        "cls", "n_s",
        F.round(F.lit(1e6) * F.log(
            F.col("n_docs_s").cast("double") / F.col("n").cast("double")))
        .cast("long").alias("prior_micro"),
    )
    cdt = (tkn.filter(F.col("split") != "train")
           .groupBy("doc_id", "tok")
           .agg(F.count("*").cast("long").alias("c")))
    lp = F.round(F.lit(1e6) * F.log(
        (F.coalesce(F.col("n_st"), F.lit(0)) + 1).cast("double")
        / (F.col("n_s") + F.col("v")).cast("double"))).cast("long")
    sc = (
        cdt.crossJoin(F.broadcast(pri))
        .crossJoin(F.broadcast(vt))
        .join(cst, ["cls", "tok"], "left")
        .groupBy("doc_id", "cls")
        .agg(F.sum(F.col("c") * lp).cast("long").alias("tok_score"))
    )
    vd = (tf.filter(F.col("split") != "train")
          .select("doc_id", F.col("source").alias("true_source")))
    return (
        vd.crossJoin(F.broadcast(pri.select("cls", "prior_micro")))
        .join(sc, ["doc_id", "cls"], "left")
        .select(
            "doc_id", "true_source", "cls",
            (F.col("prior_micro")
             + F.coalesce("tok_score", F.lit(0))).alias("score"))
    )


@register("nb_source_classifier", _NB_SQL)
def nb_source_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes source classifier, trained on the train
    split, evaluated on every val/test doc — see module docstring and
    :func:`_nb_scored` for the integer-exactness argument; this gate is
    the argmax (score DESC, class ASC) of the shared score frame,
    reduced to the confusion matrix."""
    scored = _nb_scored(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cls"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .groupBy("true_source", F.col("cls").alias("predicted_source"))
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


# =========================================================================
# random-projection (JL) retrieval sketch — recall@10 vs the exact truth
# =========================================================================

def _rp_planes() -> list[list[float]]:
    from .operators.similarity import rademacher_planes

    return rademacher_planes(1, _N_PROJ, DIM, tag=_RP_TAG)[0]


def _rp_sql() -> str:
    planes = _rp_planes()

    def chain(j: int) -> str:
        return " + ".join(
            f"CAST(e.embedding[{i + 1}] AS DOUBLE) * {planes[j][i]:.1f}"
            for i in range(DIM))

    proj_cols = ",\n               ".join(
        f"({chain(j)}) AS p{j}" for j in range(_N_PROJ))
    norm_chain = " + ".join(f"p{j} * p{j}" for j in range(_N_PROJ))
    pdot_chain = " + ".join(
        f"q.q_p{j} * a.p{j}" for j in range(_N_PROJ))
    q_cols = ", ".join(f"p{j} AS q_p{j}" for j in range(_N_PROJ))
    return f"""
    WITH pe AS (
        SELECT vec_id,
               {proj_cols}
        FROM embeddings e
    ),
    pn AS (SELECT *, sqrt({norm_chain}) AS pnorm FROM pe),
    q AS (SELECT vec_id AS query_id, {q_cols}, pnorm AS qnorm
          FROM pn WHERE vec_id < 5),
    cand AS (
        SELECT q.query_id, a.vec_id AS neighbor_id,
               ({pdot_chain}) / (q.qnorm * a.pnorm) AS psim
        FROM q, pn a WHERE a.vec_id <> q.query_id
    ),
    pr AS (SELECT query_id, neighbor_id,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY psim DESC, neighbor_id) AS rk
           FROM cand),
    ptop AS (SELECT query_id, neighbor_id, 1 AS hit
             FROM pr WHERE rk <= {_TOPK}),
    tq AS (SELECT vec_id AS query_id, embedding
           FROM embeddings WHERE vec_id < 5),
    tp AS (
        SELECT tq.query_id, e.vec_id AS neighbor_id,
               ({_dot_chain('tq', 'e')})
               / (sqrt({_dot_chain('tq', 'tq')})
                  * sqrt({_dot_chain('e', 'e')})) AS cosine
        FROM tq, embeddings e WHERE e.vec_id <> tq.query_id
    ),
    trk AS (SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, neighbor_id)
                       AS rk
            FROM tp),
    truth AS (SELECT query_id, neighbor_id FROM trk WHERE rk <= {_TOPK})
    SELECT t.query_id,
           CAST(COUNT(p.hit) AS BIGINT) AS n_hits,
           CAST(COUNT(p.hit) * 1000 AS BIGINT) AS recall_bp
    FROM truth t
    LEFT JOIN ptop p USING (query_id, neighbor_id)
    GROUP BY 1
    """


@register("random_projection_recall", _rp_sql())
def random_projection_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss retrieval sketch priced in recall@10: every
    vector is projected 64→16 through the frozen Rademacher plane family
    (each coordinate one bit-exact fold-order dot product — the LSH
    plane device), the 5 standing queries are searched brute-force in
    the PROJECTED space (projected cosine, tie-break neighbor_id), and
    the projected top-10 is scored against the exact similarity_topk
    truth.  recall_bp = 1000·n_hits — pure integer output.

    Scale: the projection is map-only (16 fused chains per row, 4×
    compression before any shuffle); the probe side is a broadcast of
    the 5 projected queries; at 100 TB the projected table is the input
    the IVF/LSH machinery indexes instead of the raw vectors."""
    from .operators.similarity import _plane_dot, cosine_topk

    planes = _rp_planes()
    e = t(spark, sf_dir, "embeddings")
    pe = e.select(
        "vec_id",
        *[_plane_dot("embedding", p).alias(f"p{j}")
          for j, p in enumerate(planes)])
    norm_sq = reduce(lambda a, b: a + b,
                     [F.col(f"p{j}") * F.col(f"p{j}")
                      for j in range(_N_PROJ)])
    pn = pe.withColumn("pnorm", F.sqrt(norm_sq))
    q = pn.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        *[F.col(f"p{j}").alias(f"q_p{j}") for j in range(_N_PROJ)],
        F.col("pnorm").alias("qnorm"))
    pdot = reduce(lambda a, b: a + b,
                  [F.col(f"q_p{j}") * F.col(f"p{j}")
                   for j in range(_N_PROJ)])
    cand = pn.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")) \
             .select("query_id", F.col("vec_id").alias("neighbor_id"),
                     (pdot / (F.col("qnorm") * F.col("pnorm"))).alias("psim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("psim"),
                                               F.asc("neighbor_id"))
    ptop = (cand.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _TOPK)
            .select("query_id", "neighbor_id", F.lit(1).alias("hit")))
    truth = cosine_topk(e, e.filter(F.col("vec_id") < 5), k=_TOPK) \
        .select("query_id", "neighbor_id")
    return (
        truth.join(ptop, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count("hit").cast("long").alias("n_hits"),
             (F.count("hit") * 1000).cast("long").alias("recall_bp"))
    )


# =========================================================================
# near-dup pair alignment — diagonal gaps-and-islands over positional
# 3-gram matches
# =========================================================================

_ALIGN_SQL = f"""
    WITH {_SHINGLES_CTE},
    pairs AS (
        SELECT d1, d2
        FROM ipair
        JOIN sz sa ON sa.doc_id = d1
        JOIN sz sb ON sb.doc_id = d2
        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 5e-1
    ),
    tl AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    pp AS (SELECT doc_id, l,
                  unnest(range(1, greatest(1, len(l) - 2) + 1)) AS i
           FROM tl),
    psh AS (SELECT doc_id, i AS pos,
                   array_to_string(l[i:i+2], ' ') AS s
            FROM pp),
    m AS (
        SELECT p.d1, p.d2, a.pos AS pos1, b.pos AS pos2
        FROM pairs p
        JOIN psh a ON a.doc_id = p.d1
        JOIN psh b ON b.doc_id = p.d2 AND b.s = a.s
    ),
    r AS (
        SELECT d1, d2, pos1 - pos2 AS diag, pos1,
               ROW_NUMBER() OVER (PARTITION BY d1, d2, pos1 - pos2
                                  ORDER BY pos1) AS rn
        FROM m
    ),
    runs AS (
        SELECT d1, d2, diag, pos1 - rn AS grp,
               CAST(COUNT(*) AS BIGINT) AS run_len
        FROM r GROUP BY 1, 2, 3, 4
    )
    SELECT d1, d2,
           CAST(SUM(run_len) AS BIGINT) AS n_matches,
           CAST(COUNT(DISTINCT diag) AS BIGINT) AS n_diagonals,
           CAST(MAX(run_len) + 2 AS BIGINT) AS longest_run_tokens
    FROM runs GROUP BY 1, 2
"""


@register("pair_alignment_spans", _ALIGN_SQL)
def pair_alignment_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level alignment evidence for every exact-Jaccard>=0.5
    near-dup pair: positional 3-gram matches between the two docs,
    grouped by diagonal (pos1 − pos2 — a fixed alignment offset) and
    merged into consecutive runs with the gaps-and-islands device
    (pos1 − row_number inside each (pair, diagonal)).  Per pair: total
    matching windows, distinct diagonals, and the longest aligned run
    in TOKENS (run windows + n − 1) — verbatim block copies show one
    dominant diagonal with a long run, scattered phrase reuse shows
    many short diagonals.

    Scale: positional shingles are semi-reduced to the pair inventory's
    docs BEFORE any join (broadcast of the candidate-doc set), the
    match join is keyed on (doc, shingle), and the windows partition by
    (pair, diagonal) — cost scales with the candidate pairs (LSH-fed at
    100 TB), never the corpus."""
    from .operators.dedup import ngram_jaccard_pairs, positional_token_shingles

    docs = t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, oracle=True) \
        .select("d1", "d2")
    psh = docs.select(
        "doc_id",
        F.posexplode(positional_token_shingles("text")).alias("pos0", "s")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "s")
    cand_docs = (pairs.select(F.col("d1").alias("doc_id"))
                 .union(pairs.select(F.col("d2").alias("doc_id")))
                 .distinct())
    pshc = psh.join(F.broadcast(cand_docs), "doc_id")
    a = pshc.select(F.col("doc_id").alias("d1"),
                    F.col("pos").alias("pos1"), "s")
    b = pshc.select(F.col("doc_id").alias("d2"),
                    F.col("pos").alias("pos2"), "s")
    m = pairs.join(a, "d1").join(b, ["d2", "s"]) \
        .select("d1", "d2", "pos1", "pos2",
                (F.col("pos1") - F.col("pos2")).alias("diag"))
    w = Window.partitionBy("d1", "d2", "diag").orderBy("pos1")
    runs = (
        m.withColumn("rn", F.row_number().over(w))
        .withColumn("grp", F.col("pos1") - F.col("rn"))
        .groupBy("d1", "d2", "diag", "grp")
        .agg(F.count("*").cast("long").alias("run_len"))
    )
    return runs.groupBy("d1", "d2").agg(
        F.sum("run_len").cast("long").alias("n_matches"),
        F.countDistinct("diag").cast("long").alias("n_diagonals"),
        (F.max("run_len") + 2).cast("long").alias("longest_run_tokens"),
    )
