"""Coverage wave 47 (round 11) — the two-stage construction dial
priced, and the span-dedup member of the order-effect family.

- ``graph_two_stage_nprobe_curve``: the wave-46 construction's nprobe
  knob priced like nprobe/bands/num_bits/beam: per nprobe ∈ {1, 2, 4}
  — candidate pairs generated (the stage-2 COST), edges emitted, edges
  that are also exact-kNN edges, and construction recall bp over the
  exact graph's edge count.  Candidates and recall are MONOTONE in
  nprobe (probe sets nest; a candidate superset's top-k can only evict
  an exact edge for a better-scoring one, which is itself exact — the
  argument tests/test_llm46.py replays).  Byte-shares stage 1
  (``_centroid_ranks`` / ``_CENTROID_CTES``) and the stage-2 scorer
  with ``graph_ann_two_stage`` so the curve and the detail gate can
  never disagree; the nprobe=2 slice is pinned to the wave-46 gate's
  marginals.

- ``span_dedup_sample_effect``: the SPAN-DEDUP member of the
  sample-order decision family (``dedup_sample_order_effect`` is the
  near-dup member): clip-then-sample vs sample-then-clip.  Per source
  over the deterministic half-corpus (doc_id % 2 = 0): tokens, the
  positions a FULL-corpus span clip removes from sampled docs
  (clip-first), the positions a clip computed ON THE SAMPLE removes
  (sample-first), and the delta.  The containment theorem pins
  delta >= 0 BY CONSTRUCTION: a window duplicated within the sample is
  duplicated in the full corpus (removing docs only removes owners),
  so sample-first coverage is a subset of clip-first coverage —
  sampling before clipping can only UNDER-clip, and the delta is the
  leaked duplicated volume a sample-first pipeline ships.  The corpus
  exercises a real leak (nonzero delta rows at sf0.001, pinned).

Scale shapes: the nprobe curve re-ranks three nested candidate sets
over ONE persisted node frame and ONE centroid ranking (the capped
256-node benchmark contract — zero shuffles, broadcast joins only, as
wave 46); the sample-effect gate pays the duplicated-shingle shuffle
twice (full + sampled corpus — the sweep prices exactly that second
pass), each linear in tokens, then two coverage explodes and one
per-source aggregate.

Reference scope: composes the reference's aggregation surface
(src/transform/etl_pipeline.py groupbys) with the LLM-pipeline
extension; no counterpart file exists — cited per SURVEY §6 as a scale
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, t
from .registry_llm3 import _DUP_SHINGLE_CTES, _dup_shingle_frames
from .registry_llm42 import _G_K, _GRAPH_CTES
from .registry_llm45 import _CENTROID_CTES, _graph_frames, _two_stage_edges

_NPROBES = (1, 2, 4)
_SAMPLE_MOD = 2     # deterministic half-corpus: doc_id % 2 = 0


# =========================================================================
# graph_two_stage_nprobe_curve — the construction dial
# =========================================================================

def _nprobe_curve_sql() -> str:
    selects = []
    for p in _NPROBES:
        selects.append(f"""SELECT CAST({p} AS BIGINT) AS nprobe,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cand_p{p})
               AS n_candidates,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ivfg_p{p}) AS n_edges,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ivfg_p{p} i
            JOIN graph g ON g.src = i.src AND g.dst = i.dst) AS n_hits,
           (SELECT CAST(round(1e4 * (SELECT COUNT(*) FROM ivfg_p{p} i
                                     JOIN graph g ON g.src = i.src
                                                 AND g.dst = i.dst)
                       / (SELECT COUNT(*) FROM graph)) AS BIGINT))
               AS recall_bp""")
    chains = []
    for p in _NPROBES:
        chains.append(f"""probes_p{p} AS (
        SELECT vec_id, cid FROM rkc WHERE crk <= {p}
    ),
    cand_p{p} AS (
        SELECT pr.vec_id AS src, a.vec_id AS dst
        FROM probes_p{p} pr JOIN asg1 a ON a.cid = pr.cid
        WHERE a.vec_id <> pr.vec_id
    ),
    ivfg_p{p} AS (
        SELECT src, dst, score,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY score DESC, dst) AS rk
        FROM (SELECT c.src, c.dst, np.score
              FROM cand_p{p} c
              JOIN npairs np ON np.src = c.src AND np.dst = c.dst)
        QUALIFY rk <= {_G_K}
    )""")
    return ("\n    WITH " + ",\n    ".join(
        [_GRAPH_CTES, _CENTROID_CTES] + chains)
        + "\n    " + "\n    UNION ALL\n    ".join(selects))


@register("graph_two_stage_nprobe_curve", _nprobe_curve_sql())
def graph_two_stage_nprobe_curve(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Construction recall vs candidate cost per nprobe — see module
    docstring.  One persisted node frame feeds the three nested probe
    chains (the pricing-curve convention); the exact graph supplies
    the recall denominator."""
    from .operators.materialize import scoped_persist

    nodes, graph, _, _ = _graph_frames(spark, sf_dir)
    nodes = scoped_persist(nodes)
    graph = scoped_persist(graph.select("src", "dst"))
    n_exact = graph.count()
    from .registry_llm45 import _centroid_ranks

    rkc = scoped_persist(_centroid_ranks(nodes))
    asg1 = rkc.filter(F.col("crk") == 1).select(
        F.col("vec_id").alias("dst"), "cid")
    parts = []
    for p in _NPROBES:
        probes = rkc.filter(F.col("crk") <= p).select(
            F.col("vec_id").alias("src"), "cid")
        cand = (probes.join(asg1, "cid")
                .filter(F.col("src") != F.col("dst"))
                .select("src", "dst"))
        cand = scoped_persist(cand)
        n_cand = cand.count()
        ivfg = _two_stage_edges(nodes, p)
        hits = ivfg.join(F.broadcast(graph), ["src", "dst"])
        parts.append(
            ivfg.agg(F.lit(p).cast("long").alias("nprobe"),
                     F.lit(n_cand).cast("long").alias("n_candidates"),
                     F.count("*").cast("long").alias("n_edges"))
            .crossJoin(F.broadcast(
                hits.agg(F.count("*").cast("long").alias("n_hits"))))
            .select("nprobe", "n_candidates", "n_edges", "n_hits",
                    F.round(F.lit(1e4) * F.col("n_hits")
                            / F.lit(float(n_exact))).cast("long")
                    .alias("recall_bp"))
        )
    out = parts[0]
    for pt in parts[1:]:
        out = out.unionByName(pt)
    return out


# =========================================================================
# span_dedup_sample_effect — clip-then-sample vs sample-then-clip
# =========================================================================

def _dup_shingle_ctes_sampled(sfx: str) -> str:
    """The _DUP_SHINGLE_CTES chain parameterized to the deterministic
    half-corpus — suffixed so it composes next to the full chain in one
    WITH scope (the registry's parameterized-twin convention)."""
    return f"""toks{sfx} AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents
        WHERE doc_id % {_SAMPLE_MOD} = 0
    ),
    sh{sfx} AS (
        SELECT doc_id, i AS pos, array_to_string(l[i:i+7], ' ') AS s
        FROM toks{sfx}, LATERAL unnest(range(1, len(l) - 6)) AS t(i)
        WHERE len(l) >= 8
    ),
    dups{sfx} AS (
        SELECT s FROM sh{sfx} GROUP BY s HAVING COUNT(DISTINCT doc_id) > 1
    ),
    hits{sfx} AS (SELECT sh{sfx}.doc_id, sh{sfx}.pos
                  FROM sh{sfx} JOIN dups{sfx} USING (s))"""


_SAMPLE_EFFECT_SQL = f"""
    WITH {_DUP_SHINGLE_CTES},
    {_dup_shingle_ctes_sampled('_s')},
    cov_full AS (
        SELECT DISTINCT doc_id, pos + o AS pos
        FROM hits, LATERAL unnest(range(0, 8)) AS u(o)
        WHERE doc_id % {_SAMPLE_MOD} = 0
    ),
    cov_samp AS (
        SELECT DISTINCT doc_id, pos + o AS pos
        FROM hits_s, LATERAL unnest(range(0, 8)) AS u(o)
    ),
    rem_full AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
                 FROM cov_full GROUP BY doc_id),
    rem_samp AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
                 FROM cov_samp GROUP BY doc_id),
    base AS (
        SELECT d.source,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
               COALESCE(f.n, 0) AS r_full,
               COALESCE(s.n, 0) AS r_samp
        FROM documents d
        LEFT JOIN rem_full f USING (doc_id)
        LEFT JOIN rem_samp s USING (doc_id)
        WHERE d.doc_id % {_SAMPLE_MOD} = 0
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_sample,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_sample,
           CAST(SUM(r_full) AS BIGINT) AS removed_clip_first,
           CAST(SUM(r_samp) AS BIGINT) AS removed_sample_first,
           CAST(SUM(r_full) - SUM(r_samp) AS BIGINT) AS delta_tokens,
           CAST(round(1e4 * (SUM(r_full) - SUM(r_samp)) / SUM(n_tok))
                AS BIGINT) AS delta_bp
    FROM base GROUP BY source
"""


@register("span_dedup_sample_effect", _SAMPLE_EFFECT_SQL)
def span_dedup_sample_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clip-then-sample vs sample-then-clip — see module docstring.
    The full chain byte-shares ``_dup_shingle_frames``; the sampled
    chain is the same construction on the filtered frame (the
    parameterized twin); coverage expansion is the
    ``curation_clip_spans`` 8-row explode on hits only, both sides."""
    docs = t(spark, sf_dir, "documents")
    in_sample = F.col("doc_id") % _SAMPLE_MOD == 0

    _, hits_full = _dup_shingle_frames(spark, sf_dir)

    sdocs = docs.select("doc_id", "text").filter(in_sample)
    stoks = sdocs.withColumn("l", F.split("text", " "))
    ssh = (
        stoks.filter(F.size("l") >= 8)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(1, size(l) - 7),"
                    " i -> concat_ws(' ', slice(l, i, 8)))"
                )
            ).alias("pos0", "s"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "s")
    )
    sdups = (
        ssh.groupBy("s")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("s")
    )
    hits_samp = ssh.join(sdups, "s").select("doc_id", "pos")

    def _coverage(hits: DataFrame, name: str) -> DataFrame:
        return (
            hits.select(
                "doc_id",
                F.explode(F.sequence(F.col("pos"), F.col("pos") + 7))
                .alias("pos"))
            .distinct()
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias(name))
        )

    rem_full = _coverage(hits_full.filter(in_sample), "r_full")
    rem_samp = _coverage(hits_samp, "r_samp")
    base = (
        docs.filter(in_sample)
        .select("source", "doc_id",
                F.size(F.split("text", " ")).cast("long").alias("n_tok"))
        .join(rem_full, "doc_id", "left")
        .join(rem_samp, "doc_id", "left")
        .select("source", "n_tok",
                F.coalesce("r_full", F.lit(0)).alias("r_full"),
                F.coalesce("r_samp", F.lit(0)).alias("r_samp"))
    )
    return (
        base.groupBy("source")
        .agg(F.count("*").cast("long").alias("n_docs_sample"),
             F.sum("n_tok").cast("long").alias("tokens_sample"),
             F.sum("r_full").cast("long").alias("removed_clip_first"),
             F.sum("r_samp").cast("long").alias("removed_sample_first"),
             (F.sum("r_full") - F.sum("r_samp")).cast("long")
             .alias("delta_tokens"),
             F.round(F.lit(1e4) * (F.sum("r_full") - F.sum("r_samp"))
                     / F.sum("n_tok")).cast("long").alias("delta_bp"))
    )
