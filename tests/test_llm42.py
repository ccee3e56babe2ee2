"""Wave 43: graph-ANN — kNN digraph, beam search, beam-width pricing."""

from __future__ import annotations

import numpy as np
import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm42  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry_llm42 import (
    _G_BEAMS,
    _G_HOPS,
    _G_K,
    _G_NODES,
    _G_QUERIES,
)

SF = "/root/testdata/sf0.001"


def _quantized(sf=SF):
    df = pd.read_parquet(f"{sf}/embeddings.parquet").sort_values("vec_id")
    ids = df.vec_id.tolist()
    q = {int(r.vec_id): [int(x) for x in
                         np.round(np.array(r.embedding, np.float64) * 1000)]
         for r in df.itertuples(index=False)}
    nodes = ids[:_G_NODES]
    queries = ids[_G_NODES:_G_NODES + _G_QUERIES]
    return q, nodes, queries


def _idot(a, b):
    return sum(x * y for x, y in zip(a, b))


def _py_graph(q, nodes):
    g = {}
    for s in nodes:
        scored = sorted(((-_idot(q[s], q[d]), d) for d in nodes if d != s))
        g[s] = [(r + 1, d, -neg) for r, (neg, d) in
                enumerate(scored[:_G_K])]
    return g


def _py_beam(q, nodes, queries, g, beam):
    entry = min(nodes)
    out = {}
    for qid in queries:
        score = {entry: _idot(q[qid], q[entry])}
        for _ in range(_G_HOPS):
            top = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:beam]
            for node, _s in top:
                for _r, d, _gs in g[node]:
                    if d not in score:
                        score[d] = _idot(q[qid], q[d])
        best = min(score.items(), key=lambda kv: (-kv[1], kv[0]))
        out[qid] = (len(score), best[0], best[1])
    return out


class TestKnnGraphEdges:
    def test_exact_replay(self, spark):
        q, nodes, _ = _quantized()
        exp = {(s, r, d, sc) for s, lst in _py_graph(q, nodes).items()
               for r, d, sc in lst}
        got = {(r.src, r.rk, r.dst, r.score) for r in
               QUERIES["knn_graph_edges"](spark, SF).collect()}
        assert got == exp
        # exactly k out-edges per source, all sources in the cap
        srcs = {}
        for s, _r, _d, _sc in got:
            srcs[s] = srcs.get(s, 0) + 1
        assert set(srcs) == set(nodes)
        assert set(srcs.values()) == {_G_K}


class TestGraphAnnBeamSearch:
    def test_exact_replay_and_truth(self, spark):
        q, nodes, queries = _quantized()
        g = _py_graph(q, nodes)
        exp = _py_beam(q, nodes, queries, g, beam=4)
        rows = QUERIES["graph_ann_beam_search"](spark, SF).collect()
        assert {r.qid for r in rows} == set(queries)
        for r in rows:
            n_vis, fid, fsc = exp[r.qid]
            assert (r.n_visited, r.found_id, r.found_score) \
                == (n_vis, fid, fsc)
            true_sc = max(_idot(q[r.qid], q[d]) for d in nodes)
            assert r.true_score == true_sc
            assert r.hit == int(r.found_score == true_sc)


class TestGraphAnnRecallCurve:
    def test_dial_monotone_and_consistent(self, spark):
        rows = {r.beam: r for r in
                QUERIES["graph_ann_recall_curve"](spark, SF).collect()}
        assert set(rows) == set(_G_BEAMS)
        beams = sorted(_G_BEAMS)
        for small, big in zip(beams, beams[1:]):
            # wider beam can only visit more and find at least as much
            assert rows[big].total_visited >= rows[small].total_visited
            assert rows[big].n_hits >= rows[small].n_hits
        for r in rows.values():
            assert r.n_queries == _G_QUERIES
            assert r.recall_bp == round(1e4 * r.n_hits / r.n_queries)
        # the b=4 row aggregates exactly the beam-search gate's rows
        detail = QUERIES["graph_ann_beam_search"](spark, SF).collect()
        assert rows[4].n_hits == sum(r.hit for r in detail)
        assert rows[4].total_visited == sum(r.n_visited for r in detail)
