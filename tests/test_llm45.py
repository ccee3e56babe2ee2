"""Wave 46: IVF-bucketed graph construction + class-granular cut plan."""

from __future__ import annotations

import hashlib

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm41  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark import registry_llm42  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark import registry_llm45  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry_llm42 import (
    _G_K,
    _G_NODES,
)
from defi_etl_platform_sqlglot_implementation__spark.registry_llm45 import (
    _TS_CENTS,
    _TS_NPROBE,
)

SF = "/root/testdata/sf0.001"


def _quantized_nodes():
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    emb = emb.sort_values("vec_id").head(_G_NODES)
    return {int(r.vec_id): [round(float(x) * 1000) for x in r.embedding]
            for r in emb.itertuples(index=False)}


def _idot(a: list[int], b: list[int]) -> int:
    return sum(x * y for x, y in zip(a, b))


class TestGraphAnnTwoStage:
    def test_exact_replay(self, spark):
        """Full pure-Python replay: centroid assignment (top-1 index,
        top-nprobe probes, integer dots, cid tie-break), candidate
        generation, candidate-only scoring, per-src top-k, and the
        in_exact column against the brute kNN digraph."""
        q = _quantized_nodes()
        ids = sorted(q)
        cents = ids[:_TS_CENTS]
        rank = {}  # vec_id -> [cid by descending score, cid asc]
        for v in ids:
            scored = sorted(((-_idot(q[v], q[c]), c) for c in cents))
            rank[v] = [c for _, c in scored]
        asg1 = {v: rank[v][0] for v in ids}
        exp_edges = {}
        for src in ids:
            probed = set(rank[src][:_TS_NPROBE])
            cand = [d for d in ids if d != src and asg1[d] in probed]
            top = sorted(((-_idot(q[src], q[d]), d) for d in cand))[:_G_K]
            for rk, (neg, d) in enumerate(top, start=1):
                exp_edges[(src, d)] = (rk, -neg)
        exact = {}
        for src in ids:
            top = sorted(((-_idot(q[src], q[d]), d)
                          for d in ids if d != src))[:_G_K]
            for neg, d in top:
                exact[(src, d)] = -neg
        rows = QUERIES["graph_ann_two_stage"](spark, SF).collect()
        got = {(r.src, r.dst): (r.rk, r.score, r.in_exact) for r in rows}
        assert set(got) == set(exp_edges)
        for k, (rk, score) in exp_edges.items():
            assert got[k] == (rk, score, int(k in exact))

    def test_edges_marked_exact_agree_with_knn_graph(self, spark):
        """Cross-gate pin: every in_exact=1 edge appears in
        knn_graph_edges with the SAME score (the eval column and the
        exact gate can never disagree), and shared edges agree on
        score regardless of the flag."""
        exact = {(r.src, r.dst): r.score for r in
                 QUERIES["knn_graph_edges"](spark, SF).collect()}
        rows = QUERIES["graph_ann_two_stage"](spark, SF).collect()
        for r in rows:
            if r.in_exact:
                assert exact[(r.src, r.dst)] == r.score
            else:
                assert (r.src, r.dst) not in exact
        # the recall the dial buys is strictly partial on this corpus:
        # the column must separate (neither all-hit nor all-miss)
        flags = {r.in_exact for r in rows}
        assert flags == {0, 1}


def _doc_spans(docs: pd.DataFrame, k: int = 8):
    """Pure-Python duplicated-shingle -> maximal-span chain (the
    substring_dup_spans semantics): {doc_id: [(start, end), ...]},
    1-based inclusive token positions."""
    toks = {int(r.doc_id): r.text.split(" ") for r in
            docs.itertuples(index=False)}
    owners: dict[str, set[int]] = {}
    for d, l in toks.items():
        for i in range(len(l) - k + 1):
            owners.setdefault(" ".join(l[i:i + k]), set()).add(d)
    spans: dict[int, list[tuple[int, int]]] = {}
    for d, l in toks.items():
        hit = [i + 1 for i in range(len(l) - k + 1)
               if len(owners[" ".join(l[i:i + k])]) > 1]
        if not hit:
            continue
        out = []
        start = prev = hit[0]
        for p in hit[1:]:
            if p == prev + 1:
                prev = p
            else:
                out.append((start, prev + k - 1))
                start = prev = p
        out.append((start, prev + k - 1))
        spans[d] = out
    return toks, spans


class TestRepeatClassCutPlan:
    def test_exact_replay(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        toks, spans = _doc_spans(docs)
        occ: dict[str, list[tuple[int, int, int]]] = {}
        for d, sp in spans.items():
            for s, e in sp:
                h = hashlib.md5(
                    " ".join(toks[d][s - 1:e]).encode()).hexdigest()
                occ.setdefault(h, []).append((d, s, e - s + 1))
        per_doc: dict[int, list[int]] = {}  # doc -> [kept, cut, cut_tokens]
        for h, lst in occ.items():
            lst.sort()
            kd = per_doc.setdefault(lst[0][0], [0, 0, 0])
            kd[0] += 1
            for d, _, ln in lst[1:]:
                cd = per_doc.setdefault(d, [0, 0, 0])
                cd[1] += 1
                cd[2] += ln
        exp: dict[str, list[int]] = {}
        for r in docs.itertuples(index=False):
            e = exp.setdefault(r.source, [0, 0, 0, 0, 0, 0])
            kept, cut, ctok = per_doc.get(int(r.doc_id), (0, 0, 0))
            e[0] += 1
            e[1] += int(ctok > 0)
            e[2] += kept
            e[3] += cut
            e[4] += len(r.text.split(" "))
            e[5] += ctok
        got = {r.source: r for r in
               QUERIES["repeat_class_cut_plan"](spark, SF).collect()}
        assert set(got) == set(exp)
        for s, e in exp.items():
            g = got[s]
            assert (g.n_docs, g.docs_affected, g.spans_kept, g.spans_cut,
                    g.tokens_total, g.tokens_removed) == tuple(e)
            assert g.savings_bp == round(1e4 * e[5] / e[4])

    def test_conservation_vs_inventory_and_coverage_gates(self, spark):
        """The docstring-claimed pins: Σ tokens_removed ==
        Σ_class (n_occurrences − 1)·span_tokens (every non-keeper
        occurrence of a class is cut, nothing else); spans kept+cut
        partition the class occurrences (kept == #classes); and
        tokens_total matches span_dedup_token_savings per source —
        same position space, so the two strategies' dividends are
        directly comparable."""
        inv = QUERIES["maximal_repeat_inventory"](spark, SF).collect()
        cut = QUERIES["repeat_class_cut_plan"](spark, SF).toPandas()
        sav = QUERIES["span_dedup_token_savings"](spark, SF).toPandas()
        assert int(cut.tokens_removed.sum()) == sum(
            (r.n_occurrences - 1) * r.span_tokens for r in inv)
        assert int(cut.spans_kept.sum()) == len(inv)
        assert int((cut.spans_kept + cut.spans_cut).sum()) == sum(
            r.n_occurrences for r in inv)
        tot = dict(zip(sav.source, sav.tokens_total))
        for r in cut.itertuples(index=False):
            assert tot[r.source] == r.tokens_total
        # keep-one-copy is strictly cheaper than blanket coverage
        # clipping IN DOCS TOUCHED (keeper-only docs are spared)
        assert int(cut.docs_affected.sum()) <= int(
            sav.docs_affected.sum())
