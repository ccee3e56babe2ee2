"""Wave 49: PQ rerank-depth curve + decontamination n-gram-size curve.

Replay strategy: the contamination curve gets a FULL independent Python
replay (shingle sets per n recomputed from the parquet with the family's
split-on-space convention); the PQ curve gets (a) an independent Python
re-aggregation of the candidate/hit/rerank counts from the ADC ranking
and an exact-cosine replay of the rerank ordering, and (b) cross-gate
pins against similarity_ann_pq and similarity_topk (the depth-10 slice
IS their intersection).  Both gates' theorems — rerank losslessness,
depth/n monotonicity — are asserted explicitly.
"""

from __future__ import annotations

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm  # noqa: F401
from defi_etl_platform_sqlglot_implementation__spark import registry_llm2  # noqa: F401
from defi_etl_platform_sqlglot_implementation__spark import registry_llm48  # noqa: F401
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry_llm48 import (
    _CONTAM_NS,
    _RERANK_DEPTHS,
    _RERANK_K,
)

SF = "/root/testdata/sf0.001"


def _dot_fold(a, b) -> float:
    """The engines' left-assoc double chain: float32 -> float64 widening,
    one multiply per element, sequential adds."""
    acc = float(a[0]) * float(b[0])
    for i in range(1, len(a)):
        acc += float(a[i]) * float(b[i])
    return acc


class TestPqRerankRecallCurve:
    def test_counts_replay_and_losslessness(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.operators.similarity import (
            ann_pq,
        )

        e = spark.read.parquet(f"{SF}/embeddings.parquet")
        adc = ann_pq(e, e.filter("vec_id < 5"),
                     k=max(_RERANK_DEPTHS), m=8, n_codes=16).collect()
        truth = {(r.query_id, r.neighbor_id)
                 for r in QUERIES["similarity_topk"](spark, SF).collect()}
        emb = {int(r.vec_id): list(r.embedding)
               for r in e.collect()}

        got = {r.rerank_depth: r for r in
               QUERIES["pq_rerank_recall_curve"](spark, SF).collect()}
        assert set(got) == set(_RERANK_DEPTHS)
        for depth in _RERANK_DEPTHS:
            cand = [(r.query_id, r.neighbor_id)
                    for r in adc if r.rank <= depth]
            hits_c = sum(1 for p in cand if p in truth)
            # exact-cosine rerank replay: best K of the candidate set
            # per query, ties to the lowest neighbor id
            rerank_hits = 0
            by_q: dict[int, list[int]] = {}
            for qid, nid in cand:
                by_q.setdefault(qid, []).append(nid)
            for qid, nids in by_q.items():
                qv = emb[qid]

                def cos(nid: int) -> float:
                    ev = emb[nid]
                    return _dot_fold(qv, ev) / (
                        _dot_fold(qv, qv) ** 0.5 * _dot_fold(ev, ev) ** 0.5)

                top = sorted(nids, key=lambda n: (-cos(n), n))[:_RERANK_K]
                rerank_hits += sum(1 for n in top if (qid, n) in truth)
            g = got[depth]
            assert g.n_candidates == len(cand)
            assert g.hits_candidates == hits_c
            assert g.hits_reranked == rerank_hits
            # theorem 1: rerank losslessness — a true member in the
            # candidate set always survives exact rerank
            assert g.hits_candidates == g.hits_reranked
            assert g.recall_bp == (g.hits_reranked * 10000) // len(truth)

    def test_depth_monotone_and_pq_gate_pin(self, spark):
        rows = sorted(QUERIES["pq_rerank_recall_curve"](spark, SF).collect(),
                      key=lambda r: r.rerank_depth)
        # theorem 2: candidate sets are nested prefixes of one ranking
        for a, b in zip(rows, rows[1:]):
            assert a.recall_bp <= b.recall_bp
            assert a.hits_candidates <= b.hits_candidates
            assert a.n_candidates < b.n_candidates
        # cross-gate pin: the depth-10 slice IS similarity_ann_pq's
        # top-10 intersected with similarity_topk's truth
        pq10 = {(r.query_id, r.neighbor_id)
                for r in QUERIES["similarity_ann_pq"](spark, SF).collect()}
        truth = {(r.query_id, r.neighbor_id)
                 for r in QUERIES["similarity_topk"](spark, SF).collect()}
        assert rows[0].rerank_depth == _RERANK_K
        assert rows[0].hits_candidates == len(pq10 & truth)
        # the corpus separates the depths (a real dial, not a plateau)
        assert rows[-1].hits_candidates > rows[0].hits_candidates


def _shingles(toks: list[str], n: int) -> set[str]:
    return {" ".join(toks[i:i + n])
            for i in range(max(1, len(toks) - (n - 1)))}


class TestContaminationNgramCurve:
    def test_full_replay(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        toks = {int(r.doc_id): r.text.split(" ")
                for r in docs.itertuples(index=False)}
        corpus = [d for d in toks if d % 97 != 0]
        got = {r.ngram_n: r for r in
               QUERIES["contamination_ngram_curve"](spark, SF).collect()}
        assert set(got) == set(_CONTAM_NS)
        for n in _CONTAM_NS:
            bench = set()
            for d, t in toks.items():
                if d % 97 == 0:
                    bench |= _shingles(t, n)
            flagged, matched = 0, set()
            for d in corpus:
                hit = _shingles(toks[d], n) & bench
                flagged += bool(hit)
                matched |= hit
            g = got[n]
            assert g.corpus_docs == len(corpus)
            assert g.flagged_docs == flagged
            assert g.flag_rate_bp == (flagged * 10000) // len(corpus)
            assert g.matched_shingles == len(matched)

    def test_n_monotone_and_overlap_gate_pin(self, spark):
        rows = sorted(QUERIES["contamination_ngram_curve"](spark, SF)
                      .collect(), key=lambda r: r.ngram_n)
        # containment theorem: every (n+1)-gram contains an n-gram, so
        # flagged counts are non-increasing in n (ragged short docs
        # contribute identical full-text shingles at every n)
        for a, b in zip(rows, rows[1:]):
            assert a.flagged_docs >= b.flagged_docs
            assert a.flag_rate_bp >= b.flag_rate_bp
            assert a.corpus_docs == b.corpus_docs
        # cross-gate pin: the n=4 row IS contamination_overlap's
        # contaminated-doc count (same shingle convention, same slice)
        overlap_docs = {r.doc_id for r in
                        QUERIES["contamination_overlap"](spark, SF)
                        .collect()}
        by_n = {r.ngram_n: r for r in rows}
        assert by_n[4].flagged_docs == len(overlap_docs)
        # the corpus separates the ns (a real dial)
        assert by_n[3].flagged_docs > by_n[6].flagged_docs
