"""Wave 47: the two-stage nprobe pricing curve + the span-dedup
sample-order effect."""

from __future__ import annotations

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm45  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark import registry_llm46  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry_llm42 import (
    _G_K,
    _G_NODES,
)
from defi_etl_platform_sqlglot_implementation__spark.registry_llm45 import (
    _TS_CENTS,
    _TS_NPROBE,
)
from defi_etl_platform_sqlglot_implementation__spark.registry_llm46 import (
    _NPROBES,
    _SAMPLE_MOD,
)

SF = "/root/testdata/sf0.001"


def _quantized_nodes():
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    emb = emb.sort_values("vec_id").head(_G_NODES)
    return {int(r.vec_id): [round(float(x) * 1000) for x in r.embedding]
            for r in emb.itertuples(index=False)}


def _idot(a, b) -> int:
    return sum(x * y for x, y in zip(a, b))


class TestGraphTwoStageNprobeCurve:
    def test_exact_replay_and_monotone(self, spark):
        """Full pure-Python replay of all three probe depths, plus the
        monotone-dial pins: probe sets nest, so candidates grow and the
        top-k over a candidate superset can only trade an exact edge
        for a better-scoring one (itself exact) — hits never drop."""
        q = _quantized_nodes()
        ids = sorted(q)
        cents = ids[:_TS_CENTS]
        rank = {v: [c for _, c in
                    sorted(((-_idot(q[v], q[c]), c) for c in cents))]
                for v in ids}
        asg1 = {v: rank[v][0] for v in ids}
        exact = set()
        for src in ids:
            for neg, d in sorted(((-_idot(q[src], q[d]), d)
                                  for d in ids if d != src))[:_G_K]:
                exact.add((src, d))
        exp = {}
        for p in _NPROBES:
            n_cand = n_edges = n_hits = 0
            for src in ids:
                probed = set(rank[src][:p])
                cand = [d for d in ids if d != src and asg1[d] in probed]
                n_cand += len(cand)
                top = sorted(((-_idot(q[src], q[d]), d)
                              for d in cand))[:_G_K]
                n_edges += len(top)
                n_hits += sum((src, d) in exact for _, d in top)
            exp[p] = (n_cand, n_edges, n_hits,
                      round(1e4 * n_hits / len(exact)))
        rows = sorted(QUERIES["graph_two_stage_nprobe_curve"](spark, SF)
                      .collect(), key=lambda r: r.nprobe)
        assert [r.nprobe for r in rows] == sorted(_NPROBES)
        for r in rows:
            assert (r.n_candidates, r.n_edges, r.n_hits, r.recall_bp) \
                == exp[r.nprobe]
        for lo, hi in zip(rows, rows[1:]):
            assert lo.n_candidates < hi.n_candidates
            assert lo.n_hits <= hi.n_hits
            assert lo.recall_bp <= hi.recall_bp

    def test_default_nprobe_slice_equals_detail_gate(self, spark):
        """Cross-gate pin: the nprobe=2 row IS graph_ann_two_stage's
        marginals (same stage-1 device, same stage-2 scorer)."""
        assert _TS_NPROBE in _NPROBES
        detail = QUERIES["graph_ann_two_stage"](spark, SF).toPandas()
        row = {r.nprobe: r for r in
               QUERIES["graph_two_stage_nprobe_curve"](spark, SF)
               .collect()}[_TS_NPROBE]
        assert row.n_edges == len(detail)
        assert row.n_hits == int(detail.in_exact.sum())


def _doc_spans(docs: pd.DataFrame, k: int = 8):
    toks = {int(r.doc_id): r.text.split(" ") for r in
            docs.itertuples(index=False)}
    owners: dict[str, set[int]] = {}
    for d, l in toks.items():
        for i in range(len(l) - k + 1):
            owners.setdefault(" ".join(l[i:i + k]), set()).add(d)
    hits: dict[int, list[int]] = {}
    for d, l in toks.items():
        hs = [i + 1 for i in range(len(l) - k + 1)
              if len(owners[" ".join(l[i:i + k])]) > 1]
        if hs:
            hits[d] = hs
    return hits


def _coverage(hits: dict[int, list[int]], k: int = 8) -> dict[int, int]:
    return {d: len({p + o for p in hs for o in range(k)})
            for d, hs in hits.items()}


class TestSpanDedupSampleEffect:
    def test_exact_replay_and_containment_theorem(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        sample = docs[docs.doc_id % _SAMPLE_MOD == 0]
        cov_full = _coverage(_doc_spans(docs))
        cov_samp = _coverage(_doc_spans(sample))
        exp: dict[str, list[int]] = {}
        for r in sample.itertuples(index=False):
            e = exp.setdefault(r.source, [0, 0, 0, 0])
            e[0] += 1
            e[1] += len(r.text.split(" "))
            e[2] += cov_full.get(int(r.doc_id), 0)
            e[3] += cov_samp.get(int(r.doc_id), 0)
        got = {r.source: r for r in
               QUERIES["span_dedup_sample_effect"](spark, SF).collect()}
        assert set(got) == set(exp)
        for s, e in exp.items():
            g = got[s]
            assert (g.n_docs_sample, g.tokens_sample,
                    g.removed_clip_first, g.removed_sample_first) \
                == tuple(e)
            assert g.delta_tokens == e[2] - e[3]
            assert g.delta_bp == round(1e4 * (e[2] - e[3]) / e[1])
        # the containment theorem: a window duplicated within the
        # sample is duplicated in the full corpus, so sample-first can
        # only UNDER-clip — delta >= 0 on every row, per doc too
        for d, c in cov_samp.items():
            assert c <= cov_full.get(d, 0)
        assert all(r.delta_tokens >= 0 for r in got.values())
        # the corpus exercises the leak AND the agreeing regime
        deltas = {r.delta_tokens > 0 for r in got.values()}
        assert deltas == {True, False}
