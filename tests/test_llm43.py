"""Wave 44: cluster eccentricity, planted-secret screening, quality drift."""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm2  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark import registry_llm5  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark import registry_llm43  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry_llm43 import (
    _ECC_CAP,
    _QF_BATCHES,
    _QF_TAU_BP,
    _SECRET_ENT_MICRO,
    _SECRET_MOD,
)

SF = "/root/testdata/sf0.001"


class TestClusterDiameterReport:
    def test_bfs_replay_against_pair_gate(self, spark):
        """Exact eccentricity replay: BFS from each cluster's min node
        over the exact-Jaccard pair graph (the dedup_ngram_jaccard
        inventory — same threshold, same chain; ADVICE r10 #2: ecc
        depends on the exact edge SET, so the replay uses the exact
        generator the gate now uses)."""
        pairs = [(r.d1, r.d2) for r in
                 QUERIES["dedup_ngram_jaccard"](spark, SF).collect()]
        adj: dict[int, set[int]] = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        # components + min label
        comp: dict[int, int] = {}
        for start in sorted(adj):
            if start in comp:
                continue
            seen = {start}
            stack = [start]
            while stack:
                u = stack.pop()
                for v in adj[u]:
                    if v not in seen:
                        seen.add(v)
                        stack.append(v)
            root = min(seen)
            for n_ in seen:
                comp[n_] = root
        # eccentricity of the root, capped
        ecc_by_cluster: dict[int, int] = {}
        sizes: dict[int, int] = {}
        for root in set(comp.values()):
            members = {n_ for n_, r_ in comp.items() if r_ == root}
            sizes[root] = len(members)
            depth = {root: 0}
            frontier = [root]
            d = 0
            while frontier and d < _ECC_CAP:
                d += 1
                frontier = [v for u in frontier for v in adj[u]
                            if v not in depth and not depth.update({v: d})]
            ecc_by_cluster[root] = max(
                depth.get(m, _ECC_CAP + 1) for m in members)
        exp: dict[int, list[int]] = {}
        for root, e in ecc_by_cluster.items():
            exp.setdefault(e, []).append(sizes[root])
        got = {r.ecc: r for r in
               QUERIES["cluster_diameter_report"](spark, SF).collect()}
        assert set(got) == set(exp)
        for e, szs in exp.items():
            assert got[e].n_clusters == len(szs)
            assert got[e].n_docs == sum(szs)
            assert got[e].max_cluster_size == max(szs)

    def test_cliquish_claim_holds_on_corpus(self, spark):
        """The connected_components docstring's convergence premise
        ('near-dup components are cliquish, diameter 1-3') is now a
        measured table: every cluster's canonical reaches every member
        within the hop cap on this corpus."""
        rows = QUERIES["cluster_diameter_report"](spark, SF).collect()
        assert all(r.ecc <= _ECC_CAP for r in rows)


def _char_entropy_micro(tok: str) -> int:
    counts: dict[str, int] = {}
    for ch in tok:
        counts[ch] = counts.get(ch, 0) + 1
    n = len(tok)
    b = sum(c * round(math.log(c) * 1e6) for c in counts.values())
    return round(math.log(n) * 1e6) - round(b / n)


class TestSecretScreeningReport:
    def test_planted_population_found_exactly(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        cand_re = re.compile(r"^[A-Za-z0-9_+/=-]+$")
        exp: dict[str, dict[str, int]] = {}
        for r in docs.itertuples(index=False):
            src = exp.setdefault(
                r.source, {"n_docs": 0, "n_candidates": 0,
                           "n_secrets": 0, "docs_flagged": 0})
            src["n_docs"] += 1
            text = r.text
            if r.doc_id % _SECRET_MOD == 0:
                text += " sk_" + hashlib.md5(
                    str(r.doc_id).encode()).hexdigest()
            cands = {tok for tok in text.split(" ")
                     if len(tok) >= 16 and cand_re.match(tok)
                     and re.search(r"[0-9]", tok)}
            hi = sum(_char_entropy_micro(tok) >= _SECRET_ENT_MICRO
                     for tok in cands)
            src["n_candidates"] += len(cands)
            src["n_secrets"] += hi
            src["docs_flagged"] += int(hi > 0)
        got = {r.source: r for r in
               QUERIES["secret_screening_report"](spark, SF).collect()}
        assert set(got) == set(exp)
        for s, e in exp.items():
            g = got[s]
            assert (g.n_docs, g.n_candidates, g.n_secrets, g.docs_flagged) \
                == (e["n_docs"], e["n_candidates"], e["n_secrets"],
                    e["docs_flagged"])
            assert g.flagged_bp == round(1e4 * e["docs_flagged"]
                                         / e["n_docs"])
        # the plant is the point: every planted doc is flagged
        n_planted = int((docs.doc_id % _SECRET_MOD == 0).sum())
        assert sum(e["n_secrets"] for e in exp.values()) >= n_planted
        assert sum(g.docs_flagged for g in got.values()) >= n_planted


class TestQualityFlagDrift:
    def test_replay_against_gopher_gate(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        gopher = QUERIES["gopher_quality_flags"](spark, SF).toPandas()
        reject = {int(r.doc_id): int(r.keep == 0)
                  for r in gopher.itertuples(index=False)}
        ids = sorted(docs.doc_id.tolist())
        n = len(ids)
        st: dict[int, list[int]] = {}
        for rnk, did in enumerate(ids, start=1):
            b = (rnk - 1) * _QF_BATCHES // n
            cur = st.setdefault(b, [0, 0])
            cur[0] += 1
            cur[1] += reject.get(did, 1)
        rows = QUERIES["quality_flag_drift"](spark, SF).collect()
        assert {r.batch for r in rows} == set(range(1, _QF_BATCHES))
        for r in rows:
            bn, br = st[r.batch]
            pn, pr = st[r.batch - 1]
            assert (r.n_cur, r.rej_cur, r.n_prev, r.rej_prev) \
                == (bn, br, pn, pr)
            assert r.drifted == int(
                abs(br * pn - pr * bn) * 10000 > _QF_TAU_BP * bn * pn)
        # marginal: the four batches partition the corpus
        assert sum(v[0] for v in st.values()) == n
