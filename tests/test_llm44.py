"""Wave 45 (round-10 epilogue): the secret-screening entropy dial and
the cluster-geometry-vs-verify-threshold sweep — the artifact set the
two gates shipped without (VERDICT r10 #1 / ADVICE r10 #4): the
docstring-claimed cross-gate pins, threshold monotonicity, and full
independent Python replays."""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm43  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark import registry_llm44  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry_llm43 import (
    _ECC_CAP,
    _SECRET_ENT_MICRO,
    _SECRET_MOD,
)
from defi_etl_platform_sqlglot_implementation__spark.registry_llm44 import (
    _ECC_THRESHOLDS,
    _ENT_THRESHOLDS,
)

SF = "/root/testdata/sf0.001"


def _char_entropy_micro(tok: str) -> int:
    counts: dict[str, int] = {}
    for ch in tok:
        counts[ch] = counts.get(ch, 0) + 1
    n = len(tok)
    b = sum(c * round(math.log(c) * 1e6) for c in counts.values())
    return round(math.log(n) * 1e6) - round(b / n)


class TestSecretEntropySweep:
    def test_default_threshold_row_equals_wave44_marginals(self, spark):
        """The docstring-claimed pin: the 2.0e6 row IS the wave-44
        gate's candidate/secret/flagged marginals (same chain, same
        threshold — they can only disagree if the byte-sharing broke)."""
        assert _SECRET_ENT_MICRO in _ENT_THRESHOLDS
        rep = QUERIES["secret_screening_report"](spark, SF).toPandas()
        row = {r.ent_micro: r for r in
               QUERIES["secret_entropy_sweep"](spark, SF).collect()}[
                   _SECRET_ENT_MICRO]
        assert row.n_candidates == int(rep.n_candidates.sum())
        assert row.n_secrets == int(rep.n_secrets.sum())
        assert row.docs_flagged == int(rep.docs_flagged.sum())

    def test_monotone_in_threshold_and_planted_recall_replay(self, spark):
        """Raising the entropy bar can only drop flags (monotone), and
        the planted-recall column replays exactly from the corpus."""
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        cand_re = re.compile(r"^[A-Za-z0-9_+/=-]+$")
        ents: list[tuple[int, int]] = []  # (doc_id, e_micro) per candidate
        for r in docs.itertuples(index=False):
            text = r.text
            if r.doc_id % _SECRET_MOD == 0:
                text += " sk_" + hashlib.md5(
                    str(r.doc_id).encode()).hexdigest()
            for tok in {t_ for t_ in text.split(" ")
                        if len(t_) >= 16 and cand_re.match(t_)
                        and re.search(r"[0-9]", t_)}:
                ents.append((int(r.doc_id), _char_entropy_micro(tok)))
        n_planted = int((docs.doc_id % _SECRET_MOD == 0).sum())
        rows = sorted(QUERIES["secret_entropy_sweep"](spark, SF).collect(),
                      key=lambda r: r.ent_micro)
        assert [r.ent_micro for r in rows] == sorted(_ENT_THRESHOLDS)
        for r in rows:
            hit = [(d, e) for d, e in ents if e >= r.ent_micro]
            assert r.n_candidates == len(ents)
            assert r.n_secrets == len(hit)
            assert r.docs_flagged == len({d for d, _ in hit})
            planted = {d for d, _ in hit if d % _SECRET_MOD == 0}
            assert r.planted_recall_bp == round(
                1e4 * len(planted) / n_planted)
        for lo, hi in zip(rows, rows[1:]):
            assert lo.n_secrets >= hi.n_secrets
            assert lo.docs_flagged >= hi.docs_flagged
            assert lo.planted_recall_bp >= hi.planted_recall_bp
            assert lo.n_candidates == hi.n_candidates  # same candidate set


def _jaccard_pairs(docs: pd.DataFrame, threshold: float):
    """Exact 3-gram Jaccard pairs — the _SHINGLES_CTE semantics."""
    sh: dict[int, set[str]] = {}
    for r in docs.itertuples(index=False):
        toks = r.text.split(" ")
        n = max(1, len(toks) - 2)
        sh[int(r.doc_id)] = {" ".join(toks[i:i + 3]) for i in range(n)}
    ids = sorted(sh)
    inv: dict[str, list[int]] = {}
    for d in ids:
        for s in sh[d]:
            inv.setdefault(s, []).append(d)
    cand = {(a, b) for lst in inv.values()
            for i, a in enumerate(lst) for b in lst[i + 1:]}
    return [(a, b) for a, b in cand
            if len(sh[a] & sh[b]) / len(sh[a] | sh[b]) >= threshold]


def _ecc_table(pairs: list[tuple[int, int]]):
    """(ecc -> [cluster sizes]) via min-label components + capped BFS
    from each canonical — the gate's semantics, independently."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
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
    out: dict[int, list[int]] = {}
    for root in set(comp.values()):
        members = {n_ for n_, r_ in comp.items() if r_ == root}
        depth = {root: 0}
        frontier = [root]
        d = 0
        while frontier and d < _ECC_CAP:
            d += 1
            frontier = [v for u in frontier for v in adj[u]
                        if v not in depth and not depth.update({v: d})]
        ecc = max(depth.get(m, _ECC_CAP + 1) for m in members)
        out.setdefault(ecc, []).append(len(members))
    return out


class TestEccByThreshold:
    def test_05_slice_equals_cluster_diameter_report(self, spark):
        """The docstring-claimed pin: the 0.5 slice IS
        cluster_diameter_report row-for-row (both now ride the exact
        ngram_jaccard_pairs edge set — ADVICE r10 #2)."""
        assert "0.5" in _ECC_THRESHOLDS
        base = {(r.ecc, r.n_clusters, r.n_docs, r.max_cluster_size)
                for r in QUERIES["cluster_diameter_report"](spark, SF)
                .collect()}
        slice05 = {(r.ecc, r.n_clusters, r.n_docs, r.max_cluster_size)
                   for r in QUERIES["ecc_by_threshold"](spark, SF).collect()
                   if r.threshold_pct == 50}
        assert slice05 == base

    def test_full_replay_and_coverage_monotone(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        got: dict[int, dict[int, tuple]] = {}
        for r in QUERIES["ecc_by_threshold"](spark, SF).collect():
            got.setdefault(r.threshold_pct, {})[r.ecc] = (
                r.n_clusters, r.n_docs, r.max_cluster_size)
        assert set(got) == {round(float(t_) * 100)
                            for t_ in _ECC_THRESHOLDS}
        for t_ in _ECC_THRESHOLDS:
            exp = _ecc_table(_jaccard_pairs(docs, float(t_)))
            pct = round(float(t_) * 100)
            assert set(got[pct]) == set(exp), t_
            for e, szs in exp.items():
                assert got[pct][e] == (len(szs), sum(szs), max(szs)), t_
        # loosening the verify threshold only ADDS edges, so the docs
        # covered by any cluster grow monotonically as the bar drops
        cov = {pct: sum(v[1] for v in rows.values())
               for pct, rows in got.items()}
        assert cov[30] >= cov[50] >= cov[70]
