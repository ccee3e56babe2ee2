"""Wave 48: quality-wins keep policy + the three-policy decision matrix."""

from __future__ import annotations

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm34  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark import registry_llm47  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry_llm47 import (
    _POLICY_PAIRS,
)

SF = "/root/testdata/sf0.001"


def _signals(docs: pd.DataFrame):
    """Per doc: (n_chars, doc_id, quality_bp) — the three policy
    ranking signals, integer-exact."""
    out = {}
    for r in docs.itertuples(index=False):
        toks = [x for x in r.text.split(" ") if x != ""]
        n = len(toks)
        q = (len(set(toks)) * 10000) // max(n, 1)
        out[int(r.doc_id)] = (len(r.text), n, q)
    return out


def _clusters(spark) -> dict[int, int]:
    """doc_id -> cluster_id from the pair gate (union-find, min label)
    — the dedup_clusters chain replayed."""
    pairs = [(r.d1, r.d2) for r in
             QUERIES["dedup_minhash_lsh"](spark, SF).collect()]
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n_: find(n_) for n_ in parent}


def _keepers(members, sig, policy):
    if policy == "longest":
        return min(members, key=lambda d: (-sig[d][0], d))
    if policy == "newest":
        return max(members)
    return min(members, key=lambda d: (-sig[d][2], d))


class TestDedupKeepBestQuality:
    def test_exact_replay(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        sig = _signals(docs)
        comp = _clusters(spark)
        clusters: dict[int, list[int]] = {}
        for d in sig:
            clusters.setdefault(comp.get(d, d), []).append(d)
        rows = QUERIES["dedup_keep_best_quality"](spark, SF).collect()
        got = {r.doc_id: r for r in rows}
        assert set(got) == set(sig)
        for root, members in clusters.items():
            kq = _keepers(members, sig, "quality")
            kl = _keepers(members, sig, "longest")
            for d in members:
                g = got[d]
                assert g.cluster_id == root
                assert g.quality_bp == sig[d][2]
                assert g.keep == int(d == kq)
                assert g.policy_differs == int(kq != kl)
        # exactly one keeper per cluster
        kept = {}
        for r in rows:
            kept.setdefault(r.cluster_id, 0)
            kept[r.cluster_id] += r.keep
        assert set(kept.values()) == {1}

    def test_same_cluster_partition_as_other_policies(self, spark):
        """Cross-gate pin: all three keep policies ride the SAME
        clusters — identical (doc_id -> cluster_id) maps."""
        q = {r.doc_id: r.cluster_id for r in
             QUERIES["dedup_keep_best_quality"](spark, SF).collect()}
        n = {r.doc_id: r.cluster_id for r in
             QUERIES["dedup_keep_newest"](spark, SF).collect()}
        assert q == n


class TestKeepPolicyMatrix:
    def test_exact_replay_and_per_policy_gate_pins(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        sig = _signals(docs)
        comp = _clusters(spark)
        clusters: dict[int, list[int]] = {}
        for d in sig:
            clusters.setdefault(comp.get(d, d), []).append(d)
        multi = {r: m for r, m in clusters.items() if len(m) > 1}
        exp = {}
        for a, b in _POLICY_PAIRS:
            nd = ta = tb = 0
            for m in multi.values():
                ka, kb = _keepers(m, sig, a), _keepers(m, sig, b)
                nd += int(ka != kb)
                ta += sig[ka][1]
                tb += sig[kb][1]
            exp[(a, b)] = (len(multi), nd, ta, tb)
        got = {(r.policy_a, r.policy_b):
               (r.n_multi_clusters, r.n_differ,
                r.tokens_kept_a, r.tokens_kept_b)
               for r in QUERIES["keep_policy_matrix"](spark, SF).collect()}
        assert got == exp
        # the matrix and the per-policy gates can never disagree
        kn = QUERIES["dedup_keep_newest"](spark, SF).collect()
        differ_newest = len({r.cluster_id for r in kn
                             if r.policy_differs == 1})
        assert got[("longest", "newest")][1] == differ_newest
        kq = QUERIES["dedup_keep_best_quality"](spark, SF).collect()
        differ_quality = len({r.cluster_id for r in kq
                              if r.policy_differs == 1})
        assert got[("longest", "quality")][1] == differ_quality
        # the corpus separates the policies (a real decision table)
        assert any(v[1] > 0 for v in got.values())
