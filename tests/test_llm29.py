"""Wave 29: MMR diversified selection, source unigram KL, quality ×
dup-rate quartiles."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm29  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _half_away(v):
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def _fold_cos(a, b):
    """The exact left-assoc double chain both engines evaluate."""
    def chain(x, y):
        s = 0.0
        for i in range(len(x)):
            s += float(x[i]) * float(y[i])
        return s
    return chain(a, b) / (math.sqrt(chain(a, a)) * math.sqrt(chain(b, b)))


def _embeddings():
    df = pd.read_parquet(f"{SF}/embeddings.parquet")
    return {int(r.vec_id): [float(x) for x in r.embedding]
            for r in df.itertuples(index=False)}


class TestMMRDiverseSelection:
    def test_full_greedy_replay(self, spark):
        vecs = _embeddings()
        got = QUERIES["mmr_diverse_selection"](spark, SF).collect()
        by_q = defaultdict(dict)
        for r in got:
            by_q[r.query_id][r.step] = (
                r.selected_id, r.rel_micro, r.maxsim_micro, r.mmr_score)
        for qid in range(5):
            rel_d = {}
            ranked = sorted(
                ((_fold_cos(vecs[qid], vecs[c]), c)
                 for c in vecs if c != qid),
                key=lambda t: (-t[0], t[1]))[:10]
            for cos, c in ranked:
                rel_d[c] = _half_away(cos * 1e6)
            sim = {(a, b): _half_away(_fold_cos(vecs[a], vecs[b]) * 1e6)
                   for a in rel_d for b in rel_d if a != b}
            remaining, selected = sorted(rel_d), []
            for step in range(1, 6):
                best = None
                for c in remaining:
                    ms = max((sim[(c, s)] for s in selected), default=0)
                    score = 7 * rel_d[c] - 3 * ms
                    if best is None or (score, -c) > best[0]:
                        best = ((score, -c), c, ms, score)
                _, c, ms, score = best
                remaining.remove(c)
                selected.append(c)
                assert by_q[qid][step] == (c, rel_d[c], ms, score), \
                    f"query {qid} step {step}"

    def test_step1_is_argmax_relevance_and_selection_invariants(self, spark):
        rows = QUERIES["mmr_diverse_selection"](spark, SF).collect()
        by_q = defaultdict(list)
        for r in rows:
            by_q[r.query_id].append(r)
        assert set(by_q) == set(range(5))
        for qid, rs in by_q.items():
            rs.sort(key=lambda r: r.step)
            assert [r.step for r in rs] == [1, 2, 3, 4, 5]
            ids = [r.selected_id for r in rs]
            assert len(set(ids)) == 5
            assert rs[0].maxsim_micro == 0
            assert rs[0].mmr_score == 7 * rs[0].rel_micro
            # step 1 is argmax relevance over the shortlist
            assert rs[0].rel_micro == max(r.rel_micro for r in rs)

    def test_diversity_term_changes_the_selection(self, spark):
        """Two near-identical high-relevance candidates: pure top-2 takes
        both; MMR (λ=0.7) must skip the clone and take the diverse one."""
        from defi_etl_platform_sqlglot_implementation__spark.operators.similarity import (
            mmr_select,
        )

        cand = spark.createDataFrame(
            [(0, 1, 990_000), (0, 2, 980_000), (0, 3, 600_000)],
            "query_id long, cid long, rel_micro long")
        # 1 and 2 are clones (sim .99); 3 is orthogonal to both
        sims = spark.createDataFrame(
            [(0, 1, 2, 990_000), (0, 2, 1, 990_000),
             (0, 1, 3, 10_000), (0, 3, 1, 10_000),
             (0, 2, 3, 10_000), (0, 3, 2, 10_000)],
            "query_id long, a long, b long, sim_micro long")
        got = {r.step: r.selected_id
               for r in mmr_select(cand, sims, k=2).collect()}
        # step 2: clone scores 7*980000-3*990000 = 3890000;
        #         diverse scores 7*600000-3*10000 = 4170000
        assert got == {1: 1, 2: 3}


class TestSourceUnigramKL:
    def test_full_replay(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        st = defaultdict(Counter)
        ct = Counter()
        for r in docs.itertuples(index=False):
            toks = [x for x in r.text.split(" ") if x != ""]
            st[r.source].update(toks)
            ct.update(toks)
        n = sum(ct.values())
        want = {}
        for src, cnt in st.items():
            n_s = sum(cnt.values())
            sw = 0
            for tk, c_st in cnt.items():
                x = (float(c_st) * float(n)) / (float(n_s) * float(ct[tk]))
                sw += c_st * _half_away(math.log(x) * 1e6)
            want[src] = (n_s, len(cnt), _half_away(sw / n_s))
        got = {r.source: (r.n_tokens, r.n_types, r.kl_micro)
               for r in QUERIES["source_unigram_kl"](spark, SF).collect()}
        assert got == want

    def test_gibbs_nonnegative_and_signal_present(self, spark):
        rows = QUERIES["source_unigram_kl"](spark, SF).collect()
        assert len(rows) == 20
        # KL >= 0 (Gibbs); quantization can shave at most ~1 micro-nat
        assert all(r.kl_micro >= -1 for r in rows)
        assert any(r.kl_micro > 0 for r in rows)


class TestQualityDupQuartiles:
    @staticmethod
    def _shingles(text):
        toks = text.split(" ")
        return {" ".join(toks[i:i + 3])
                for i in range(max(1, len(toks) - 2))}

    def test_replay_with_literal_ntile(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        # near-dup doc set: exact Jaccard >= 0.5 on distinct 3-shingles,
        # candidates from an inverted index (the brute-force semantics)
        sh = {int(r.doc_id): self._shingles(r.text)
              for r in docs.itertuples(index=False)}
        inv = defaultdict(set)
        for d, ss in sh.items():
            for s in ss:
                inv[s].add(d)
        cand = {tuple(sorted((a, b)))
                for ds in inv.values() for a in ds for b in ds if a < b}
        dup = set()
        for a, b in cand:
            inter = len(sh[a] & sh[b])
            if inter / (len(sh[a]) + len(sh[b]) - inter) >= 0.5:
                dup.update((a, b))
        scored = []
        for r in docs.itertuples(index=False):
            toks = [x for x in r.text.split(" ") if x != ""]
            if toks:
                scored.append(
                    (int(r.doc_id),
                     _half_away(1e4 * len(set(toks)) / len(toks))))
        scored.sort(key=lambda t: (-t[1], t[0]))
        n, k = len(scored), 4
        q, rem = divmod(n, k)
        want = defaultdict(lambda: [0, 0, []])
        pos = 0
        for b in range(1, k + 1):
            size = q + 1 if b <= rem else q
            for doc_id, bp in scored[pos:pos + size]:
                want[b][0] += 1
                want[b][1] += doc_id in dup
                want[b][2].append(bp)
            pos += size
        got = {r.quartile: r
               for r in QUERIES["quality_dup_quartiles"](spark, SF).collect()}
        assert set(got) == {1, 2, 3, 4}
        for b, (nd, ndup, bps) in want.items():
            r = got[b]
            assert (r.n_docs, r.n_dup_docs) == (nd, ndup)
            assert r.dup_bp == _half_away(1e4 * ndup / nd)
            assert (r.min_uniq_bp, r.max_uniq_bp) == (min(bps), max(bps))

    def test_buckets_balanced_and_score_ordered(self, spark):
        rows = sorted(QUERIES["quality_dup_quartiles"](spark, SF).collect(),
                      key=lambda r: r.quartile)
        sizes = [r.n_docs for r in rows]
        assert max(sizes) - min(sizes) <= 1
        # quartile 1 holds the best scores; bands are non-overlapping in
        # the ntile sense (boundaries may touch on score ties)
        for hi, lo in zip(rows, rows[1:]):
            assert hi.min_uniq_bp >= lo.max_uniq_bp
