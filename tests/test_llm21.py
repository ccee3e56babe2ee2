"""Wave 21: incremental near-dup dedup, epoch repetition plan,
contrastive pair mining."""

from __future__ import annotations

import itertools
import math
from collections import defaultdict

from defi_etl_platform_sqlglot_implementation__spark import registry_llm  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark import registry_llm21  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
N_BATCHES = 8


def _half_away(v):
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def _shingles(text):
    """The _SHINGLES_CTE replay: raw split (empties kept), 3-token
    windows i..i+2 over 1..greatest(1, n-2), distinct."""
    toks = text.split(" ")
    n = len(toks)
    return {" ".join(toks[i - 1:i + 2]) for i in range(1, max(1, n - 2) + 1)}


class TestDedupMinhashIncremental:
    def test_brute_force_replay(self, spark):
        docs = {r.doc_id: r.text
                for r in spark.read.parquet(f"{SF}/documents.parquet")
                .select("doc_id", "text").collect()}
        sh = {d: _shingles(t) for d, t in docs.items()}
        first = {}
        count = defaultdict(int)
        for a, b in itertools.combinations(sorted(docs), 2):
            inter = len(sh[a] & sh[b])
            union = len(sh[a]) + len(sh[b]) - inter
            if union and inter / union >= 0.5:
                count[b] += 1
                first[b] = min(first.get(b, a), a)
        n = len(docs)
        expected = {d: (d * N_BATCHES // n, first.get(d),
                        count[d], d in first)
                    for d in docs}
        got = {r.doc_id: (r.batch, r.first_dup_of, r.n_earlier_dups,
                          r.is_dup_on_arrival)
               for r in QUERIES["dedup_minhash_incremental"](spark, SF)
               .collect()}
        assert got == expected
        assert any(v[3] for v in got.values())      # corpus has near-dups

    def test_first_doc_never_dup_and_batches_monotone(self, spark):
        rows = sorted(QUERIES["dedup_minhash_incremental"](spark, SF)
                      .collect(), key=lambda r: r.doc_id)
        assert rows[0].is_dup_on_arrival is False   # nothing arrived before
        for r in rows:
            if r.first_dup_of is not None:
                assert r.first_dup_of < r.doc_id    # index match is earlier
        batches = [r.batch for r in rows]
        assert batches == sorted(batches)           # spine monotone in id
        assert set(batches) == set(range(N_BATCHES))


class TestEpochRepetitionPlan:
    def test_pure_python_replay(self, spark):
        per = defaultdict(int)
        for r in spark.read.parquet(f"{SF}/documents.parquet") \
                .select("text", "source").collect():
            per[r.source] += len([x for x in r.text.split(" ") if x])
        tot = sum(per.values())
        sq_tot = 0.0
        for s in sorted(per):                       # source-ordered fold
            sq_tot += math.sqrt(float(per[s]))
        expected = {}
        for s, n in per.items():
            demand = _half_away((2.0 * float(tot))
                                * (math.sqrt(float(n)) / sq_tot))
            served = min(demand, 4 * n)
            expected[s] = (n, demand,
                           _half_away(1e4 * demand / n) if n else None,
                           demand > 4 * n, served, demand - served)
        got = {r.source: (r.n_tokens, r.demand_tokens, r.epochs_bp,
                          r.capped, r.served_tokens, r.shortfall_tokens)
               for r in QUERIES["epoch_repetition_plan"](spark, SF)
               .collect()}
        assert got == expected

    def test_budget_conservation_and_regimes(self, spark):
        rows = QUERIES["epoch_repetition_plan"](spark, SF).collect()
        tot = sum(r.n_tokens for r in rows)
        demand = sum(r.demand_tokens for r in rows)
        # sum of demands ~= 2x corpus (rounding drift < one token/source)
        assert abs(demand - 2 * tot) <= len(rows)
        for r in rows:
            assert r.served_tokens <= 4 * r.n_tokens
            assert r.shortfall_tokens == r.demand_tokens - r.served_tokens
            assert r.capped == (r.demand_tokens > 4 * r.n_tokens)
        # sqrt smoothing: smallest source demands MORE epochs than largest
        lo = min(rows, key=lambda r: r.n_tokens)
        hi = max(rows, key=lambda r: r.n_tokens)
        if lo.n_tokens < hi.n_tokens:
            assert lo.epochs_bp > hi.epochs_bp


class TestContrastivePairMining:
    def test_replay_from_topk_gate(self, spark):
        labels = {r.vec_id: r.label
                  for r in spark.read.parquet(f"{SF}/embeddings.parquet")
                  .select("vec_id", "label").collect()}
        top = defaultdict(list)
        for r in QUERIES["similarity_topk"](spark, SF).collect():
            top[r.query_id].append(r)
        expected = {}
        for q, rows in top.items():
            rows.sort(key=lambda r: r.rank)
            ql = labels[q]
            pos = next((r for r in rows if labels[r.neighbor_id] == ql), None)
            neg = next((r for r in rows if labels[r.neighbor_id] != ql), None)
            margin = (_half_away((pos.cosine - neg.cosine) * 1e6)
                      if pos and neg else None)
            expected[q] = (ql,
                           pos.neighbor_id if pos else None,
                           pos.rank if pos else None,
                           neg.neighbor_id if neg else None,
                           neg.rank if neg else None,
                           margin)
        got = {r.query_id: (r.query_label, r.positive_id, r.pos_rank,
                            r.negative_id, r.neg_rank, r.margin_micro)
               for r in QUERIES["contrastive_pair_mining"](spark, SF)
               .collect()}
        assert got == expected
        assert len(got) == 5                        # one row per query

    def test_mined_pairs_are_usable(self, spark):
        rows = QUERIES["contrastive_pair_mining"](spark, SF).collect()
        mined = [r for r in rows
                 if r.positive_id is not None and r.negative_id is not None]
        assert mined                                # corpus yields pairs
        for r in mined:
            assert r.positive_id != r.negative_id
            assert 1 <= r.pos_rank <= 10 and 1 <= r.neg_rank <= 10
            assert r.pos_rank != r.neg_rank
