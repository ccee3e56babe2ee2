"""Wave 31: Zipf fit, n-gram entropy curve, dedup rate by batch."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm31  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _half_away(v):
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


class TestZipfFitBySource:
    def test_full_replay(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        cnt = defaultdict(Counter)
        for r in docs.itertuples(index=False):
            cnt[r.source].update(x for x in r.text.split(" ") if x != "")
        want = {}
        for src, c in cnt.items():
            ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
            xs = [_half_away(math.log(i + 1) * 1e3)
                  for i in range(len(ranked))]
            ys = [_half_away(math.log(v) * 1e3) for _, v in ranked]
            n = len(ranked)
            sx, sy = sum(xs), sum(ys)
            sxy = sum(x * y for x, y in zip(xs, ys))
            sxx = sum(x * x for x in xs)
            den = n * sxx - sx * sx
            slope = (None if den == 0
                     else _half_away(1e6 * float(n * sxy - sx * sy)
                                     / float(den)))
            want[src] = (n, sum(c.values()), slope)
            # the documented 2^53 headroom bound actually holds here
            assert abs(n * sxy) < 2 ** 53 and abs(sx * sy) < 2 ** 53
        got = {r.source: (r.n_types, r.n_tokens, r.slope_micro)
               for r in QUERIES["zipf_fit_by_source"](spark, SF).collect()}
        assert got == want

    def test_slopes_are_negative_zipf(self, spark):
        rows = QUERIES["zipf_fit_by_source"](spark, SF).collect()
        assert len(rows) == 20
        # rank 1 has the highest count by construction -> OLS slope < 0
        assert all(r.slope_micro is not None and r.slope_micro < 0
                   for r in rows)


class TestNgramEntropyCurve:
    def test_full_replay(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        want = {}
        for n in (1, 2, 3):
            cnt = defaultdict(Counter)
            for r in docs.itertuples(index=False):
                toks = [x for x in r.text.split(" ") if x != ""]
                cnt[r.source].update(
                    " ".join(toks[i:i + n])
                    for i in range(len(toks) - n + 1))
            for src, c in cnt.items():
                total = sum(c.values())
                b = sum(v * _half_away(math.log(v) * 1e6)
                        for v in c.values())
                want[(src, n)] = (
                    total, len(c),
                    _half_away(math.log(total) * 1e6)
                    - _half_away(b / total))
        got = {(r.source, r.n): (r.total_ngrams, r.distinct_ngrams,
                                 r.entropy_micro)
               for r in QUERIES["ngram_entropy_curve"](spark, SF).collect()}
        assert got == want

    def test_entropy_bounds(self, spark):
        rows = QUERIES["ngram_entropy_curve"](spark, SF).collect()
        assert len(rows) == 60
        for r in rows:
            # 0 <= H <= ln(distinct), up to ~2 micro of quantization
            assert -2 <= r.entropy_micro \
                <= _half_away(math.log(r.distinct_ngrams) * 1e6) + 2


class TestDedupRateByBatch:
    def test_agrees_with_incremental_gate(self, spark):
        base = QUERIES["dedup_minhash_incremental"](spark, SF).collect()
        per = defaultdict(lambda: [0, 0])
        for r in base:
            per[r.batch][0] += 1
            per[r.batch][1] += bool(r.is_dup_on_arrival)
        got = sorted(QUERIES["dedup_rate_by_batch"](spark, SF).collect(),
                     key=lambda r: r.batch)
        assert [r.batch for r in got] == sorted(per)
        cum_a = cum_d = 0
        for r in got:
            arrivals, dups = per[r.batch]
            cum_a += arrivals
            cum_d += dups
            assert (r.arrivals, r.dups) == (arrivals, dups)
            assert r.dup_bp == _half_away(1e4 * dups / arrivals)
            assert r.cum_dup_bp == _half_away(1e4 * cum_d / cum_a)

    def test_signal_present(self, spark):
        rows = QUERIES["dedup_rate_by_batch"](spark, SF).collect()
        assert sum(r.dups for r in rows) > 0       # planted near-dups exist
        assert sum(r.arrivals for r in rows) == 500
