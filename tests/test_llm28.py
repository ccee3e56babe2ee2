"""Wave 28: greedy event debounce, dimension correlation, PMI
collocations."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark import registry_llm28  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
WINDOW = dt.timedelta(seconds=86_400)


def _half_away(v):
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


class TestEventDebounce:
    def test_replay_on_corpus(self, spark):
        rows = spark.read.parquet(f"{SF}/events.parquet") \
            .select("user_id", "event_type", "event_id", "ts").collect()
        by_key = defaultdict(list)
        for r in rows:
            by_key[(r.user_id, r.event_type)].append((r.ts, r.event_id))
        want = {}
        for key, evs in by_key.items():
            evs.sort()
            kept_ts = None
            kept_seq = []           # (event_id, ts)
            sup = []
            for ts, eid in evs:
                if kept_ts is None or ts >= kept_ts + WINDOW:
                    kept_seq.append((eid, ts))
                    sup.append(0)
                    kept_ts = ts
                else:
                    sup[-1] += 1
            for (eid, ts), n_sup in zip(kept_seq, sup):
                want[eid] = (key[0], key[1], ts, n_sup)
        got = QUERIES["event_debounce"](spark, SF).collect()
        assert {r.event_id: (r.user_id, r.event_type, r.ts, r.n_suppressed)
                for r in got} == want

    def test_greedy_splits_what_sessionization_merges(self, spark):
        """Events at t = 0s, 30s, 70s with a 60s window: greedy debounce
        keeps {0, 70}; gap-based sessionization would keep only {0}."""
        from defi_etl_platform_sqlglot_implementation__spark.operators.debounce import (
            debounce_events,
        )

        t0 = dt.datetime(2024, 1, 1)
        ev = spark.createDataFrame(
            [(1, "click", 10, t0),
             (1, "click", 11, t0 + dt.timedelta(seconds=30)),
             (1, "click", 12, t0 + dt.timedelta(seconds=70))],
            "user_id long, event_type string, event_id long, ts timestamp")
        got = {r.event_id: r.n_suppressed
               for r in debounce_events(ev, window_s=60).collect()}
        assert got == {10: 1, 12: 0}

    def test_kept_set_is_maximal_and_consistent(self, spark):
        got = QUERIES["event_debounce"](spark, SF).collect()
        n_events = spark.read.parquet(f"{SF}/events.parquet").count()
        # every event is either kept or attributed to exactly one kept row
        assert len(got) + sum(r.n_suppressed for r in got) == n_events
        # kept rows within a key are >= WINDOW apart
        by_key = defaultdict(list)
        for r in got:
            by_key[(r.user_id, r.event_type)].append(r.ts)
        for ts_list in by_key.values():
            ts_list.sort()
            assert all(b - a >= WINDOW for a, b in zip(ts_list, ts_list[1:]))


class TestEmbeddingDimCorrelation:
    def test_replay_on_corpus(self, spark):
        vecs = [r.embedding for r in
                spark.read.parquet(f"{SF}/embeddings.parquet").collect()]
        q = [[_half_away(float(x) * 1e3) for x in v] for v in vecs]
        n = len(q)
        dim = len(q[0])
        got = QUERIES["embedding_dim_correlation"](spark, SF).collect()
        assert len(got) == dim * (dim - 1) // 2
        by_pair = {(r.dim_i, r.dim_j): r for r in got}
        for i in range(dim):
            for j in range(i + 1, dim):
                si = sum(v[i] for v in q)
                sj = sum(v[j] for v in q)
                p = sum(v[i] * v[j] for v in q)
                qi = sum(v[i] * v[i] for v in q)
                qj = sum(v[j] * v[j] for v in q)
                num = n * p - si * sj
                r = by_pair[(i, j)]
                assert (r.n, r.sum_i_milli, r.sum_j_milli) == (n, si, sj)
                assert r.corr_sign == (1 if num > 0 else -1 if num < 0 else 0)
                want_flag = int(4 * num * num
                                > (n * qi - si * si) * (n * qj - sj * sj))
                assert r.is_high_corr == want_flag

    def test_flag_matches_float_correlation(self, spark):
        """The integer inequality must agree with the float |corr| > 0.5
        decision away from the boundary."""
        import numpy as np

        vecs = np.array(
            [r.embedding for r in
             spark.read.parquet(f"{SF}/embeddings.parquet").collect()],
            dtype=np.float64)
        qm = np.round(vecs * 1e3)
        corr = np.corrcoef(qm.T)
        got = QUERIES["embedding_dim_correlation"](spark, SF).collect()
        for r in got:
            c = corr[r.dim_i, r.dim_j]
            if abs(abs(c) - 0.5) > 1e-6:
                assert r.is_high_corr == int(abs(c) > 0.5)


class TestTokenPmiCollocations:
    def test_replay_on_corpus(self, spark):
        rows = spark.read.parquet(f"{SF}/documents.parquet") \
            .select("text").collect()
        cab, cl, cr = Counter(), Counter(), Counter()
        n = 0
        for r in rows:
            toks = [x for x in r.text.split(" ") if x]
            for a, b in zip(toks, toks[1:]):
                cab[(a, b)] += 1
                cl[a] += 1
                cr[b] += 1
                n += 1
        scored = []
        for (a, b), c in cab.items():
            if c >= 5:
                pmi = _half_away(math.log((c * n) / (cl[a] * cr[b])) * 1e6)
                scored.append((-pmi, a, b, c, cl[a], cr[b]))
        scored.sort()
        want = [(a, b, c, l, r_, -negpmi)
                for negpmi, a, b, c, l, r_ in scored[:20]]
        got = [(r.a, r.b, r.c_ab, r.c_left, r.c_right, r.pmi_micro)
               for r in QUERIES["token_pmi_collocations"](spark, SF)
               .collect()]
        assert got == want

    def test_top_rows_are_positive_associations(self, spark):
        got = QUERIES["token_pmi_collocations"](spark, SF).collect()
        assert len(got) == 20
        assert all(r.c_ab >= 5 for r in got)
        pm = [r.pmi_micro for r in got]
        assert pm == sorted(pm, reverse=True)
