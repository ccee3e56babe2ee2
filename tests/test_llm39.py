"""Wave 40: source JS divergence matrix + token frequency drift."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm29  # noqa: F401 — fills QUERIES (KL)
from defi_etl_platform_sqlglot_implementation__spark import registry_llm39  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry_llm39 import (
    _N_TB,
    _TOP_MOVERS,
)

SF = "/root/testdata/sf0.001"

LN2_MICRO = round(math.log(2) * 1e6)


def _half_away(v):
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


class TestSourceJsDivergence:
    def _counts(self):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        st = defaultdict(Counter)
        for r in docs.itertuples(index=False):
            for w in r.text.split(" "):
                if w:
                    st[r.source][w] += 1
        return st

    def test_pure_python_replay(self, spark):
        st = self._counts()
        ns = {s: sum(c.values()) for s, c in st.items()}

        def kl_half(a, b):
            na, nb = ns[a], ns[b]
            tot = 0
            for tk, c in st[a].items():
                cb = st[b].get(tk, 0)
                ratio = (2.0 * c * nb) / (c * nb + cb * na)
                tot += c * _half_away(math.log(ratio) * 1e6)
            return _half_away(tot / na)

        got = {(r.source_a, r.source_b):
               (r.kl_a_micro, r.kl_b_micro, r.js_micro)
               for r in QUERIES["source_js_divergence_matrix"](spark, SF)
               .collect()}
        srcs = sorted(ns)
        assert len(got) == len(srcs) * (len(srcs) - 1) // 2
        for (a, b), (ka, kb, js) in got.items():
            assert ka == kl_half(a, b)
            assert kb == kl_half(b, a)
            assert js == _half_away((ka + kb) / 2.0)

    def test_js_bounds(self, spark):
        rows = QUERIES["source_js_divergence_matrix"](spark, SF).collect()
        for r in rows:
            # JS is bounded by ln 2 (micro slack for quantization)
            assert 0 <= r.js_micro <= LN2_MICRO + 5
        # sources differ, so some divergence must register
        assert any(r.js_micro > 0 for r in rows)


class TestTokenFreqDrift:
    def test_pure_python_replay(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet") \
            .sort_values("doc_id")
        n = len(docs)
        bc = defaultdict(Counter)
        for i, r in enumerate(docs.itertuples(index=False)):
            b = i * _N_TB // n
            for w in r.text.split(" "):
                if w:
                    bc[b][w] += 1
        bn = {b: sum(c.values()) for b, c in bc.items()}
        exp = {}
        for b in range(1, _N_TB):
            toks = set(bc[b]) | set(bc[b - 1])
            scored = sorted(
                ((abs(bc[b].get(t, 0) * bn[b - 1]
                      - bc[b - 1].get(t, 0) * bn[b]), t) for t in toks),
                key=lambda x: (-x[0], x[1]))[:_TOP_MOVERS]
            for rank, (score, t) in enumerate(scored, 1):
                exp[(b, t)] = (bc[b - 1].get(t, 0), bc[b].get(t, 0),
                               score, rank)
        got = {(r.batch, r.tk): (r.c_prev, r.c_cur, r.shift_score,
                                 r.mover_rank)
               for r in QUERIES["token_freq_drift"](spark, SF).collect()}
        assert got == exp
        assert len(got) == (_N_TB - 1) * _TOP_MOVERS
