"""Wave 50: Gopher strictness curve + IVF codebook-size curve.

Both gates get FULL independent Python replays (tokenize/metrics/level
flags from the parquet; assignment/probes/candidates/top-k from the
exact left-assoc double fold), plus the cross-gate pins their
docstrings claim: the standard strictness row == gopher_quality_flags'
column sums; the 16-cell codebook row rides similarity_ann_recall's
hits and ivf_balance_report's occupancy numbers.
"""

from __future__ import annotations

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm  # noqa: F401
from defi_etl_platform_sqlglot_implementation__spark import registry_llm5  # noqa: F401
from defi_etl_platform_sqlglot_implementation__spark import registry_llm17  # noqa: F401
from defi_etl_platform_sqlglot_implementation__spark import registry_llm49  # noqa: F401
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry_llm49 import (
    _CB_K,
    _CB_NPROBE,
    _CB_SIZES,
    _STRICT_LEVELS,
)

SF = "/root/testdata/sf0.001"


def _metrics(text: str):
    toks = [x for x in text.split(" ") if x != ""]
    if not toks:
        return None
    counts: dict[str, int] = {}
    for tok in toks:
        counts[tok] = counts.get(tok, 0) + 1
    return {
        "n_words": len(toks),
        "n_chars": sum(len(t) for t in toks),
        "n_distinct": len(counts),
        "top_tok": max(counts.values()),
        "stop_hits": counts.get("the", 0) + counts.get("a", 0),
    }


def _level_flags(m, llo, lhi, wlo, whi, dp, tp, smin):
    if m is None:
        return dict.fromkeys(
            ("len", "wlen", "distinct", "toptok", "stop"), False)
    return {
        "len": llo <= m["n_words"] <= lhi,
        "wlen": wlo <= (m["n_chars"] * 100) // m["n_words"] <= whi,
        "distinct": m["n_distinct"] * 100 > m["n_words"] * dp,
        "toptok": m["top_tok"] * 100 < m["n_words"] * tp,
        "stop": m["stop_hits"] >= smin,
    }


class TestGopherStrictnessCurve:
    def test_full_replay_and_monotone(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        ms = [_metrics(r.text) for r in docs.itertuples(index=False)]
        got = {r.level_rank: r for r in
               QUERIES["gopher_strictness_curve"](spark, SF).collect()}
        assert set(got) == {lv[0] for lv in _STRICT_LEVELS}
        for rank, name, *thr in _STRICT_LEVELS:
            flags = [_level_flags(m, *thr) for m in ms]
            g = got[rank]
            assert g.level == name
            assert g.n_docs == len(ms)
            for key in ("len", "wlen", "distinct", "toptok", "stop"):
                assert getattr(g, f"pass_{key}") == sum(
                    f[key] for f in flags)
            kept = sum(all(f.values()) for f in flags)
            assert g.kept_docs == kept
            assert g.kept_rate_bp == (kept * 10000) // len(ms)
        # containment theorem: nested acceptance regions => every count
        # non-increasing in strictness
        for a, b in zip(sorted(got), sorted(got)[1:]):
            for col in ("pass_len", "pass_wlen", "pass_distinct",
                        "pass_toptok", "pass_stop", "kept_docs",
                        "kept_rate_bp"):
                assert getattr(got[a], col) >= getattr(got[b], col)
        # the corpus separates the levels (a real dial)
        assert got[1].kept_docs > got[2].kept_docs > got[3].kept_docs

    def test_standard_row_is_gopher_quality_flags(self, spark):
        rows = QUERIES["gopher_quality_flags"](spark, SF).collect()
        std = {r.level_rank: r for r in
               QUERIES["gopher_strictness_curve"](spark, SF).collect()}[2]
        assert std.n_docs == len(rows)
        assert std.pass_len == sum(r.f_len for r in rows)
        assert std.pass_wlen == sum(r.f_wlen for r in rows)
        assert std.pass_distinct == sum(r.f_distinct for r in rows)
        assert std.pass_toptok == sum(r.f_toptok for r in rows)
        assert std.pass_stop == sum(r.f_stop for r in rows)
        assert std.kept_docs == sum(r.keep for r in rows)


def _dot_fold(a, b) -> float:
    acc = float(a[0]) * float(b[0])
    for i in range(1, len(a)):
        acc += float(a[i]) * float(b[i])
    return acc


def _cos(a, b) -> float:
    return _dot_fold(a, b) / (
        _dot_fold(a, a) ** 0.5 * _dot_fold(b, b) ** 0.5)


class TestIvfCodebookSizeCurve:
    def test_full_replay(self, spark):
        emb = {int(r.vec_id): list(r.embedding) for r in
               spark.read.parquet(f"{SF}/embeddings.parquet").collect()}
        qids = [v for v in emb if v < 5]
        truth = {}
        for qid in qids:
            order = sorted((n for n in emb if n != qid),
                           key=lambda n: (-_cos(emb[qid], emb[n]), n))
            truth[qid] = set(order[:_CB_K])
        n_truth = sum(len(v) for v in truth.values())

        got = {r.n_centroids: r for r in
               QUERIES["ivf_codebook_size_curve"](spark, SF).collect()}
        assert set(got) == set(_CB_SIZES)
        for n in _CB_SIZES:
            cents = sorted(v for v in emb if v < n)
            asg = {v: min(cents, key=lambda c: (-_cos(emb[v], emb[c]), c))
                   for v in emb}
            cells: dict[int, int] = {}
            for c in asg.values():
                cells[c] = cells.get(c, 0) + 1
            probes = {qid: sorted(cents, key=lambda c:
                                  (-_cos(emb[qid], emb[c]), c))[:_CB_NPROBE]
                      for qid in qids}
            candidates = sum(
                sum(cells.get(c, 0) for c in probes[qid])
                - (1 if asg[qid] in probes[qid] else 0)
                for qid in qids)
            hits = 0
            for qid in qids:
                cand = [v for v in emb
                        if asg[v] in probes[qid] and v != qid]
                top = sorted(cand,
                             key=lambda v: (-_cos(emb[qid], emb[v]), v))
                hits += sum(1 for v in top[:_CB_K] if v in truth[qid])
            g = got[n]
            assert g.occupied_cells == len(cells)
            assert g.max_cell_share_bp == \
                (max(cells.values()) * 10000) // len(emb)
            assert g.candidates == candidates
            assert g.hits == hits
            assert g.recall_bp == (hits * 10000) // n_truth

    def test_cross_gate_pins_and_dial(self, spark):
        got = {r.n_centroids: r for r in
               QUERIES["ivf_codebook_size_curve"](spark, SF).collect()}
        # the 16-cell row rides similarity_ann_recall's exact chains
        rec = QUERIES["similarity_ann_recall"](spark, SF).collect()
        assert got[16].hits == sum(r.hits for r in rec)
        assert got[16].recall_bp == \
            (sum(r.hits for r in rec) * 10000) // sum(r.k for r in rec)
        # ... and ivf_balance_report's occupancy numbers
        bal = QUERIES["ivf_balance_report"](spark, SF).collect()
        assert got[16].occupied_cells == len(bal)
        assert got[16].max_cell_share_bp == \
            (max(r.n_vecs for r in bal) * 10000) // \
            sum(r.n_vecs for r in bal)
        # the dial: cost (candidates at fixed nprobe) falls as cells
        # multiply, and on this corpus recall falls with the explored
        # fraction (the near-isotropic honesty convention)
        sizes = sorted(got)
        for a, b in zip(sizes, sizes[1:]):
            assert got[a].candidates > got[b].candidates
            assert got[a].recall_bp >= got[b].recall_bp
        assert got[sizes[0]].recall_bp > got[sizes[-1]].recall_bp
