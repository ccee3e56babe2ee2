"""Property tests for the wave-10 batching/sizing gates (registry_llm10):
pure-Python batching replay with padding algebra, coverage-curve
monotonicity + endpoint identities, and per-dimension moment
reconstruction with the half-away-from-zero micro rounding both engines
use.  Cross-engine value evidence lives in the DuckDB oracles."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from defi_etl_platform_sqlglot_implementation__spark import registry_llm10 as m

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text").collect()


def test_length_bucket_batching_reconstructs(spark):
    rows = {(r.source, r.bin): r for r in
            m.length_bucket_batching(spark, SF).collect()}
    groups = defaultdict(list)
    for r in _docs(spark):
        n = len([t for t in r.text.split(" ") if t])
        groups[(r.source, n // m._BIN_TOKENS)].append((r.doc_id, n))
    assert set(rows) == set(groups)
    for key, docs in groups.items():
        docs.sort()
        batches = [docs[i:i + m._BATCH_DOCS]
                   for i in range(0, len(docs), m._BATCH_DOCS)]
        total = sum(n for _, n in docs)
        padded = sum(len(b) * max(n for _, n in b) for b in batches)
        r = rows[key]
        assert (r.n_docs, r.n_batches, r.total_tokens) == (
            len(docs), len(batches), total)
        assert (r.padded_tokens, r.waste_tokens) == (padded, padded - total)
        if padded:
            assert r.waste_bp == int(math.floor(1e4 * (padded - total)
                                                / padded + 0.5))
        # padding waste within a bin is bounded by the bin width
        assert r.waste_tokens <= r.n_docs * (m._BIN_TOKENS - 1)


def test_vocab_coverage_curve_identities(spark):
    rows = sorted(m.vocab_coverage_curve(spark, SF).collect(),
                  key=lambda r: r.k)
    freq = Counter()
    for r in _docs(spark):
        freq.update(t for t in r.text.split(" ") if t)
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(freq.values())
    assert [r.k for r in rows] == list(m._CURVE_KS)
    for r in rows:
        covered = sum(c for _, c in ranked[:r.k])
        assert r.vocab_types == min(r.k, len(ranked))
        assert r.covered_instances == covered
        assert (r.total_instances, r.total_types) == (total, len(freq))
        assert r.oov_bp == int(math.floor(1e4 * (total - covered)
                                          / total + 0.5))
    # more vocabulary never covers less
    for a, b in zip(rows, rows[1:]):
        assert b.covered_instances >= a.covered_instances
        assert b.oov_bp <= a.oov_bp


def _half_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def test_embedding_dim_stats_reconstructs(spark):
    rows = {r.dim: r for r in m.embedding_dim_stats(spark, SF).collect()}
    vecs = [r.embedding for r in
            spark.read.parquet(f"{SF}/embeddings.parquet").collect()]
    dim = len(vecs[0])
    assert set(rows) == set(range(dim))
    for d in range(dim):
        qs = [_half_away(float(v[d]) * 1e6) for v in vecs]
        n, s, qq = len(qs), sum(qs), sum(q * q for q in qs)
        r = rows[d]
        assert (r.n, r.sum_micro) == (n, s)
        assert r.mean_micro == s / n
        assert r.is_biased == (1 if 200 * abs(s) > n * 1_000_000 else 0)
        assert r.is_low_var == (
            1 if n * qq - s * s < n * n * 10_000_000_000 else 0)
    # the synthetic embeddings are roughly centered with per-dim std
    # above the dead-dim bar — an all-flagged report means a threshold
    # or moment bug, not a property of the fixture
    assert sum(r.is_biased for r in rows.values()) < dim
    assert sum(r.is_low_var for r in rows.values()) < dim
