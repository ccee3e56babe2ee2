"""Property tests for the wave-13 winnowing gate (registry_llm13):
pure-Python replay of the k-gram hash → window min → rightmost-tie
selection, the density expectation, and the scheme's defining
guarantee — two documents sharing a run of at least w+k−1 tokens share
at least one selected fingerprint hash."""

from __future__ import annotations

import hashlib

from defi_etl_platform_sqlglot_implementation__spark import registry_llm13 as m

SF = "/root/testdata/sf0.001"


def _winnow(tokens: list[str]):
    """Reference winnowing: returns (n_pos, n_win, selected {(p, h)})."""
    k, w = m._K, m._W
    if len(tokens) < k:
        return 0, 0, set()
    hashes = [
        hashlib.md5(" ".join(tokens[i:i + k]).encode()).hexdigest()[:15]
        for i in range(len(tokens) - k + 1)
    ]
    n_pos = len(hashes)
    n_win = max(1, n_pos - w + 1)
    selected = set()
    for j in range(n_win):
        window = hashes[j:j + w]
        best = min(window)
        # rightmost position achieving the min
        off = max(i for i, h in enumerate(window) if h == best)
        selected.add((j + off + 1, best))     # 1-based position
    return n_pos, n_win, selected


def test_winnowing_reconstructs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text").collect()
    got = {r.doc_id: r for r in
           m.winnowing_fingerprints(spark, SF).collect()}
    assert set(got) == {r.doc_id for r in docs}
    total_fp = total_win = 0
    for d in docs:
        n_pos, n_win, sel = _winnow(d.text.split(" "))
        r = got[d.doc_id]
        assert (r.n_positions, r.n_windows) == (n_pos, n_win), d.doc_id
        assert r.n_fingerprints == len({p for p, _ in sel}), d.doc_id
        if sel:
            assert r.min_fp == min(h for _, h in sel), d.doc_id
        else:
            assert r.min_fp is None
        total_fp += r.n_fingerprints
        total_win += r.n_windows
    # density: expected 2/(w+1) of positions; loose sanity bounds —
    # selected set must compress the windows but not collapse
    assert 0 < total_fp < total_win


def test_winnowing_guarantee(spark):
    """Any shared token run of length >= w+k-1 yields a shared selected
    fingerprint — the property that makes winnowed sets a sound
    candidate index. Checked on adversarial synthetic pairs."""
    import random

    rng = random.Random(13)
    vocab = [f"tk{i}" for i in range(50)]
    run_len = m._W + m._K - 1          # the guarantee threshold
    for trial in range(20):
        shared = [rng.choice(vocab) for _ in range(run_len)]
        a = [rng.choice(vocab) for _ in range(rng.randint(0, 30))] \
            + shared + [rng.choice(vocab) for _ in range(rng.randint(0, 30))]
        b = [rng.choice(vocab) for _ in range(rng.randint(0, 30))] \
            + shared + [rng.choice(vocab) for _ in range(rng.randint(0, 30))]
        _, _, sa = _winnow(a)
        _, _, sb = _winnow(b)
        ha = {h for _, h in sa}
        hb = {h for _, h in sb}
        assert ha & hb, (trial, shared)
