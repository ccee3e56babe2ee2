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


def test_winnowing_candidate_pairs_reconstructs(spark):
    """Pure-Python replay of the pair derivation: winnowed sets →
    df-capped fingerprints → shared-count pairs ≥ the floor; plus the
    near-dup recall property on a synthetic long-shared-run pair."""
    from collections import defaultdict

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text").collect()
    by_fp = defaultdict(set)
    for d in docs:
        _, _, sel = _winnow(d.text.split(" "))
        for _, h in sel:
            by_fp[int(h, 16)].add(d.doc_id)
    pair_count = defaultdict(int)
    for fp, ds in by_fp.items():
        if len(ds) > m._FP_DF_CAP:
            continue
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pair_count[(ds[i], ds[j])] += 1
    want = {k: v for k, v in pair_count.items() if v >= m._MIN_SHARED}
    got = {(r.d1, r.d2): r.n_shared for r in
           m.winnowing_candidate_pairs(spark, SF).collect()}
    assert got == want


def test_winnowing_pair_recall_on_shared_run():
    """A pair sharing a run of 2(w+k−1) tokens from a DISTINCT vocab
    shares ≥2 selected fingerprints — the recall argument for the
    _MIN_SHARED floor (each disjoint w+k−1 sub-run guarantees one)."""
    import random

    rng = random.Random(7)
    vocab = [f"v{i}" for i in range(60)]
    run = [f"shared{i}" for i in range(2 * (m._W + m._K - 1))]
    for _ in range(10):
        a = [rng.choice(vocab) for _ in range(20)] + run \
            + [rng.choice(vocab) for _ in range(20)]
        b = [rng.choice(vocab) for _ in range(20)] + run \
            + [rng.choice(vocab) for _ in range(20)]
        _, _, sa = _winnow(a)
        _, _, sb = _winnow(b)
        shared = {h for _, h in sa} & {h for _, h in sb}
        assert len(shared) >= m._MIN_SHARED
