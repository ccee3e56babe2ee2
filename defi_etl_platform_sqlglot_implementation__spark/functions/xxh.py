"""Vectorized xxHash64 — the bit-exact NumPy twin of Spark's ``xxhash64``.

Spark's ``XxHash64`` expression is the standard xxHash64 algorithm
(Cyan4973/xxHash) evaluated over the raw UTF-8 bytes of a string with
seed 42, folding extra arguments left-to-right with the running hash as
the next seed (an ``INT`` argument goes through the 4-byte finalizer).
This module re-implements exactly that in NumPy so the 32-lane minhash
signature fold (operators/dedup.minhash_signatures) can run inside one
Arrow kernel instead of an interpreted per-element higher-order-function
chain — the CodegenFallback scale-killer VERDICT r11 names.

Bit-exactness contract: tests/test_xxh.py checks these kernels against
Spark's own ``xxhash64`` on adversarial lengths (0..130 bytes, all the
stripe/word/4-byte/tail-byte boundaries), multi-byte UTF-8, and the real
testdata shingle corpus.  Any drift is a correctness bug, not a perf
bug: the LSH candidate sets (and therefore every verified near-dup gate)
depend on these exact values.

All arithmetic is uint64 with C wraparound (NumPy array semantics);
signed reinterpretation happens only at the API edge, because Spark
exposes hashes as signed BIGINT and takes mins in signed order.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

SPARK_SEED = 42  # XxHash64's default seed in Spark

_U64 = np.uint64
_SIXTY_FOUR = _U64(64)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    """Rotate-left on uint64 arrays; r must be in 1..63 (callers never
    pass 0 — Java's ``rotateLeft(x, 0)`` is the identity)."""
    rr = _U64(r)
    return (x << rr) | (x >> (_SIXTY_FOUR - rr))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U64(33))
    h = h * _P2
    h = h ^ (h >> _U64(29))
    h = h * _P3
    h = h ^ (h >> _U64(32))
    return h


def xxh64_int32(value: int, seed: np.ndarray | int) -> np.ndarray:
    """xxHash64 4-byte finalizer — Spark's ``XXH64.hashInt``.

    ``seed`` may be an array (the running hash per row when folding a
    multi-argument ``xxhash64(col, lit)``)."""
    s = seed if isinstance(seed, np.ndarray) else np.asarray(seed, _U64)
    h = s + _P5 + _U64(4)
    h = h ^ (_U64(value & 0xFFFFFFFF) * _P1)
    h = _rotl(h, 23) * _P2 + _P3
    return _fmix(h)


def _xxh64_fixed_len(m: np.ndarray, seed: _U64) -> np.ndarray:
    """xxHash64 of k same-length byte rows (k x L uint8 matrix), all rows
    in lockstep.  Mirrors Spark's XXH64.hashUnsafeBytes structure:
    32-byte stripes, remaining 8-byte words, one optional 4-byte word,
    then single bytes."""
    k, length = m.shape
    n_words = length // 8
    words = (np.ascontiguousarray(m[:, : n_words * 8]).view("<u8")
             if n_words else None)

    mask = 0xFFFFFFFFFFFFFFFF
    if length >= 32:
        # seed-derived constants wrap mod 2^64: do the arithmetic in
        # Python ints (NumPy warns on wrapping uint64 *scalars*)
        v1 = np.full(k, _U64((int(seed) + int(_P1) + int(_P2)) & mask), _U64)
        v2 = np.full(k, _U64((int(seed) + int(_P2)) & mask), _U64)
        v3 = np.full(k, seed, _U64)
        v4 = np.full(k, _U64((int(seed) - int(_P1)) & mask), _U64)
        n_stripes = length // 32
        for s in range(n_stripes):
            v1 = _rotl(v1 + words[:, s * 4 + 0] * _P2, 31) * _P1
            v2 = _rotl(v2 + words[:, s * 4 + 1] * _P2, 31) * _P1
            v3 = _rotl(v3 + words[:, s * 4 + 2] * _P2, 31) * _P1
            v4 = _rotl(v4 + words[:, s * 4 + 3] * _P2, 31) * _P1
        h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h = (h ^ (_rotl(v * _P2, 31) * _P1)) * _P1 + _P4
        word_ix = n_stripes * 4
    else:
        h = np.full(k, _U64((int(seed) + int(_P5)) & mask), _U64)
        word_ix = 0

    h = h + _U64(length)

    for w in range(word_ix, n_words):
        h = _rotl(h ^ (_rotl(words[:, w] * _P2, 31) * _P1), 27) * _P1 + _P4

    off = n_words * 8
    if off + 4 <= length:
        u4 = (np.ascontiguousarray(m[:, off : off + 4])
              .view("<u4")[:, 0].astype(_U64))
        h = _rotl(h ^ (u4 * _P1), 23) * _P2 + _P3
        off += 4
    while off < length:
        h = _rotl(h ^ (m[:, off].astype(_U64) * _P5), 11) * _P1
        off += 1
    return _fmix(h)


def xxh64_utf8(data: np.ndarray, offsets: np.ndarray,
               seed: int = SPARK_SEED) -> np.ndarray:
    """xxHash64 of n byte strings given as one flat uint8 buffer plus
    (n+1) offsets into it (the Arrow string layout, zero-copy).

    Vectorizes by grouping strings of equal byte length: each group is
    gathered into a (k, L) matrix and hashed in lockstep, so the Python
    interpreter runs O(distinct lengths) times, not O(n).  Returns
    uint64; reinterpret as int64 for Spark's signed BIGINT view.
    """
    offsets = np.asarray(offsets, np.int64)
    n = len(offsets) - 1
    out = np.empty(n, _U64)
    if n == 0:
        return out
    lens = offsets[1:] - offsets[:-1]
    s = _U64(seed)
    for length in np.unique(lens):
        idx = np.nonzero(lens == length)[0]
        gather = offsets[idx, None] + np.arange(length, dtype=np.int64)
        out[idx] = _xxh64_fixed_len(data[gather], s)
    return out
