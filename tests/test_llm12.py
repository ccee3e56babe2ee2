"""Property tests for the wave-12 scalar-quantization gate
(registry_llm12): pure-Python replay of the per-dimension affine int8
quantize → reconstruct → error pricing, plus the compression invariants
(codes span [0, 255], zero error only where the dimension is constant
or the grid happens to hit the value, error bounded by half a grid
step). Cross-engine value evidence lives in the DuckDB oracle."""

from __future__ import annotations

import math
from collections import defaultdict

from defi_etl_platform_sqlglot_implementation__spark import registry_llm12 as m

SF = "/root/testdata/sf0.001"


def test_sq8_reconstructs(spark):
    vecs = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "embedding").collect()
    per_dim = defaultdict(list)
    for r in vecs:
        for d, xf in enumerate(r.embedding):
            per_dim[d].append(float(xf))        # float32 -> double, exact
    got = {r.dim: r for r in m.embedding_sq8_error(spark, SF).collect()}
    assert set(got) == set(per_dim)
    for d, xs in per_dim.items():
        mn, mx = min(xs), max(xs)
        r = got[d]
        assert (r.n, r.mn, r.mx) == (len(xs), mn, mx)
        scale = m._LEVELS / (mx - mn) if mx > mn else None
        codes, sq_sum, abs_max = [], 0, 0
        for x in xs:
            if scale is None:
                code, recon = 0, mn
            else:
                code = int(math.floor((x - mn) * scale + 0.5))
                recon = mn + code / scale
            err = x - recon
            codes.append(code)
            sq_sum += int(math.floor(1.0e12 * (err * err) + 0.5))
            abs_max = max(abs_max,
                          int(math.floor(1.0e12 * abs(err) + 0.5)))
        assert (r.code_min, r.code_max) == (min(codes), max(codes)), d
        assert r.sum_sq_err_pico == sq_sum, d
        assert r.max_abs_err_pico == abs_max, d
        # codes live on the int8 affine grid
        assert 0 <= r.code_min and r.code_max <= 255
        if scale is not None:
            # |err| <= half a grid step (+1 pico for the quantization)
            half_step = 0.5 / scale
            assert r.max_abs_err_pico <= 1.0e12 * half_step + 1


def test_heldout_perplexity_reconstructs(spark):
    """Pure-Python replay: md5 split, train-only Laplace bigram LM,
    micro-nat scoring of every val/test bigram, unseen counts — n_docs
    counts ALL held-out docs (zero-bigram included)."""
    import hashlib
    from collections import Counter

    def _half_away(v):
        return int(math.floor(v + 0.5)) if v >= 0 \
            else int(math.ceil(v - 0.5))

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text").collect()

    def split_of(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
        return "val" if h in "cd" else "test" if h in "ef" else "train"

    cab, ca = Counter(), Counter()
    vocab_t = set()
    held = defaultdict(list)            # split -> [(doc_id, pairs)]
    n_docs_all = defaultdict(int)       # split -> ALL docs incl. 0-bigram
    for r in docs:
        toks = [x for x in r.text.split(" ") if x]   # _NTOK convention
        sp = split_of(r.doc_id)
        pairs = list(zip(toks, toks[1:])) if len(toks) >= 2 else []
        if sp == "train":
            vocab_t.update(toks)
            for p in pairs:
                cab[p] += 1
                ca[p[0]] += 1
        else:
            n_docs_all[sp] += 1
            held[sp].append((r.doc_id, pairs))
    v = len(vocab_t)

    got = {r.split: r for r in
           m.heldout_bigram_perplexity(spark, SF).collect()}
    assert set(got) == set(n_docs_all)
    for sp, entries in held.items():
        lp = unseen = nbg = 0
        for _, pairs in entries:
            for p in pairs:
                nbg += 1
                if p not in cab:
                    unseen += 1
                lp += _half_away(
                    math.log((cab[p] + 1) / (ca[p[0]] + v)) * 1e6)
        r = got[sp]
        assert (r.n_docs, r.n_bigrams) == (n_docs_all[sp], nbg), sp
        assert (r.lp_micro_total, r.unseen_bigrams) == (lp, unseen), sp
        # consistency: every bigram contributes a negative log-prob
        assert r.lp_micro_total < 0 and 0 <= r.unseen_bigrams <= r.n_bigrams
