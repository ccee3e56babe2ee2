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
