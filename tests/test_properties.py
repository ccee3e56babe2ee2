"""Hypothesis property tests over the engine's scalar kernels.

These run the *driver-side* pure functions (keccak, checksum) under
hypothesis directly, and spot-check the Spark columnar equivalents on the
generated corpus in a single batched action (one Spark job per property,
not one per example).
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from defi_etl_platform_sqlglot_implementation__spark.functions.keccak import (
    keccak_256,
    to_checksum_address,
)

hex_chars = st.text(alphabet="0123456789abcdef", min_size=40, max_size=40)
uint256 = st.integers(min_value=0, max_value=2**256 - 1)


class TestChecksumProperties:
    @given(hex_chars)
    @settings(max_examples=50, deadline=None)
    def test_checksum_is_case_normalizing_and_idempotent(self, addr40):
        a = to_checksum_address("0x" + addr40)
        assert a.lower() == "0x" + addr40
        assert to_checksum_address(a) == a  # idempotent
        assert to_checksum_address("0x" + addr40.upper().lower()) == a

    @given(st.binary(min_size=0, max_size=300))
    @settings(max_examples=50, deadline=None)
    def test_keccak_is_32_bytes_and_deterministic(self, data):
        d1, d2 = keccak_256(data), keccak_256(data)
        assert len(d1) == 32
        assert d1 == d2


class TestHexDecodeProperties:
    def test_hex_to_double_matches_python_on_corpus(self, spark):
        import random

        from defi_etl_platform_sqlglot_implementation__spark.functions.hex import hex_to_double

        rng = random.Random(42)
        values = [rng.getrandbits(rng.randrange(1, 257)) for _ in range(500)]
        df = spark.createDataFrame([(hex(v),) for v in values], ["h"])
        got = [r[0] for r in df.select(hex_to_double("h")).collect()]
        want = [float(v) for v in values]
        assert got == want  # exact: correctly-rounded int->float64

    def test_swap_price_matches_python_semantics(self, spark):
        import random

        from pyspark.sql import functions as F

        from defi_etl_platform_sqlglot_implementation__spark.operators.swaps import swap_price

        rng = random.Random(7)
        rows = []
        for _ in range(300):
            a0i, a1i, a0o, a1o = (float(rng.choice([0, rng.randrange(1, 10**6)]))
                                  for _ in range(4))
            if a0i == 0 and a1i == 0:
                continue  # dropped by the operator (reference raises)
            rows.append((a0i, a1i, a0o, a1o))
        df = spark.createDataFrame(rows, ["a0i", "a1i", "a0o", "a1o"])
        got = df.select(
            swap_price(F.col("a0i"), F.col("a1i"), F.col("a0o"), F.col("a1o")).alias("p"),
            "a0i", "a1i", "a0o", "a1o",
        ).collect()
        for r in got:
            want = (r["a1o"] / r["a0i"]) if r["a0i"] else ((r["a0o"] / r["a1i"]) or 1)
            assert r["p"] == want or (math.isnan(r["p"]) and math.isnan(want))

    def test_il_monotone_in_abs_log_ratio(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.operators.risk import il_scan

        ratios = [0.1, 0.25, 0.5, 0.9, 1.0, 1.2, 2.0, 4.0, 9.0]
        rows = {r["price_ratio"]: r["il_pct"]
                for r in il_scan(spark, ratios=ratios).collect()}
        # il_pct <= 0 always, == 0 only at ratio 1, decreasing in |log r|
        assert all(v <= 1e-9 for v in rows.values())
        ordered = sorted(rows, key=lambda x: abs(math.log(x)))
        ils = [rows[r] for r in ordered]
        assert all(ils[i] >= ils[i + 1] - 1e-9 for i in range(len(ils) - 1))
