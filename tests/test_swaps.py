"""DeFiSwapParser semantics — slot decode + the price fallback chain
(reference etl_pipeline.py:137-188; the parser the reference never tests)."""

from defi_etl_platform_sqlglot_implementation__spark.operators.swaps import parse_swaps

from .conftest import events_df, make_swap_message, make_transfer_message

E18 = 10**18


class TestParseSwaps:
    def test_basic_decode_and_price(self, spark):
        # sell 2 token0 for 6000 token1 -> price 3000
        msg = make_swap_message(a0i=2 * E18, a1o=6000 * E18)
        r = parse_swaps(events_df(spark, [msg])).collect()[0]
        assert r["protocol"] == "uniswap_v2"
        assert r["amount0_in"] == float(2 * E18)
        assert r["amount1_out"] == float(6000 * E18)
        assert r["price"] == 3000.0

    def test_price_fallback_branch(self, spark):
        # a0i == 0 -> price = a0o / a1i
        msg = make_swap_message(a1i=4 * E18, a0o=2 * E18)
        r = parse_swaps(events_df(spark, [msg])).collect()[0]
        assert r["price"] == 0.5

    def test_price_or_1_quirk(self, spark):
        # a0i == 0 and a0o/a1i == 0 -> the reference's `or 1` kicks in
        msg = make_swap_message(a1i=4 * E18, a0o=0)
        r = parse_swaps(events_df(spark, [msg])).collect()[0]
        assert r["price"] == 1.0

    def test_both_denominators_zero_dropped(self, spark):
        # reference raises ZeroDivisionError -> except -> row dropped
        msg = make_swap_message(a0i=0, a1i=0, a0o=5, a1o=5)
        assert parse_swaps(events_df(spark, [msg])).count() == 0

    def test_non_swap_topics_skipped(self, spark):
        df = parse_swaps(
            events_df(spark, [make_transfer_message(), make_swap_message(a0i=1, a1o=1)])
        )
        assert df.count() == 1

    def test_uint256_overflow_degrades_to_float(self, spark):
        # amounts beyond 2^53 keep float64 semantics (etl_pipeline.py:129)
        big = 2**200
        msg = make_swap_message(a0i=big, a1o=big)
        r = parse_swaps(events_df(spark, [msg])).collect()[0]
        assert r["amount0_in"] == float(big)
        assert r["price"] == 1.0
