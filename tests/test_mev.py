"""MEV scoring parity (reference tests :330-373) — set-based vs the
reference's per-block loop, same arithmetic."""

from defi_etl_platform_sqlglot_implementation__spark.operators.mev import mev_scores


def _frames(spark):
    tx = spark.createDataFrame(
        [(100, 50.0), (100, 200.0), (100, 55.0), (101, 60.0)],
        ["block_number", "gas_price_gwei"],
    )
    swaps = spark.createDataFrame(
        [(100, "0xpool1"), (100, "0xpool1"), (100, "0xpool2")],
        ["block_number", "pool"],
    )
    return tx, swaps


class TestMEV:
    def test_scores_in_range(self, spark):
        tx, swaps = _frames(spark)
        rows = mev_scores(tx, swaps).collect()
        assert all(0 <= r["mev_score"] <= 100 for r in rows)

    def test_exact_reference_arithmetic(self, spark):
        tx, swaps = _frames(spark)
        rows = {r["block_number"]: r for r in mev_scores(tx, swaps).collect()}
        # block 100: gas med=55, max=200 -> frontrun=min(100,(200/55-1)*20)=52.73
        # pools: pool1 has 2 swaps (backrun), none >=3 (sandwich 0)
        r100 = rows[100]
        assert r100["sandwich_risk"] == 0.0
        assert r100["frontrun_risk"] == round((200 / 55 - 1) * 20, 2)
        assert r100["backrun_opportunities"] == 1
        want = min(100.0, 0.0 * 0.5 + (200 / 55 - 1) * 20 * 0.4 + 1 * 2)
        assert r100["mev_score"] == round(want, 2)
        # block 101: single tx, med == max -> frontrun 0; no swaps
        r101 = rows[101]
        assert r101["mev_score"] == 0.0
        assert r101["backrun_opportunities"] == 0

    def test_sandwich_trigger(self, spark):
        tx = spark.createDataFrame([(7, 10.0)], ["block_number", "gas_price_gwei"])
        swaps = spark.createDataFrame(
            [(7, "p1")] * 3 + [(7, "p2")] * 2, ["block_number", "pool"]
        )
        r = mev_scores(tx, swaps).collect()[0]
        assert r["sandwich_risk"] == 25.0          # one pool with >=3 swaps
        assert r["backrun_opportunities"] == 2     # both pools >=2

    def test_gas_variance_monotone_frontrun(self, spark):
        low = spark.createDataFrame(
            [(100, 50.0), (100, 51.0), (100, 52.0)], ["block_number", "gas_price_gwei"]
        )
        high = spark.createDataFrame(
            [(100, 50.0), (100, 500.0), (100, 52.0)], ["block_number", "gas_price_gwei"]
        )
        empty_swaps = spark.createDataFrame([], "block_number: long, pool: string")
        lo = mev_scores(low, empty_swaps).collect()[0]["frontrun_risk"]
        hi = mev_scores(high, empty_swaps).collect()[0]["frontrun_risk"]
        assert hi >= lo

    def test_blocks_from_tx_side_only(self, spark):
        tx = spark.createDataFrame([(1, 10.0)], ["block_number", "gas_price_gwei"])
        swaps = spark.createDataFrame([(2, "p")], ["block_number", "pool"])
        rows = mev_scores(tx, swaps).collect()
        assert [r["block_number"] for r in rows] == [1]

    def test_empty_tx_empty_output(self, spark):
        tx = spark.createDataFrame([], "block_number: long, gas_price_gwei: double")
        swaps = spark.createDataFrame([], "block_number: long, pool: string")
        assert mev_scores(tx, swaps).count() == 0
