"""MEV exposure scoring, set-based.

The reference scores blocks one at a time in a Python loop
(``MEVExposureModel.score_all_blocks``, risk_models.py:269-284, with
per-block slicing at :225-242). Here the whole thing is two hash aggregates
and one join — the shape that scales: no driver loop, no per-block filter.

Signals (identical arithmetic to risk_models.py):
- sandwich  = min(100, 25 * #pools with >= 3 swaps in the block)   (:244-250)
- frontrun  = 0 if median gas == 0 else
              min(100, max(0, (max_gas/median_gas - 1) * 20))      (:252-262)
  (pandas ``.median()`` is the exact interpolated median -> ``percentile``,
   not percentile_approx; the reference computes ``.std()`` at :255 but
   never uses it — we don't either)
- backrun   = #pools with >= 2 swaps in the block                  (:264-267)
- mev_score = round(min(100, 0.5*sandwich + 0.4*frontrun + 2*backrun), 2)
  with sandwich/frontrun also rounded to 2 in the output            (:234-241)

Blocks are taken from the tx side only (risk_models.py:273); swap-only
blocks don't appear — hence the LEFT join from tx aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mev_scores(tx: DataFrame, swaps: DataFrame) -> DataFrame:
    """(tx: block_number, gas_price_gwei; swaps: block_number, pool)
    -> mev_scores (SURVEY.md §1.4)."""
    tx_agg = tx.groupBy("block_number").agg(
        F.max("gas_price_gwei").alias("gas_max"),
        F.expr("percentile(gas_price_gwei, 0.5)").alias("gas_med"),
    )

    pool_counts = swaps.groupBy("block_number", "pool").agg(F.count("*").alias("n"))
    swap_agg = pool_counts.groupBy("block_number").agg(
        F.sum((F.col("n") >= 3).cast("long")).alias("high_activity_pools"),
        F.sum((F.col("n") >= 2).cast("long")).alias("backrun_pools"),
    )

    joined = tx_agg.join(swap_agg, "block_number", "left")

    sandwich = F.least(
        F.lit(100.0), F.coalesce(F.col("high_activity_pools"), F.lit(0)).cast("double") * 25.0
    )
    frontrun = F.when(
        F.col("gas_med").isNull() | (F.col("gas_med") == 0.0), F.lit(0.0)
    ).otherwise(
        F.least(
            F.lit(100.0),
            F.greatest(F.lit(0.0), (F.col("gas_max") / F.col("gas_med") - 1.0) * 20.0),
        )
    )
    backrun = F.coalesce(F.col("backrun_pools"), F.lit(0)).cast("long")

    composite = F.least(
        F.lit(100.0), sandwich * 0.5 + frontrun * 0.4 + backrun.cast("double") * 2.0
    )

    return joined.select(
        "block_number",
        F.round(composite, 2).alias("mev_score"),
        F.round(sandwich, 2).alias("sandwich_risk"),
        F.round(frontrun, 2).alias("frontrun_risk"),
        backrun.alias("backrun_opportunities"),
    )
