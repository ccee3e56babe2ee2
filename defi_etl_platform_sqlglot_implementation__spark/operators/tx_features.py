"""Transaction feature engineering + per-block aggregation.

Re-expression of the reference's ``TransactionFeatureEngineer``
(etl_pipeline.py:195-252) as declarative column expressions plus one
rows-frame window.

Faithful semantics:
- gas_price_gwei = float(gas_price)/1e9; value_eth = float(value_wei)/1e18
  (:209-214) — strings cast to double, preserving the float64 degradation
- is_contract_deploy = ``to`` IS NULL                         (:217)
- fn_selector = input[:10]; fn_name = map lookup, 'unknown' fill;
  is_defi_tx = fn_name != 'unknown'                            (:220-223)
- gas_p90 = trailing-100-row exact 0.9-quantile after sorting by
  block_number, min_periods=1                                  (:226-232)
- is_high_priority = gas_price_gwei > gas_p90 (strict)         (:233)

Ordering note: pandas ``sort_values`` is stable, so rows tie-broken by
their input order within equal block_number. A distributed engine has no
"input order" on an unordered DataFrame, so callers pass ``order_cols`` (a
deterministic total order; default block_number then nonce) — the one place
the reference relies on incidental frame order.

Scale note (100 TB): the rolling window is a single global ``orderBy`` —
one task at scale (SURVEY.md §7.4.5). ``partition_col`` (e.g. chain_id or a
date bucket) makes it a partitioned window; the reference-parity default
stays global.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hex import fn_selector as _fn_selector
from ..functions.maps import token_standards_col

GAS_P90_WINDOW = 100  # trailing rows, reference etl_pipeline.py:230


def engineer_transactions(
    tx: DataFrame,
    order_cols: Sequence[str] = ("block_number", "nonce"),
    partition_col: str | None = None,
) -> DataFrame:
    """Raw tx payload columns (+ envelope block_number/block_timestamp/
    chain_id) -> engineered feature columns (SURVEY.md §1.4 `transactions`).
    """
    cols = set(tx.columns)
    df = tx

    if "gas_price" in cols:
        df = df.withColumn("gas_price_gwei", F.col("gas_price").cast("double") / 1e9)
    if "value_wei" in cols:
        df = df.withColumn("value_eth", F.col("value_wei").cast("double") / 1e18)

    df = df.withColumn("is_contract_deploy", F.col("to").isNull())

    if "input" in cols:
        df = (
            df.withColumn("fn_selector", _fn_selector(F.col("input")))
            .withColumn("fn_name", token_standards_col(F.col("fn_selector")))
            .withColumn("is_defi_tx", F.col("fn_name") != "unknown")
        )

    if "gas_price" in cols:
        from .scale import rolling_quantile_exact

        # exact trailing quantile; min_periods=1 == rows-frame semantics.
        # pandas rolling kernel == reference's own rolling().quantile(0.9)
        # (etl_pipeline.py:230) and == percentile() over a rows frame —
        # same linear interpolation on the same doubles.
        df = rolling_quantile_exact(
            df, order_cols, "gas_price_gwei", 0.9, GAS_P90_WINDOW,
            out="gas_p90",
            partition_col=F.col(partition_col) if partition_col is not None else None,
        )
        df = df.withColumn("is_high_priority", F.col("gas_price_gwei") > F.col("gas_p90"))

    return df


def aggregate_by_block(tx: DataFrame) -> DataFrame:
    """Per-block multi-aggregate (etl_pipeline.py:238-252): one hash
    aggregate with map-side partial aggregation — no window, no sort."""
    cols = set(tx.columns)
    count_col = "hash" if "hash" in cols else "block_number"
    return tx.groupBy("block_number").agg(
        F.count(count_col).alias("tx_count"),
        F.sum("value_eth").alias("total_eth_volume"),
        F.avg("gas_price_gwei").alias("avg_gas_price_gwei"),
        F.max("gas_price_gwei").alias("max_gas_price_gwei"),
        F.sum(F.col("is_defi_tx").cast("long")).alias("defi_tx_count"),
        F.sum(F.col("is_contract_deploy").cast("long")).alias("contract_deploys"),
    )
