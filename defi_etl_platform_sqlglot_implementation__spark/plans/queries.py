"""Canonical analytics SQL — the queries the reference only *transpiles*
(SQLGlotQueryBuilder, etl_pipeline.py:259-297), here actually *executed*.

The reference stores Postgres-dialect strings and sqlglot-translates them to
seven dialects without ever running one (SURVEY.md §2.11). Spark is one of
its listed targets, so the capability collapses to: register the analytic
views, run ``spark.sql``. Catalyst provides the parse -> analyze ->
optimize -> physical-plan lifecycle the reference's sqlglot path stops short
of (SURVEY.md §3.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Spark-dialect canonical queries (the reference's Postgres texts at
# etl_pipeline.py:267-297, expressed in the executing dialect; NOW() ->
# current_timestamp(), quoted "from"/"to" -> backticks).
TRANSFER_VOLUME_SQL = """
    SELECT
        DATE_TRUNC('hour', block_timestamp)    AS hour_bucket,
        contract                               AS token_contract,
        standard                               AS token_standard,
        chain_id,
        COUNT(*)                               AS transfer_count,
        SUM(amount / 1e18)                     AS volume_normalized,
        COUNT(DISTINCT `from`)                 AS unique_senders,
        COUNT(DISTINCT `to`)                   AS unique_receivers
    FROM token_transfers
    WHERE block_timestamp >= current_timestamp() - INTERVAL 24 HOURS
      AND standard = 'ERC-20'
    GROUP BY 1, 2, 3, 4
    ORDER BY hour_bucket DESC
"""

SWAP_PRICE_IMPACT_SQL = """
    SELECT
        pool,
        protocol,
        chain_id,
        AVG(price)                             AS avg_price,
        STDDEV(price)                          AS price_volatility,
        SUM(amount0_in + amount0_out)          AS total_volume_token0,
        COUNT(*)                               AS swap_count
    FROM defi_swaps
    WHERE block_timestamp >= current_timestamp() - INTERVAL 1 HOUR
    GROUP BY 1, 2, 3
    HAVING COUNT(*) > 5
"""

CANONICAL_QUERIES: dict[str, str] = {
    "transfer_volume": TRANSFER_VOLUME_SQL,
    "swap_price_impact": SWAP_PRICE_IMPACT_SQL,
}


def run_canonical(spark: SparkSession, name: str) -> DataFrame:
    """Execute a registered canonical query against the session catalog
    (requires ``token_transfers`` / ``defi_swaps`` temp views)."""
    return spark.sql(CANONICAL_QUERIES[name])


def build_block_range_query(
    start_block: int, end_block: int, table: str = "transactions"
) -> str:
    """Programmatic block-range query (reference builds this through the
    sqlglot expression API, etl_pipeline.py:329-351; the DataFrame API is
    our AST, this keeps the SQL-text contract)."""
    return (
        f"SELECT * FROM {table} "
        f"WHERE block_number BETWEEN {int(start_block)} AND {int(end_block)} "
        f"ORDER BY block_number"
    )


def block_range(spark: SparkSession, start_block: int, end_block: int,
                table: str = "transactions") -> DataFrame:
    """The same query as a DataFrame plan — Catalyst's logical plan is the
    reference's sqlglot AST (SURVEY.md §2.11 Q2)."""
    from pyspark.sql import functions as F

    return (
        spark.table(table)
        .where(F.col("block_number").between(start_block, end_block))
        .orderBy("block_number")
    )
