"""Write-once, emit-anywhere canonical SQL (SURVEY.md §2.11 Q1).

The reference's sqlglot layer transpiles its two canonical Postgres queries
to seven warehouse dialects without executing any of them
(etl_pipeline.py:299-327). This engine *executes* the Spark dialect
(plans/queries.py); this module keeps the multi-dialect *emission* contract
with a small explicit rule table instead of a transpiler dependency — the
dialect differences these two queries actually exercise are identifier
quoting, NOW(), interval literals, and hour truncation.

``sqlglot`` remains optionally available through plans.sqlutil.transpile
for arbitrary SQL when installed.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class DialectRules:
    quote: str                 # identifier quote char for reserved words
    now: str                   # current-timestamp expression
    interval_24h: str
    interval_1h: str
    hour_trunc: str            # {col} placeholder


DIALECTS: dict[str, DialectRules] = {
    "postgres": DialectRules('"', "NOW()", "INTERVAL '24 hours'",
                             "INTERVAL '1 hour'", "DATE_TRUNC('hour', {col})"),
    "duckdb": DialectRules('"', "NOW()", "INTERVAL '24 hours'",
                           "INTERVAL '1 hour'", "DATE_TRUNC('hour', {col})"),
    "snowflake": DialectRules('"', "CURRENT_TIMESTAMP()", "INTERVAL '24 hours'",
                              "INTERVAL '1 hour'", "DATE_TRUNC('hour', {col})"),
    "trino": DialectRules('"', "CURRENT_TIMESTAMP", "INTERVAL '24' HOUR",
                          "INTERVAL '1' HOUR", "DATE_TRUNC('hour', {col})"),
    "bigquery": DialectRules('`', "CURRENT_TIMESTAMP()", "INTERVAL 24 HOUR",
                             "INTERVAL 1 HOUR", "TIMESTAMP_TRUNC({col}, HOUR)"),
    "mysql": DialectRules('`', "NOW()", "INTERVAL 24 HOUR", "INTERVAL 1 HOUR",
                          "STR_TO_DATE(DATE_FORMAT({col}, '%Y-%m-%d %H:00:00'), "
                          "'%Y-%m-%d %H:%i:%s')"),
    "spark": DialectRules('`', "current_timestamp()", "INTERVAL 24 HOURS",
                          "INTERVAL 1 HOUR", "DATE_TRUNC('hour', {col})"),
}


def transfer_volume_sql(dialect: str) -> str:
    r = DIALECTS[dialect]
    q = r.quote
    return f"""
    SELECT
        {r.hour_trunc.format(col='block_timestamp')} AS hour_bucket,
        contract                               AS token_contract,
        standard                               AS token_standard,
        chain_id,
        COUNT(*)                               AS transfer_count,
        SUM(amount / 1e18)                     AS volume_normalized,
        COUNT(DISTINCT {q}from{q})             AS unique_senders,
        COUNT(DISTINCT {q}to{q})               AS unique_receivers
    FROM token_transfers
    WHERE block_timestamp >= {r.now} - {r.interval_24h}
      AND standard = 'ERC-20'
    GROUP BY 1, 2, 3, 4
    ORDER BY hour_bucket DESC
    """


def swap_price_impact_sql(dialect: str) -> str:
    r = DIALECTS[dialect]
    return f"""
    SELECT
        pool,
        protocol,
        chain_id,
        AVG(price)                             AS avg_price,
        STDDEV(price)                          AS price_volatility,
        SUM(amount0_in + amount0_out)          AS total_volume_token0,
        COUNT(*)                               AS swap_count
    FROM defi_swaps
    WHERE block_timestamp >= {r.now} - {r.interval_1h}
    GROUP BY 1, 2, 3
    HAVING COUNT(*) > 5
    """


def all_dialects() -> list[str]:
    return list(DIALECTS)


def demo_transfer_volume_all_dialects() -> dict[str, str]:
    """CI smoke: the reference's demo_transfer_volume_all_dialects
    (etl_pipeline.py:368-373)."""
    return {d: transfer_volume_sql(d) for d in all_dialects()}
