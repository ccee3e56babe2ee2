"""Driver gates for the rule-based SQL transpiler (plans/transpiler.py).

These two gates make the transpiler itself driver-hash-checked: the Spark
side executes the canonical Spark-dialect SQL TEXT (spark.sql over temp
views), and the registered oracle is ``transpile(text, "duckdb")`` — the
transpiler's own output, computed at import time. If any rewrite (quoting,
date_format pattern mapping, interval forms, integer division) emitted
wrong DuckDB SQL, the hashes would diverge. This upgrades the Q1
multi-dialect surface from text-snapshot evidence to executed evidence,
mirroring how the reference transpiles its canonical Postgres queries to
warehouse dialects (reference etl_pipeline.py:299-327) — except here both
ends of the translation actually run.

Float parity: aggregates stay on integral domains (COUNT, integer SUM of
floor-scaled values) so results are exact without %.6e machinery — the
gate exists to validate the TRANSPILER, not to re-test float policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .plans.transpiler import transpile
from .registry import register, t

# Canonical Spark-dialect texts. Constructs covered: date_trunc,
# date_format (Java pattern), backtick-quoted reserved identifier, CASE,
# CAST, integer ``div``, HAVING — the full documented subset minus the
# relative-NOW predicate (time-dependent results can't be hash-compared).
_HOURLY_SQL_SPARK = """
    SELECT date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss')
               AS hour_bucket,
           event_type AS `type`,
           COUNT(*) AS n_events,
           SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS value_milli,
           COUNT(DISTINCT user_id) AS unique_users
    FROM events
    WHERE event_type IN ('purchase', 'click', 'view')
    GROUP BY 1, 2
    HAVING COUNT(*) > 1
"""

_BUCKETS_SQL_SPARK = """
    SELECT user_id div 100 AS user_bucket,
           date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS `day`,
           CASE WHEN value >= 500 THEN 'high'
                WHEN value >= 100 THEN 'mid'
                ELSE 'low' END AS band,
           COUNT(*) AS n,
           SUM(CAST(FLOOR(value) AS BIGINT)) AS value_floor_sum
    FROM events
    GROUP BY 1, 2, 3
"""


def _run_spark_text(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(sql)


@register("transpiled_hourly_rollup", transpile(_HOURLY_SQL_SPARK, "duckdb"))
def transpiled_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executes the canonical hourly-rollup SQL TEXT on Spark; the oracle
    is the rule-transpiled DuckDB emission of the same text (quoted
    reserved alias, date_trunc + Java→strftime pattern mapping, integral
    aggregates). A transpiler bug = hash mismatch."""
    return _run_spark_text(spark, sf_dir, _HOURLY_SQL_SPARK)


@register("transpiled_user_buckets", transpile(_BUCKETS_SQL_SPARK, "duckdb"))
def transpiled_user_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executes the bucket/CASE/div canonical text on Spark against the
    transpiler's DuckDB emission (`div` → `//`, reserved `day` alias
    requoted, day-level trunc + short date pattern)."""
    return _run_spark_text(spark, sf_dir, _BUCKETS_SQL_SPARK)


_MONTHLY_SQL_SPARK = """
    SELECT year(o_orderdate) AS `year`,
           month(o_orderdate) AS `month`,
           o_orderkey div 1000 AS key_bucket,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS price_floor_sum
    FROM orders
    WHERE o_orderstatus <> 'X'
    GROUP BY 1, 2, 3
"""


@register("transpiled_monthly_orders", transpile(_MONTHLY_SQL_SPARK, "duckdb"))
def transpiled_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third transpiler gate, covering the EXTRACT-family construct: the
    Spark text uses year()/month() (which the transpiler maps through
    EXTRACT for the warehouse dialects and keeps as functions for
    DuckDB), reserved-word aliases, and integer div — executed on Spark
    with the transpiled DuckDB emission as the oracle."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_MONTHLY_SQL_SPARK)


_POSITION_SQL_SPARK = """
    SELECT instr(event_type, 'c') AS pos_c,
           event_type || '-' || CAST(user_id % 10 AS STRING) AS tag,
           FLOOR(value)::BIGINT AS value_int,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2, 3
"""


@register("transpiled_position_concat",
          transpile(_POSITION_SQL_SPARK, "duckdb"))
def transpiled_position_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth transpiler gate covering the round-3 subset widening: the
    string-position family (Spark ``instr`` → DuckDB ``strpos``), the
    ``||`` concatenation passthrough, and the ``expr::type`` cast
    shorthand normalized to universal CAST — executed on Spark with the
    transpiled DuckDB emission as the oracle, so an argument-order or
    type-mapping bug breaks the hash."""
    return _run_spark_text(spark, sf_dir, _POSITION_SQL_SPARK)


_RANK_OVER_SQL_SPARK = """
    SELECT event_type AS `type`,
           event_id,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY value DESC, event_id) AS value_rank,
           SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS run_cents
    FROM events
    WHERE event_type IN ('purchase', 'click')
"""


@register("transpiled_rank_over", transpile(_RANK_OVER_SQL_SPARK, "duckdb"))
def transpiled_rank_over(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fifth transpiler gate covering the round-4 subset widening: window
    OVER clauses.  The Spark text leans on Spark's IMPLICIT null ordering
    (ASC -> NULLS FIRST) and an explicit ROWS frame; the transpiled DuckDB
    oracle must carry explicit NULLS markers because DuckDB's implicit
    position (NULLS LAST both directions) differs — run_cents is an
    integral windowed sum with a unique (ts, event_id) ordering so the
    frame contents, and therefore the hash, are engine-exact."""
    return _run_spark_text(spark, sf_dir, _RANK_OVER_SQL_SPARK)


_LISTAGG_SQL_SPARK = """
    SELECT user_id % 10 AS user_mod,
           LISTAGG(event_type, '|') WITHIN GROUP (
               ORDER BY event_type, event_id) AS type_chain,
           COUNT(*) AS n
    FROM events
    WHERE event_id % 37 = 0
    GROUP BY 1
"""


@register("transpiled_listagg", transpile(_LISTAGG_SQL_SPARK, "duckdb"))
def transpiled_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sixth transpiler gate covering the round-4 session-2 widening: the
    ordered string-aggregation family.  The Spark text uses LISTAGG ...
    WITHIN GROUP; the transpiled DuckDB oracle must re-shape it to
    STRING_AGG(expr, sep ORDER BY ...) with the sort keys' implicit null
    positions made explicit (same normalization as window ORDER BY —
    the keys here are non-null, so both engines agree and the
    concatenated strings hash-match exactly).  MySQL emission re-shapes
    again to GROUP_CONCAT ... SEPARATOR; unordered/DISTINCT forms are
    loud edges, pinned in test_transpiler."""
    return _run_spark_text(spark, sf_dir, _LISTAGG_SQL_SPARK)
