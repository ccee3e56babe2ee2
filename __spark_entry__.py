"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship hourly transfer-volume-shaped query
(SURVEY.md §2 A2/Q5) over sf0.001. ``queries()`` / ``oracle_sql()`` expose
the SURVEY §2 operator inventory + scale extensions, each phrased over the
driver's tables with a DuckDB oracle twin (see
``defi_etl_platform_sqlglot_implementation__spark/registry.py`` for the
float-parity policy).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from defi_etl_platform_sqlglot_implementation__spark import registry
from defi_etl_platform_sqlglot_implementation__spark import registry_llm  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_tpch  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_ts  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_adv  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_sql2  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_llm2  # noqa: F401 — fills registry dicts


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["transfer_volume_hourly"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
