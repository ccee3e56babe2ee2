"""Skew / scale helpers (SCALE.md): salting, partitioned windows.

These are the 100 TB counterparts of operators whose reference-parity form
is global: result-identical (proven against the same oracle), different
physical shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_group_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    agg_exprs: dict[str, Column],
    salt_col: Column,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: shuffle on (key, salt) first
    so one hot key spreads over `salt_buckets` reducers, then combine.

    ``agg_exprs`` maps output name -> phase-1 aggregate; phase 2 re-combines
    with the decomposable counterpart (sum for sum/count, max for max,
    min for min). Exact for decomposable aggregates (sums of integral
    doubles stay exact; float sums re-associate — same caveat as any
    distributed sum).
    """
    salted = df.withColumn("_salt", F.pmod(F.hash(salt_col), F.lit(salt_buckets)))
    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        *[expr.alias(f"_p1_{name}") for name, expr in agg_exprs.items()]
    )
    recombine = {
        "sum": F.sum, "count": F.sum, "max": F.max, "min": F.min,
    }

    def combiner(name: str) -> Column:
        kind = name.split("_", 1)[0] if name.split("_", 1)[0] in recombine else "sum"
        return recombine[kind](f"_p1_{name}").alias(name)

    return phase1.groupBy(*key_cols).agg(
        *[combiner(name) for name in agg_exprs]
    )


def partitioned_rolling_percentile(
    df: DataFrame,
    partition_col: Column,
    order_cols: Sequence[str],
    value_col: str,
    p: float,
    window_rows: int,
    out: str = "rolling_pct",
) -> DataFrame:
    """The partitioned variant of the global rolling percentile (W1):
    windows reset at partition boundaries — the documented semantic
    difference that buys parallelism at scale (SCALE.md §Windows)."""
    w = (
        Window.partitionBy(partition_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-(window_rows - 1), 0)
    )
    return df.withColumn(out, F.expr(f"percentile({value_col}, {p})").over(w))
