"""Stream-stream inner join with event-time range condition — the
attribution-join shape (view → purchase within N minutes) the reference's
single-process design cannot express at all (its "streaming" is a polling
producer, kafka_producer.py:129-148; all consumption is batch).

Semantics
---------
``view_purchase_join`` pairs every *view* with every later *purchase* by
the same user that lands within ``max_delta_seconds``.  The expression is
identical for static frames (the batch/oracle path — the registry entry
``view_purchase_attribution`` is exact-checked against a DuckDB interval
join) and for two streams: pass watermarks and Spark runs it as a real
stateful stream-stream join.

Scale
-----
Both sides shuffle-partition on ``user_id`` (the equi-key), so each state
store holds only its key range.  The watermark + the two-sided time bound
(`purchase.ts ∈ (view.ts, view.ts + Δ]`) lets Spark evict a buffered view
once the watermark passes ``view.ts + Δ`` and a buffered purchase once it
passes ``purchase.ts`` — state is O(events in the Δ horizon), not O(stream).
Without the range bound the join would be unbounded-state and Spark would
reject append mode; this is the canonical bounded-interval design from the
Structured Streaming docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_purchase_join(
    views: DataFrame,
    purchases: DataFrame,
    max_delta_seconds: int,
    watermark: str | None = None,
) -> DataFrame:
    """Attribution join: (user_id, view_id, purchase_id, view_ts,
    purchase_ts, purchase_value, delta_s) for purchases strictly after a
    view and at most ``max_delta_seconds`` later.

    ``views`` / ``purchases`` need columns (event_id, user_id, ts[, value]).
    Pass ``watermark`` (e.g. ``"1 hour"``) on streaming inputs; on static
    frames leave it None — the join condition is the same plan either way.
    """
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if watermark is not None:
        v = v.withWatermark("view_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (v["v_user_id"] == p["user_id"])
        & (p["purchase_ts"] > v["view_ts"])
        & (p["purchase_ts"] <= v["view_ts"] + F.expr(f"interval {max_delta_seconds} seconds"))
    )
    return v.join(p, cond, "inner").select(
        "user_id",
        "view_id",
        "purchase_id",
        "view_ts",
        "purchase_ts",
        "purchase_value",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts")
        ).alias("delta_s"),
    )
