"""Time-series join operators beyond plain equi-joins (scale extensions).

The reference has no as-of/range machinery (SURVEY.md §2.3 — its join-like
computations are all equi-keyed), but any 100 TB event pipeline needs them:
align each event with the latest known state (as-of), bucket events into
overlapping analysis windows (range join), and cut event streams into
sessions. Each is implemented in its shuffle-minimal form:

- **as-of join**: union-tag + partitioned window ``last_value`` — ONE
  shuffle on the join key, no per-row range probe, no sort-merge-with-
  inequality blowup. This is the standard distributed as-of shape (a
  merge of both sides' timelines per key).
- **range join**: the small interval side is exploded into its covering
  coarse buckets and broadcast; the fact side equi-joins on the bucket and
  then applies the precise containment predicate — turning an O(n·m)
  theta-join into a broadcast equi-join + filter.
- **sessionization**: lag + cumulative-sum over a per-key window; scales
  because every window is partitioned by the entity key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    ``key``: ``direction="backward"`` takes the latest right row with
    ``right_ts <= left_ts`` (inclusive, like DuckDB's ``ASOF JOIN ... ON
    l.ts >= r.ts``); ``direction="forward"`` takes the earliest right row
    with ``right_ts >= left_ts`` (DuckDB ``... ON l.ts <= r.ts``). NULLs
    when no qualifying row.

    Implementation: tag both sides, union their timelines, and carry the
    right side's values across with ``last_value(ignoreNulls)`` over a
    trailing frame (backward) or ``first_value(ignoreNulls)`` over a
    leading frame (forward), partitioned by the key and ordered by
    ``(ts, side)`` with the right side sorting toward the left row at
    coincident timestamps (inclusive semantics both ways). One shuffle on
    ``key``; each task sees one key group's merged timeline — no range
    join, no per-row probe.

    ``right`` must be unique per ``(key, right_ts)`` — pre-aggregate if
    not, or the carried value is the window-order-nearest of the ties.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = [c for c in left.columns]
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            l.schema["_lrow"].dataType
        ).alias("_lrow"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    merged = l.unionByName(r)
    if direction == "backward":
        # right (_side=0) sorts before coincident left rows -> inclusive
        w = (
            Window.partitionBy("_k")
            .orderBy("_ts", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = [
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_carried_{c}")
            for c in value_cols
        ]
    else:
        # forward: right sorts after coincident left rows (ascending on
        # -_side: left=1 first) and values are pulled from the leading frame
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").asc(), F.col("_side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = [
            F.first(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_carried_{c}")
            for c in value_cols
        ]
    carried = merged.select("_side", "_lrow", *carry).filter(F.col("_side") == 1)
    return carried.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
        *[F.col(f"_carried_{c}").alias(f"asof_{c}") for c in value_cols],
    )


def range_join_buckets(
    facts: DataFrame,
    intervals: DataFrame,
    fact_ts: str,
    start_col: str,
    end_col: str,
    bucket: Column,
    interval_buckets: Column,
) -> DataFrame:
    """Join each fact row to every interval containing it
    (``start <= ts < end``), via coarse-bucket blocking.

    ``bucket`` is the fact row's coarse bucket (e.g. ``date_trunc('hour',
    ts)``); ``interval_buckets`` is an array column enumerating every
    bucket an interval overlaps (e.g. ``sequence(start, end - 1h, 1h)``).
    The interval side is exploded (rows x covered-buckets) and broadcast —
    correct whenever the interval table is dimension-sized — so the plan
    is a broadcast equi-join on the bucket plus the exact containment
    filter, never a cartesian/theta join.
    """
    iv = intervals.select("*", F.explode(interval_buckets).alias("_bucket"))
    f = facts.withColumn("_bucket", bucket)
    joined = f.join(F.broadcast(iv), "_bucket").where(
        (F.col(fact_ts) >= F.col(start_col)) & (F.col(fact_ts) < F.col(end_col))
    )
    return joined.drop("_bucket")


def sessionize(
    events: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: str,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the key's previous event exceeds ``gap_seconds``.

    Windows are partitioned by ``key`` (scales horizontally); ordering is
    ``(ts, tiebreak)`` so coincident timestamps are deterministic. Adds
    ``session_seq`` (1-based per key) and ``session_id``.
    """
    w = Window.partitionBy(key).orderBy(ts_col, order_tiebreak)
    prev_ts = F.lag(ts_col).over(w)
    is_new = (
        prev_ts.isNull()
        | (F.unix_timestamp(ts_col) - F.unix_timestamp(prev_ts) > gap_seconds)
    ).cast("long")
    return events.withColumn("_new", is_new).withColumn(
        "session_seq", F.sum("_new").over(w)
    ).drop("_new").withColumn(
        "session_id", F.concat_ws("-", F.col(key).cast("string"), F.col("session_seq"))
    )


def session_stats(
    events: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: str,
    value_col: str,
) -> DataFrame:
    """Per-session aggregates over :func:`sessionize` output: bounds,
    event count, value sum, duration seconds."""
    s = sessionize(events, key, ts_col, gap_seconds, order_tiebreak)
    return s.groupBy(key, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(value_col).alias("session_value"),
        (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))).alias(
            "duration_s"
        ),
    )


def stratified_sample(
    df: DataFrame,
    stratum: str,
    n_per_stratum: int,
    id_col: str,
) -> DataFrame:
    """Deterministic stratified sample: the ``n_per_stratum`` rows with the
    smallest ``md5(id)`` per stratum.

    Hash-ordering makes the sample (a) reproducible across runs and
    engines, (b) uniform within each stratum, and (c) stable under corpus
    growth (a row's selection only changes if better-hashed rows arrive) —
    the property reservoir sampling gives a stream, phrased for batch.
    One shuffle on the stratum key.
    """
    h = F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8"))
    w = Window.partitionBy(stratum).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .withColumn("sample_rank", F.col("_rk").cast("long"))
        .drop("_rk")
    )
