"""Session-window aggregation — the streaming twin of the batch
gap-sessionization in :mod:`..operators.joins`.

Spark's ``session_window`` merges events whose inter-arrival gap is at
most the configured gap into one window; the batch ``sessionize`` starts
a new session when the gap *exceeds* it — identical session membership.
The two differ only in how they name a session (window start vs 1-based
per-key sequence) and in that ``session_window.end`` carries the trailing
gap padding (``last_event_ts + gap``), so ``session_end`` here reports
``MAX(ts)`` directly to agree with the batch operator.

Boundary semantics: at a gap of EXACTLY ``gap_seconds`` the built-in
merges windows only when ranges overlap (diff < gap) while the batch
operator keeps the pair together (diff <= gap, pandas-rolling style).
Sub-second event-time resolution makes exact ties measure-zero in
practice (test_sessions asserts row-for-row parity on the driver data),
but do not hash-compare the two across engines on second-aligned data.

Batch mode runs the exact same expression (``session_window`` works on
static frames), which is how the streaming semantics get an oracle: the
batch twin ``session_stats`` is exact-checked against DuckDB, and
``test_sessions`` asserts this operator matches it row-for-row.

Scale: state is partitioned by the grouping key; the watermark bounds how
long an open session lives in the state store (a session closes when the
watermark passes its end), so state size is O(active keys), not O(events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_window_stats(
    events: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    value_col: str,
    watermark: str | None = None,
) -> DataFrame:
    """Per-session aggregates via ``session_window``: works unchanged on a
    static frame (batch oracle path) or a stream (pass ``watermark``,
    e.g. ``"30 minutes"``, to bound state; required for append output)."""
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    agg = df.groupBy(
        F.session_window(F.col(ts_col), f"{gap_seconds} seconds"), F.col(key)
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(value_col).alias("session_value"),
        F.max(ts_col).alias("_max_ts"),
    )
    return agg.select(
        key,
        F.col("session_window.start").alias("session_start"),
        F.col("_max_ts").alias("session_end"),
        "n_events",
        "session_value",
        (F.unix_timestamp("_max_ts") - F.unix_timestamp("session_window.start"))
        .alias("duration_s"),
    )
