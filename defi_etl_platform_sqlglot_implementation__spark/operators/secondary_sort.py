"""Secondary-sort pattern: per-key *ordered* imperative iteration without
any per-group in-memory sort.

The classic MapReduce "secondary sort" re-expressed for Spark:

1. ``repartition(key)`` — one shuffle puts every row of a key in one
   partition;
2. ``sortWithinPartitions(key, ts, tiebreak)`` — the shuffle's sort phase
   orders rows, so the Python side sees each key's rows contiguously and
   in event-time order;
3. ``mapInPandas`` — a streaming pass over Arrow batches carrying one row
   of state per key *across batch boundaries* (a key's run may span
   batches; only per-partition memory is one carry dict entry per key
   seen at a batch edge, not the group).

This is the scale-correct shape for "walk each user's history in order"
logic that built-in window functions can't express (imperative state
machines, sequence alignment, CDC folding): memory is O(batch), never
O(group), unlike ``applyInPandas`` which materializes whole groups.

The demo kernel computes per-row sequence features (previous-event gap,
running count, running max value) whose SQL-window twin is exact — the
registry entry ``secondary_sort_deltas`` is oracle-checked against a
DuckDB ``LAG``/``COUNT OVER``/``MAX OVER`` query, proving the pattern
reproduces window semantics byte-for-byte.

Reference parity: the reference's only ordered iteration is its pre-sorted
rolling p90 (etl_pipeline.py:226-233), done there by sorting the whole
frame in memory — this pattern is the 100 TB replacement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def ordered_user_features(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
    value_col: str = "value",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-key ordered scan emitting (key, tiebreak, ts, delta_s, seq,
    running_max) — delta_s is seconds since the key's previous event
    (null on the first), seq the 1-based per-key position, running_max
    the prefix max of ``value_col``."""
    cols = [key, ts_col, tiebreak, value_col]
    src = df.select(*cols)
    parts = num_partitions or src.sparkSession.conf.get("spark.sql.shuffle.partitions")
    arranged = src.repartition(int(parts), key).sortWithinPartitions(key, ts_col, tiebreak)

    schema = (
        f"{key} long, {tiebreak} long, {ts_col} timestamp, "
        "delta_s long, seq long, running_max double"
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # carry: key -> (last_ts_epoch_s, seq_so_far, max_so_far); only keys
        # straddling a batch edge survive here, so the dict stays tiny.
        carry: dict = {}
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            keys = pdf[key].to_numpy()
            # floor to whole seconds regardless of the Arrow batch's
            # datetime unit (ns vs us) — matches unix_timestamp/epoch-floor
            epoch = pdf[ts_col].to_numpy().astype("datetime64[s]").astype("int64")
            vals = pdf[value_col].to_numpy()
            delta = [None] * n
            seq = [0] * n
            rmax = [0.0] * n
            prev_key = None
            prev_epoch = 0
            prev_seq = 0
            prev_max = float("-inf")
            for i in range(n):
                k = keys[i]
                if k != prev_key:
                    if prev_key is not None:
                        carry[prev_key] = (prev_epoch, prev_seq, prev_max)
                    prev_epoch, prev_seq, prev_max = carry.pop(k, (None, 0, float("-inf")))
                    prev_key = k
                if prev_seq:
                    delta[i] = int(epoch[i] - prev_epoch)
                prev_seq += 1
                if vals[i] > prev_max:
                    prev_max = vals[i]
                seq[i] = prev_seq
                rmax[i] = prev_max
                prev_epoch = epoch[i]
            carry[prev_key] = (prev_epoch, prev_seq, prev_max)
            out = pd.DataFrame(
                {
                    key: pdf[key].to_numpy(),
                    tiebreak: pdf[tiebreak].to_numpy(),
                    ts_col: pdf[ts_col].to_numpy(),
                    "delta_s": pd.array(delta, dtype="Int64"),
                    "seq": seq,
                    "running_max": rmax,
                }
            )
            yield out

    return arranged.mapInPandas(scan, schema=schema)
