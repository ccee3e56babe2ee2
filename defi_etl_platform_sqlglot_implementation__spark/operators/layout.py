"""Data-layout operators: Z-order clustering, size-targeted partitioned
writes, and small-file compaction — the storage-side engineering that
makes a 100 TB table scannable.

The reference materializes silver tables with single pandas
``to_parquet`` calls (reference src/transform/etl_pipeline.py:222-247);
at warehouse scale layout IS performance: multi-dimensional clustering
(Z-order) lets min/max row-group statistics prune scans on more than one
predicate column, partitioned directories prune whole subtrees, and
compaction keeps file counts from exploding under streaming/incremental
writes (the classic small-files problem).

Scale shapes:
- ``zorder_value`` is pure column arithmetic (shift/mask/sum) — codegen,
  zero shuffle; the clustering write is ONE range repartition on the
  z-value followed by a per-partition sort, the same cost as any sorted
  write.
- ``write_partitioned`` sizes output files by bytes-per-row sampling so
  the target file size holds at any SF without hand-tuning
  ``spark.sql.shuffle.partitions``.
- ``compact_small_files`` plans the target partition count from the
  actual on-disk byte size (no full read before deciding).
"""

from __future__ import annotations

import math
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_value(cols: list[Column | str], bits: int = 10) -> Column:
    """Interleave the low ``bits`` bits of each column into one Z-value
    (Morton code). Columns must already be non-negative integers in
    [0, 2^bits); the caller maps raw values into that domain (modulo or
    range-bucketing). Pure integer arithmetic — deterministic on any
    engine, used both by the clustering write and the DuckDB oracle."""
    n = len(cols)
    ccols = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long")
             for c in cols]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(ccols):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + j)
    return z


def zorder_sql(exprs: list[str], bits: int = 10) -> str:
    """DuckDB twin of :func:`zorder_value` — identical bit interleave as a
    SQL expression string."""
    n = len(exprs)
    terms = []
    for i in range(bits):
        for j, e in enumerate(exprs):
            # full parens: DuckDB's '+' binds tighter than '<<'
            terms.append(f"(((({e}) >> {i}) & 1) << {i * n + j})")
    return "(" + " + ".join(terms) + ")"


def with_zvalue_normalized(
    df: DataFrame, cols: list[str], bits: int = 10, out: str = "_zval"
) -> DataFrame:
    """Equal-width normalize each dimension into [0, 2^bits) from its
    global min/max (one scalar agg, broadcast back — two scan passes, no
    shuffle of the data), then interleave. Without normalization a
    dimension whose values concentrate in a narrow range wastes its high
    bits (all zero), and the Z-curve degenerates to ordering by the other
    dimension — this is why Delta/Iceberg z-order on range-bucket IDs,
    not raw values."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).cast("double").alias(f"_mn_{c}"),
                 F.max(c).cast("double").alias(f"_mx_{c}")]
    mm = df.agg(*aggs)
    j = df.crossJoin(F.broadcast(mm))
    top = (1 << bits) - 1
    norm = []
    for c in cols:
        span = F.col(f"_mx_{c}") - F.col(f"_mn_{c}")
        scaled = F.when(span == 0, F.lit(0).cast("long")).otherwise(
            F.least(
                F.lit(top).cast("long"),
                ((F.col(c).cast("double") - F.col(f"_mn_{c}")) / span
                 * (1 << bits)).cast("long"),
            )
        )
        norm.append(scaled)
    z = j.withColumn(out, zorder_value(norm, bits))
    drop = [f"_mn_{c}" for c in cols] + [f"_mx_{c}" for c in cols]
    return z.drop(*drop)


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list[str],
    bits: int = 10,
    n_files: int | None = None,
    normalize: bool = False,
) -> None:
    """Write ``df`` clustered by the Z-order of ``zcols``: range-partition
    on the z-value so each output file owns a contiguous Z-range (tight
    min/max stats on EVERY interleaved dimension), sort within
    partitions, drop the helper column on write. With ``normalize`` the
    dimensions are equal-width range-bucketed first (see
    :func:`with_zvalue_normalized`); otherwise they must already lie in
    [0, 2^bits)."""
    if normalize:
        out = with_zvalue_normalized(df, zcols, bits, "_zval")
    else:
        out = df.withColumn("_zval", zorder_value(zcols, bits))
    parts = n_files or out.rdd.getNumPartitions()
    (
        out.repartitionByRange(parts, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    target_mb: float = 128,
    sample_rows: int = 10_000,
) -> int:
    """Partitioned parquet write with size-targeted files: measure
    bytes/row by actually parquet-encoding a bounded sample (same codec
    as the write — no compression-ratio guessing), size each partition
    value's file count from its OWN row count, and range-repartition on
    (partition value, salt) so distinct (value, salt) groups land in
    distinct tasks instead of hash-colliding into one.  Returns the
    maximum file count planned for any partition value.

    At 100 TB the failure modes this prevents are (a) one
    executor-count-sized file spray per directory (tiny files x thousands
    of partitions) and (b) a skewed value's directory written as one
    multi-GB file because the per-value count was derived from the global
    average."""
    n_rows = df.count()
    if n_rows == 0:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
        return 1
    # bytes/row from an ACTUAL parquet+snappy encoding of the sample —
    # the same bytes the real write produces, not a memory-repr guess
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    sample = df.limit(min(sample_rows, n_rows)).toPandas()
    buf = io.BytesIO()
    pq.write_table(pa.Table.from_pandas(sample, preserve_index=False), buf,
                   compression="snappy")
    approx_row_bytes = max(1, buf.getbuffer().nbytes // max(1, len(sample)))
    rows_per_file = max(1, int(target_mb * 1024 * 1024) // approx_row_bytes)
    # per-VALUE file counts (skew-aware: a hot value gets more files)
    per_value = (
        df.groupBy(*partition_cols)
        .agg(F.count("*").alias("_pv_rows"))
        .select(
            *partition_cols,
            F.greatest(
                F.lit(1),
                F.ceil(F.col("_pv_rows") / F.lit(rows_per_file)),
            ).cast("int").alias("_pv_files"),
        )
    )
    plan = per_value.agg(
        F.sum("_pv_files").alias("_total"), F.max("_pv_files").alias("_max")
    ).collect()[0]
    # salt each row modulo ITS value's file count, then range-partition on
    # (value, salt): ranges keep distinct (value, salt) groups in distinct
    # tasks (hash repartition can collide two groups into one task and
    # leave another empty, doubling file sizes)
    salt = F.pmod(F.xxhash64(*df.columns), F.col("_pv_files")).alias("_fsalt")
    (
        df.join(F.broadcast(per_value), partition_cols)
        .withColumn("_fsalt", salt)
        .repartitionByRange(int(plan["_total"]), *partition_cols, "_fsalt")
        .drop("_fsalt", "_pv_files")
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    return int(plan["_max"])


def compact_small_files(
    spark: SparkSession, path: str, target_mb: int = 128
) -> tuple[int, int]:
    """Rewrite a parquet directory into ~target_mb files: plan the output
    file count from the on-disk byte size (no data read to decide), then
    one coalesce-write. Returns (files_before, files_after).

    The compaction rewrite reads each input split once and writes
    sequentially — the standard maintenance job a streaming sink needs
    periodically; on a cluster it runs per-partition-directory so only
    small directories pay."""
    files = [p for p in Path(path).rglob("*.parquet")]
    total_bytes = sum(p.stat().st_size for p in files)
    n_before = len(files)
    n_after = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    import shutil

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    if Path(tmp).exists():
        shutil.rmtree(tmp)  # a stale tmp would make move() nest inside it
    df.coalesce(n_after).write.mode("overwrite").parquet(tmp)
    # swap: the compacted copy replaces the original directory (on object
    # storage this is the commit-protocol step; locally two renames).
    # Ordering matters for crash-safety: the original is renamed ASIDE
    # first, so at no point is `path` deleted with the replacement only
    # in a tmp sibling — a crash leaves either the original (recoverable
    # at `path__old`) or the committed compacted copy, never nothing.
    old = path.rstrip("/") + "__old"
    if Path(old).exists():
        shutil.rmtree(old)
    shutil.move(path, old)
    try:
        shutil.move(tmp, path)
    except BaseException:
        shutil.move(old, path)  # roll back
        raise
    shutil.rmtree(old)
    return n_before, n_after
