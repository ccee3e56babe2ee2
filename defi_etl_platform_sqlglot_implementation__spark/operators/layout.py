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
    """Partitioned parquet write with size-targeted files: estimate
    bytes/row from a bounded sample written through the same codec, then
    repartition so each partition-directory's files land near
    ``target_mb``. Returns the file count planned per partition value.

    At 100 TB the failure mode this prevents is one executor-count-sized
    file spray per directory (tiny files x thousands of partitions)."""
    n_rows = df.count()
    if n_rows == 0:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
        return 1
    # bytes/row estimate from an Arrow-encoded bounded sample (parquet
    # compresses, but the ordering of magnitudes survives; exactness is
    # not required to pick a file count)
    sample = df.limit(min(sample_rows, n_rows)).toPandas()
    approx_row_bytes = max(
        1, int(sample.memory_usage(deep=True).sum() // max(1, len(sample)) // 3)
    )  # /3: parquet+snappy typically compresses memory repr ~3x on this data
    n_part_values = df.select(*partition_cols).distinct().count()
    rows_per_file = max(1, int(target_mb * 1024 * 1024) // approx_row_bytes)
    files_per_part = max(1, math.ceil(n_rows / max(1, n_part_values)
                                      / rows_per_file))
    # repartitioning on the partition columns ALONE would put every row of
    # a partition value into one task -> exactly one file per directory no
    # matter the target; a deterministic salt spreads each value across
    # files_per_part tasks so the size target can actually bite
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(files_per_part)).alias("_fsalt")
    (
        df.withColumn("_fsalt", salt)
        .repartition(files_per_part * max(1, n_part_values),
                     *partition_cols, "_fsalt")
        .drop("_fsalt")
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    return files_per_part


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
    df.coalesce(n_after).write.mode("overwrite").parquet(tmp)
    # swap: the compacted copy replaces the original directory (on object
    # storage this is the commit-protocol step; locally a rename)
    shutil.rmtree(path)
    shutil.move(tmp, path)
    return n_before, n_after
