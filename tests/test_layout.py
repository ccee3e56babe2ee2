"""Data-layout operators (operators/layout.py): Z-order locality measured
on real written files, size-targeted partitioned writes, and small-file
compaction. The z-value arithmetic itself is oracle-gated
(zorder_locality in registry_adv2)."""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark.operators.layout import (
    compact_small_files,
    write_partitioned,
    write_zordered,
    zorder_value,
)

SF = "/root/testdata/sf0.001"


def _events(spark):
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            "event_id",
            # high-cardinality dims: user_id has only ~15 distinct values
            # at sf0.001, which would make every layout look "clustered"
            (F.col("event_id") % 1024).alias("ua"),
            (F.abs(F.floor("value").cast("long")) % 1024).alias("vb"),
        )
    )


def _per_file_spans(path: str, col: str) -> list[int]:
    """min/max span of ``col`` per parquet file via footer statistics —
    the numbers a scan planner prunes with."""
    spans = []
    for f in Path(path).rglob("*.parquet"):
        md = pq.ParquetFile(str(f)).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    lo = c.statistics.min if lo is None else min(lo, c.statistics.min)
                    hi = c.statistics.max if hi is None else max(hi, c.statistics.max)
        if lo is not None:
            spans.append(hi - lo)
    return spans


class TestZOrderWrite:
    def test_zordered_files_bound_both_dimensions(self, spark, tmp_path):
        ev = _events(spark)
        zpath = str(tmp_path / "z")
        rpath = str(tmp_path / "r")
        write_zordered(ev, zpath, ["ua", "vb"], bits=10, n_files=8,
                       normalize=True)
        # baseline: same data, same file count, random (hash) layout
        ev.repartition(8).write.mode("overwrite").parquet(rpath)

        for col in ("ua", "vb"):
            z_spans = _per_file_spans(zpath, col)
            r_spans = _per_file_spans(rpath, col)
            assert z_spans and r_spans
            # z-ordered files cover a strictly narrower average range on
            # EVERY interleaved dimension -> min/max pruning works on both
            assert sum(z_spans) / len(z_spans) < 0.8 * (sum(r_spans) / len(r_spans)), col

        # no rows harmed
        assert spark.read.parquet(zpath).count() == ev.count()

    def test_zvalue_matches_reference_interleave(self, spark):
        rows = (
            _events(spark).limit(200)
            .withColumn("z", zorder_value(["ua", "vb"], bits=10))
            .collect()
        )
        for r in rows:
            expect = 0
            for i in range(10):
                expect |= ((r.ua >> i) & 1) << (2 * i)
                expect |= ((r.vb >> i) & 1) << (2 * i + 1)
            assert r.z == expect


class TestPartitionedWrite:
    def test_partition_dirs_and_row_preservation(self, spark, tmp_path):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        path = str(tmp_path / "p")
        files_per_part = write_partitioned(ev, path, ["event_type"],
                                           target_mb=64)
        assert files_per_part >= 1
        dirs = {p.name for p in Path(path).iterdir() if p.is_dir()}
        types = {r.event_type for r in ev.select("event_type").distinct().collect()}
        assert dirs == {f"event_type={t}" for t in types}
        back = spark.read.parquet(path)
        assert back.count() == ev.count()

    def test_small_target_splits_directories_into_multiple_files(
            self, spark, tmp_path):
        # with a deliberately tiny target the salt must spread each
        # partition value across several files — the exact behavior the
        # partition-cols-only repartition silently lacked (one file per
        # directory regardless of size)
        ev = spark.read.parquet(f"{SF}/events.parquet")
        path = str(tmp_path / "tiny")
        planned = write_partitioned(ev, path, ["event_type"],
                                    target_mb=0.002, sample_rows=1000)
        assert planned > 1
        per_dir = {}
        for f in Path(path).rglob("*.parquet"):
            per_dir.setdefault(f.parent.name, 0)
            per_dir[f.parent.name] += 1
        assert max(per_dir.values()) > 1, per_dir
        assert spark.read.parquet(path).count() == ev.count()

    def test_empty_frame_writes_schema(self, spark, tmp_path):
        ev = spark.read.parquet(f"{SF}/events.parquet").filter(F.lit(False))
        path = str(tmp_path / "e")
        assert write_partitioned(ev, path, ["event_type"]) == 1


class TestCompaction:
    def test_compacts_and_preserves(self, spark, tmp_path):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        path = str(tmp_path / "c")
        ev.repartition(37).write.parquet(path)   # deliberate file spray
        n_rows = ev.count()
        before, after = compact_small_files(spark, path, target_mb=128)
        assert before >= 37
        assert after < before
        files = list(Path(path).rglob("*.parquet"))
        assert len(files) == after
        assert spark.read.parquet(path).count() == n_rows


class TestPartitionPruning:
    def test_filtered_read_scans_one_directory(self, spark, tmp_path):
        """The point of partitionBy: an event_type predicate must prune to
        that value's directory — verified via the scan's actual input
        files, the mechanism that skips whole subtrees at 100 TB."""
        ev = spark.read.parquet(f"{SF}/events.parquet")
        path = str(tmp_path / "pp")
        write_partitioned(ev, path, ["event_type"], target_mb=64)
        scan = spark.read.parquet(path).filter(F.col("event_type") == "click")
        # the predicate must surface as a PARTITION filter in the scan node
        # (inputFiles() lists the unpruned relation, so the plan is the
        # authoritative evidence of directory pruning)
        plan = scan._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert "event_type" in plan.split("PartitionFilters")[1][:160]
        # and the pruned result equals reading that directory alone
        direct = spark.read.parquet(f"{path}/event_type=click")
        assert scan.count() == direct.count() > 0
