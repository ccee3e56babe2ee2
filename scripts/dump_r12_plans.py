#!/usr/bin/env python
"""Capture .explain("formatted") for bench queries into plans/r12/.

Usage: python scripts/dump_r12_plans.py [--suffix before|after] [-q name ...]

Defaults to sf0.1 (VERDICT r11 #3: the r11 dumps ran at sf0.001, where
single-partition inputs satisfy every required distribution trivially
and exactly the Exchanges the §2.4 claims were about never appear).
Query construction for the CC/kmeans/BPE gates executes driver-side
jobs, so dumping at sf0.1 costs real compute — pass -q to scope the run
to the queries under study.
"""

from __future__ import annotations

import argparse
import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("-q", "--queries", nargs="*", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("r12-plan-dump")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    import __spark_entry__ as entry

    queries = entry.queries()
    # `-q` with zero names is a scoping mistake, not a request for the
    # full (expensive at sf0.1) bench sweep — fail loudly instead
    if args.queries is not None and not args.queries:
        sys.exit("dump_r12_plans.py: -q given without query names; "
                 "omit -q entirely to dump the full bench set")
    names = args.queries if args.queries is not None else bench.BENCH_QUERIES
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r12"
    out_dir.mkdir(parents=True, exist_ok=True)

    for name in names:
        try:
            df = queries[name](spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — record the failure
            text = f"PLAN CAPTURE FAILED: {exc!r}\n"
        (out_dir / f"{name}_{args.suffix}.txt").write_text(text)
        print(f"wrote {name}_{args.suffix}.txt ({len(text)} bytes)")


if __name__ == "__main__":
    main()
