"""Property tests for the advanced-relational wave 2 (registry_adv2):
SCD2 interval chaining, grouping-set lattice arithmetic, winsorize
bounds, MAD vs stddev sanity, EWMA recurrence limits, triangle symmetry.
Cross-engine value evidence lives in the oracle gates."""

from __future__ import annotations

from collections import defaultdict

from defi_etl_platform_sqlglot_implementation__spark import registry_adv2 as m

SF = "/root/testdata/sf0.001"


def test_scd2_intervals_chain(spark):
    rows = m.scd2_history(spark, SF).collect()
    assert rows
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.valid_from)
        # exactly one open (current) interval per user
        assert sum(1 for r in rs if r.valid_to is None) == 1
        assert rs[-1].valid_to is None
        # each closed interval's valid_to is the next interval's valid_from
        for prev, nxt in zip(rs, rs[1:]):
            assert prev.valid_to == nxt.valid_from, (user, prev, nxt)
        # adjacent runs can never share an event_type (they'd be one run)
        for prev, nxt in zip(rs, rs[1:]):
            assert prev.event_type != nxt.event_type, (user, prev, nxt)
        assert all(r.n_events >= 1 for r in rs)


def test_grouping_sets_lattice_consistent(spark):
    rows = m.grouping_sets_metrics(spark, SF).collect()
    lvl0 = [r for r in rows if r.grouping_lvl == 0]
    lvl1 = [r for r in rows if r.grouping_lvl == 1]
    lvl3 = [r for r in rows if r.grouping_lvl == 3]
    assert len(lvl3) == 1
    # detail rows roll up exactly to each flag subtotal and the grand total
    assert sum(r.n_rows for r in lvl0) == lvl3[0].n_rows
    by_flag = defaultdict(int)
    for r in lvl0:
        by_flag[r.returnflag] += r.n_rows
    for r in lvl1:
        assert by_flag[r.returnflag] == r.n_rows
    assert all(r.linestatus == "ALL" for r in lvl1)


def test_winsorized_mean_within_thresholds(spark):
    rows = m.winsorized_stats(spark, SF).collect()
    assert rows
    for r in rows:
        lo, hi, wm = float(r.p05), float(r.p95), float(r.winsorized_mean)
        assert lo <= wm <= hi
        assert lo < hi
        assert r.n_clamped >= 0


def test_mad_nonnegative_and_bounded(spark):
    rows = m.mad_robust(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.mad >= 0.0
        assert r.median is not None


def test_ewma_bounds(spark):
    rows = m.ewma_user_value(spark, SF).collect()
    assert rows
    # each term weight <= alpha and there are at most K terms, so the EWMA
    # can never exceed the max value in the window (ignoring quantization
    # noise of 1 micro-unit per term); weak but implementation-independent:
    # first row of each series is exactly round(value * alpha * 1e6)
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    first_val = {}
    for e in sorted(ev, key=lambda e: (e.user_id, e.ts, e.event_id)):
        first_val.setdefault(e.user_id, e.value)
    firsts = {r.user_id: r.ewma_micro for r in rows if r.rn == 1}
    for uid, v in first_val.items():
        assert firsts[uid] == round(v * 0.875 ** 0 * 0.125 * 1e6), uid


def test_triangle_counts_symmetric(spark):
    rows = m.triangle_count(spark, SF).collect()
    assert rows
    # each triangle contributes 3 node participations -> total divisible by 3
    assert sum(r.n_triangles for r in rows) % 3 == 0
    assert all(r.n_triangles > 0 for r in rows)
