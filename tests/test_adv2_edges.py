"""Tiny-input edge cases for the round-3 relational operators: single-row
groups, single-event users, and degenerate windows — the shapes that
break rank arithmetic (n=1 order statistics), island collapse, and
first-row EWMA seeding. Fixtures are minimal parquet tables written with
the driver schemas."""

from __future__ import annotations

import datetime as dt

import pytest

from defi_etl_platform_sqlglot_implementation__spark import registry_adv2 as m


@pytest.fixture()
def tiny_dir(spark, tmp_path):
    """events: user 1 has one event; user 2 has a type run A,A,B.
    lineitem: flag 'X' has ONE row (degenerate order stats);
    flag 'Y' has three rows."""
    ts = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(minute):
        return ts + dt.timedelta(minutes=minute)

    events = spark.createDataFrame(
        [
            (1, at(0), 100, "click", 10.0, "{}"),
            (2, at(1), 200, "view", 5.0, "{}"),
            (3, at(2), 200, "view", 7.0, "{}"),
            (4, at(3), 200, "purchase", 9.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    events.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    lineitem = spark.createDataFrame(
        [
            (1, 1, 1, 1, 5.0, 100.00, 0.04, 0.02, "X", "O", ts),
            (2, 1, 1, 1, 6.0, 200.00, 0.05, 0.03, "Y", "O", ts),
            (2, 2, 2, 2, 7.0, 300.00, 0.06, 0.04, "Y", "F", ts),
            (3, 2, 2, 1, 8.0, 400.00, 0.07, 0.05, "Y", "F", ts),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    lineitem.coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_scd2_single_event_user_is_one_open_interval(spark, tiny_dir):
    rows = {(r.user_id, r.event_type): r
            for r in m.scd2_history(spark, tiny_dir).collect()}
    one = rows[(100, "click")]
    assert one.valid_to is None and one.n_events == 1
    # user 200: view run (2 events) closed by the purchase run
    view = rows[(200, "view")]
    purchase = rows[(200, "purchase")]
    assert view.n_events == 2
    assert view.valid_to == purchase.valid_from
    assert purchase.valid_to is None


def test_winsorize_single_row_group_degenerates_cleanly(spark, tiny_dir):
    rows = {r.returnflag: r for r in m.winsorized_stats(spark, tiny_dir).collect()}
    x = rows["X"]
    # n=1: rank-1 row is both the 5th and 95th percentile pick; mean = value
    assert x.p05 == x.p95 == x.winsorized_mean
    assert x.n_clamped == 0
    y = rows["Y"]
    assert y.n_clamped >= 0 and float(y.p05) <= float(y.p95)


def test_mad_single_value_group_is_zero(spark, tiny_dir):
    rows = {r.event_type: r for r in m.mad_robust(spark, tiny_dir).collect()}
    assert rows["click"].mad == 0.0       # one value: |x - median| = 0
    assert rows["purchase"].mad == 0.0
    assert rows["view"].median in (5.0, 7.0)


def test_ewma_first_row_is_alpha_scaled(spark, tiny_dir):
    rows = {(r.user_id, r.rn): r.ewma_micro
            for r in m.ewma_user_value(spark, tiny_dir).collect()}
    assert rows[(100, 1)] == round(10.0 * 0.125 * 1e6)
    # user 200 row 2: 5*0.875*0.125 + 7*0.125 per-term micro rounding
    expect = round(5.0 * 0.875 * 0.125 * 1e6) + round(7.0 * 1.0 * 0.125 * 1e6)
    assert rows[(200, 2)] == expect


def test_grouping_sets_tiny_reconciles(spark, tiny_dir):
    rows = m.grouping_sets_metrics(spark, tiny_dir).collect()
    total = [r for r in rows if r.grouping_lvl == 3][0]
    assert total.n_rows == 4
    assert total.sum_qty == 26.0
    x_sub = [r for r in rows if r.grouping_lvl == 1 and r.returnflag == "X"][0]
    assert x_sub.n_rows == 1


class TestExactStats:
    def test_pearson_matches_numpy(self, spark):
        import numpy as np
        import pandas as pd

        from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

        sf = "/root/testdata/sf0.001"
        out = QUERIES["value_time_correlation"](spark, sf).toPandas()
        ev = pd.read_parquet(f"{sf}/events.parquet")
        ev["x"] = (ev.value * 100).round().astype("int64")
        # normalize to ns first: the parquet column is datetime64[us], so a
        # bare astype(int64) yields MICROseconds
        ev["y"] = ev.ts.astype("datetime64[ns]").astype("int64") // 10**9
        ev["y"] -= ev["y"].min()
        for _, r in out.iterrows():
            g = ev[ev.event_type == r.event_type]
            expect = np.corrcoef(g.x, g.y)[0, 1]
            assert abs(float(r.pearson_r) - expect) < 1e-6
            assert -1.0 <= float(r.pearson_r) <= 1.0

    def test_chi2_matches_scipy_formula(self, spark):
        import pandas as pd

        from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

        sf = "/root/testdata/sf0.001"
        row = QUERIES["lang_source_chi2"](spark, sf).collect()[0]
        docs = pd.read_parquet(f"{sf}/documents.parquet")
        tab = docs.groupby(["lang", "source"]).size()
        rt = tab.groupby("lang").sum()
        ct = tab.groupby("source").sum()
        n = tab.sum()
        chi2 = 0.0
        for (lang, src), o in tab.items():
            e = rt[lang] * ct[src] / n
            chi2 += round(1e6 * (o - e) ** 2 / e)
        assert row.chi2_micro == int(chi2)
        assert row.dof == (len(rt) - 1) * (len(ct) - 1)

    def test_ols_matches_numpy_polyfit(self, spark):
        import numpy as np
        import pandas as pd

        from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

        sf = "/root/testdata/sf0.001"
        out = QUERIES["ols_value_trend"](spark, sf).toPandas()
        ev = pd.read_parquet(f"{sf}/events.parquet")
        ev["x"] = (ev.value * 100).round().astype("int64")
        ev["y"] = ev.ts.astype("datetime64[ns]").astype("int64") // 10**9
        ev["y"] -= ev["y"].min()
        for _, r in out.iterrows():
            g = ev[ev.event_type == r.event_type]
            slope, intercept = np.polyfit(g.y, g.x, 1)
            assert abs(float(r.slope_centi_per_s) - slope) < 1e-6 * max(1, abs(slope))
            assert abs(float(r.intercept_centi) - intercept) < 1e-4 * max(1, abs(intercept))
            rr = np.corrcoef(g.x, g.y)[0, 1] ** 2
            assert abs(float(r.r_squared) - rr) < 1e-6


class TestSnapshotDiff:
    def test_classification_reconciles(self, spark):
        import pandas as pd

        from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

        sf = "/root/testdata/sf0.001"
        out = {r.change_type: r.n
               for r in QUERIES["orders_snapshot_diff"](spark, sf).collect()}
        o = pd.read_parquet(f"{sf}/orders.parquet")
        k = o.o_orderkey
        v1 = set(k[k % 10 != 0])
        v2 = set(k[k % 11 != 0])
        added = v2 - v1
        removed = v1 - v2
        both = v1 & v2
        changed = {x for x in both if x % 7 == 0}
        assert out.get("added", 0) == len(added)
        assert out.get("removed", 0) == len(removed)
        assert out.get("changed", 0) == len(changed)
        assert out.get("unchanged", 0) == len(both) - len(changed)
        assert sum(out.values()) == len(v1 | v2)
