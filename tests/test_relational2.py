"""Second relational wave (registry_sql2): correlated-subquery
decorrelations, ranking windows, RANGE-interval frames, pivot/unpivot,
CUBE, vocab top-k — invariants + physical-plan shape.

Value parity with the natural correlated SQL is proven by the DuckDB
oracle gate (scripts/check_oracle.py); these tests pin the *plan* shapes
that make the decorrelated forms scale, and local semantic invariants."""

from __future__ import annotations

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_sql2  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    return QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


class TestPlanShapes:
    def test_q18_in_subquery_is_left_semi(self, spark):
        assert "LeftSemi" in _plan(spark, "big_quantity_orders")

    def test_q22_anti_join_and_scalar_broadcast(self, spark):
        plan = _plan(spark, "rich_idle_customers")
        assert "LeftAnti" in plan
        # the global-AVG scalar joins in via a broadcast (1-row side),
        # never a driver collect inside the plan
        assert "Broadcast" in plan

    def test_q17_brand_filter_precedes_aggregate(self, spark):
        # the per-part AVG aggregate input must already be brand-restricted:
        # its scan side joins broadcast part before any HashAggregate
        plan = _plan(spark, "avg_yearly_small_qty")
        assert "BroadcastHashJoin" in plan

    def test_pivot_single_aggregate_no_extra_job(self, spark):
        # explicit pivot values -> one Expand-free hash aggregate pass
        plan = _plan(spark, "event_type_pivot")
        assert plan.count("Exchange") <= 2  # partial/final agg only

    def test_windows_partition_local(self, spark):
        for name in ("order_price_quartiles", "rolling_hour_user_value"):
            assert "rangepartitioning" not in _plan(spark, name).lower()


class TestQuartiles:
    def test_invariants(self, spark):
        pdf = QUERIES["order_price_quartiles"](spark, SF).toPandas()
        assert pdf.quartile.between(1, 4).all()
        pct = pdf.pct_rank.astype(float)
        cume = pdf.cume.astype(float)
        assert ((pct >= 0) & (pct <= 1)).all()
        assert ((cume > 0) & (cume <= 1)).all()
        # row_number is a permutation within each priority
        for _, g in pdf.groupby("o_orderpriority"):
            assert sorted(g.rn) == list(range(1, len(g) + 1))


class TestRangeFrame:
    def test_matches_pandas_interval_window(self, spark):
        out = QUERIES["rolling_hour_user_value"](spark, SF).toPandas()
        ev = pd.read_parquet(f"{SF}/events.parquet")[["event_id", "ts", "user_id", "value"]]
        ev["ts"] = pd.to_datetime(ev["ts"])
        expect = {}
        for _, g in ev.groupby("user_id"):
            g = g.sort_values("ts")
            for _, row in g.iterrows():
                frame = g[(g.ts >= row.ts - pd.Timedelta(hours=1)) & (g.ts <= row.ts)]
                expect[row.event_id] = (frame.value.sum(), len(frame))
        for _, r in out.iterrows():
            s, n = expect[r.event_id]
            assert n == r.hour_cnt
            assert f"{s:.6e}" == r.hour_sum or abs(s - float(r.hour_sum)) < 1e-9 * max(1.0, abs(s))


class TestCube:
    def test_grand_total_row(self, spark):
        pdf = QUERIES["returnflag_cube"](spark, SF).toPandas()
        total = pdf[pdf.gid == 3]
        assert len(total) == 1
        n_all = int(total.n_items.iloc[0])
        # grand total == sum of the finest grouping set
        assert n_all == int(pdf[pdf.gid == 0].n_items.sum())
        # every subtotal axis also reconciles
        assert n_all == int(pdf[pdf.gid == 1].n_items.sum())  # per returnflag
        assert n_all == int(pdf[pdf.gid == 2].n_items.sum())  # per linestatus


class TestUnpivot:
    def test_three_metrics_per_flag(self, spark):
        pdf = QUERIES["returnflag_metrics_unpivot"](spark, SF).toPandas()
        counts = pdf.groupby("l_returnflag").metric.nunique()
        assert (counts == 3).all()
        assert set(pdf.metric) == {"sum_qty", "sum_price", "sum_disc"}


class TestVocab:
    def test_topk_sorted_and_deterministic(self, spark):
        a = QUERIES["token_vocab_topk"](spark, SF).toPandas()
        assert (a.cnt.values[:-1] >= a.cnt.values[1:]).all()
        b = QUERIES["token_vocab_topk"](spark, SF).toPandas()
        pd.testing.assert_frame_equal(a, b)


class TestLoneLateSuppliers:
    def test_manual_exists_semantics(self, spark):
        # recompute with a literal EXISTS/NOT-EXISTS formulation in Spark SQL
        # and compare to the set-based rewrite
        for name in ("lineitem", "orders", "supplier"):
            spark.read.parquet(f"{SF}/{name}.parquet").createOrReplaceTempView(name)
        expect = spark.sql(
            """
            SELECT s_name, COUNT(DISTINCT l.l_orderkey) AS numwait
            FROM supplier s
            JOIN lineitem l ON s.s_suppkey = l.l_suppkey
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderstatus = 'F'
              AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAYS
              AND EXISTS (
                    SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l.l_orderkey AND l2.l_suppkey <> l.l_suppkey)
              AND NOT EXISTS (
                    SELECT 1 FROM lineitem l3
                    WHERE l3.l_orderkey = l.l_orderkey AND l3.l_suppkey <> l.l_suppkey
                      AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAYS)
            GROUP BY s_name
            """
        ).toPandas().sort_values("s_name").reset_index(drop=True)
        got = (
            QUERIES["lone_late_suppliers"](spark, SF)
            .toPandas()
            .sort_values("s_name")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, expect)
