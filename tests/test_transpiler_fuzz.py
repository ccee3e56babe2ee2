"""Generative transpiler proof: Hypothesis builds random queries from the
canonical analytic subset grammar, runs the Spark text on Spark and the
transpiled text on DuckDB over the same events table, and requires
identical results. One counterexample = a transpiler construct bug, found
without hand-writing the corpus case.

Only engine-exact emissions are generated (counts, integral sums via
FLOOR, formatted timestamps, strings) so any mismatch is the transpiler's
fault, never float policy."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from defi_etl_platform_sqlglot_implementation__spark.plans.transpiler import transpile

SF = "/root/testdata/sf0.001"

# grammar pools — every element is exact cross-engine
_GROUP_EXPRS = [
    "event_type",
    "user_id div 100",
    "instr(event_type, 'c')",
    "FLOOR(value)::BIGINT",
    "event_type || '-tag'",
    "(user_id % 7)::STRING",
    "date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss')",
    "date_format(date_trunc('day', ts), 'yyyy-MM-dd')",
    "year(ts)",
    "month(ts)",
    "CASE WHEN value >= 500 THEN 'hi' ELSE 'lo' END",
]
_AGG_EXPRS = [
    "COUNT(*)",
    "COUNT(DISTINCT user_id)",
    "SUM(CAST(FLOOR(value) AS BIGINT))",
    "MIN(event_id)",
    "MAX(event_id)",
    # ordered string aggregation (r4 session-2 family): unique event_id
    # in the sort key makes the concatenation deterministic, so the
    # string is exact cross-engine
    "LISTAGG(event_type, '|') WITHIN GROUP (ORDER BY event_type, event_id)",
    "LISTAGG((user_id % 5)::STRING, ',') WITHIN GROUP "
    "(ORDER BY event_id DESC)",
    # aggregate FILTER clause (r5 family): executes natively on DuckDB,
    # and the integral-SUM emission must keep the widening cast OUTSIDE
    # the filtered call
    # (no DISTINCT + FILTER combination: Spark itself rejects it)
    "COUNT(*) FILTER (WHERE value >= 250.0)",
    "SUM(CAST(FLOOR(value) AS BIGINT)) FILTER (WHERE event_type <> 'view')",
]
_PREDICATES = [
    "event_type <> 'view'",
    "instr(event_type, 'i') > 0",
    "FLOOR(value)::BIGINT % 2 = 0",
    "value >= 100.0",
    "user_id div 10 >= 1",
    "event_type IN ('click', 'purchase')",
    "ts >= TIMESTAMP '2024-01-02 00:00:00'",
]


@st.composite
def subset_query(draw):
    groups = draw(st.lists(st.sampled_from(_GROUP_EXPRS), min_size=1,
                           max_size=2, unique=True))
    aggs = draw(st.lists(st.sampled_from(_AGG_EXPRS), min_size=1,
                         max_size=3, unique=True))
    preds = draw(st.lists(st.sampled_from(_PREDICATES), max_size=2,
                          unique=True))
    g_cols = ", ".join(f"{g} AS g{i}" for i, g in enumerate(groups))
    a_cols = ", ".join(f"{a} AS a{i}" for i, a in enumerate(aggs))
    where = f"WHERE {' AND '.join(preds)}" if preds else ""
    group_by = ", ".join(str(i + 1) for i in range(len(groups)))
    return (f"SELECT {g_cols}, {a_cols} FROM events {where} "
            f"GROUP BY {group_by}")


@pytest.fixture(scope="module")
def engines(spark):
    from defi_etl_platform_sqlglot_implementation__spark.registry import t

    t(spark, SF, "events").createOrReplaceTempView("events")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return spark, con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_numeric_dtype(df[c]):
            # engines disagree on integer width (int64 vs HUGEINT-backed
            # object/float); canonicalize small exact numerics as floats
            df[c] = df[c].astype("float64").map(repr)
        else:
            df[c] = df[c].map(lambda v: None if v is None else str(v))
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@settings(max_examples=30, deadline=None)
@given(sql=subset_query())
def test_random_subset_query_equivalence(engines, sql):
    spark, con = engines
    got = _normalize(spark.sql(sql).toPandas())
    want = _normalize(con.execute(transpile(sql, "duckdb")).df())
    assert list(got.columns) == list(want.columns), sql
    assert len(got) == len(want) > 0, sql
    pd.testing.assert_frame_equal(got, want, check_dtype=False, obj=sql)
