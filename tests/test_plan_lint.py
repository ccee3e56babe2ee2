"""Registry-wide physical-plan lint: every driver-contract query must be
free of the two patterns that do not survive 100 TB:

- ``BatchEvalPython`` (row-at-a-time Python UDF) — all Python in this
  engine is Arrow-vectorized (`ArrowEvalPython` / `MapInPandas` /
  `FlatMapGroupsInPandas`), which are allowed.
- ``CartesianProduct`` — the unhinted all-pairs join. Broadcast
  nested-loop joins over 1-row scalar-subquery frames are allowed (they
  are literals in disguise); a true cartesian shuffle product is not.

This is a guard, not a benchmark: any future registry entry that
accidentally introduces a row-UDF or an unkeyed join fails here before it
ever reaches the driver.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

# built eagerly (iterative connected components runs jobs at build time);
# its component ops are linted via dedup_minhash_lsh + the CC unit tests
EAGER = {"dedup_clusters"}

_QUERIES = sorted(entry.queries())


@pytest.mark.parametrize("name", [q for q in _QUERIES if q not in EAGER])
def test_plan_is_scale_clean(spark, name):
    df = entry.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product join"
