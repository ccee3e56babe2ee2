"""Physical-plan introspection: machine-checkable evidence that plans have
the shape the scale design requires (SCALE.md).

The reference has no optimizer and therefore nothing to introspect
(SURVEY.md §4); here the optimizer is Catalyst, and these helpers extract
the properties we assert in tests: predicate pushdown into parquet scans,
column pruning, join strategies, codegen coverage.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


@dataclass
class PlanReport:
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    broadcast_joins: int = 0
    broadcast_nl_joins: int = 0
    sortmerge_joins: int = 0
    hash_aggregates: int = 0
    sort_aggregates: int = 0
    codegen_stages: int = 0
    exchanges: int = 0

    @property
    def shuffles(self) -> int:
        return self.exchanges


def _count_nodes(text: str, name: str) -> int:
    # count numbered operator headers "(N) <Name>" so tree + detail
    # sections are not double-counted
    ids = set(re.findall(rf"\((\d+)\) {name}\b", text))
    return len(ids) if ids else len(re.findall(rf"\b{name}\b", text))


def plan_report(df: DataFrame) -> PlanReport:
    text = formatted_plan(df)
    simple = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )
    rep = PlanReport()
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", text):
        if m.group(1).strip():
            rep.pushed_filters.append(m.group(1))
    rep.read_schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", text)
    rep.broadcast_joins = _count_nodes(text, "BroadcastHashJoin")
    rep.broadcast_nl_joins = _count_nodes(text, "BroadcastNestedLoopJoin")
    rep.sortmerge_joins = _count_nodes(text, "SortMergeJoin")
    rep.hash_aggregates = _count_nodes(text, "HashAggregate")
    rep.sort_aggregates = _count_nodes(text, "SortAggregate")
    # codegen span ids appear as "*(N)" in simple mode
    rep.codegen_stages = len(set(re.findall(r"\*\((\d+)\)", simple)))
    rep.exchanges = _count_nodes(text, "Exchange")
    return rep
