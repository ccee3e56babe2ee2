"""Driver-window accounting invariants for __spark_entry__._ordered:
the verification priority is derived data (CORRECTNESS_r01–r04 union),
and a stale name in either list silently wastes 50-slot window capacity
— these checks make that failure loud at test time instead."""

from __future__ import annotations

import __spark_entry__ as entry


def test_priority_and_green_names_resolve():
    from defi_etl_platform_sqlglot_implementation__spark import registry

    names = set(registry.QUERIES)
    missing_priority = [n for n in entry._PRIORITY if n not in names]
    missing_green = [n for n in entry._DRIVER_GREEN if n not in names]
    assert not missing_priority, missing_priority
    assert not missing_green, missing_green
    # a name in both buckets would be ordered twice / miscounted
    overlap = set(entry._PRIORITY) & entry._DRIVER_GREEN
    assert not overlap, overlap
    # no duplicate priority entries (dict-ordering would silently dedup)
    assert len(entry._PRIORITY) == len(set(entry._PRIORITY))


def test_unproven_queries_lead_the_window():
    q = entry.queries()
    ordered = list(q)
    n_unproven = len([n for n in ordered if n not in entry._DRIVER_GREEN])
    head, tail = ordered[:n_unproven], ordered[n_unproven:]
    # every unproven query sorts before every driver-green one
    assert all(n not in entry._DRIVER_GREEN for n in head)
    assert all(n in entry._DRIVER_GREEN for n in tail)
    # and the explicit priority bucket leads the unproven block
    assert head[:len(entry._PRIORITY)] == [
        n for n in entry._PRIORITY if n in q]


def test_oracles_follow_query_order():
    q, o = list(entry.queries()), list(entry.oracle_sql())
    assert o == [n for n in q if n in set(o)]
