"""pagerank: DataFrame-loop iterative scores vs a pure-Python reference."""

from __future__ import annotations


def _py_pagerank(edges, iterations=5, damping=0.85):
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    score = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        mass = {n: 0.0 for n in nodes}
        for s, d in edges:
            mass[d] += score[s] / outdeg[s]
        score = {n: (1 - damping) + damping * mass[n] for n in nodes}
    return score


class TestPageRank:
    def _run(self, spark, edges, **kw):
        from defi_etl_platform_sqlglot_implementation__spark.operators.graph import (
            pagerank,
        )

        df = spark.createDataFrame(edges, ["src", "dst"])
        return {r["node"]: r["score"] for r in pagerank(df, **kw).collect()}

    def test_cycle_is_uniform(self, spark):
        got = self._run(spark, [(1, 2), (2, 3), (3, 1)])
        assert all(abs(v - 1.0) < 1e-12 for v in got.values())

    def test_star_matches_reference(self, spark):
        edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
        got = self._run(spark, edges)
        exp = _py_pagerank(edges)
        assert set(got) == set(exp)
        assert all(abs(got[n] - exp[n]) < 1e-9 for n in exp)
        assert got[0] == max(got.values())  # the hub accumulates mass

    def test_parallel_edges_collapse(self, spark):
        got_dup = self._run(spark, [(1, 2), (1, 2), (2, 1)])
        got = self._run(spark, [(1, 2), (2, 1)])
        assert all(abs(got_dup[n] - got[n]) < 1e-12 for n in got)

    def test_checkpointing_preserves_result(self, spark):
        edges = [(i, (i * 3) % 7) for i in range(7) if i != (i * 3) % 7]
        a = self._run(spark, edges, iterations=6)
        b = self._run(spark, edges, iterations=6, checkpoint_every=2)
        assert all(abs(a[n] - b[n]) < 1e-12 for n in a)


def test_bfs_levels_matches_python_reference(spark):
    """bfs_levels vs a dict-based BFS on a random directed graph with
    cycles, unreachable nodes, and multiple shortest paths."""
    import random
    from collections import deque

    from defi_etl_platform_sqlglot_implementation__spark.operators.graph import (
        bfs_levels,
    )

    rng = random.Random(11)
    n_nodes = 40
    edges = {(rng.randrange(n_nodes), rng.randrange(n_nodes))
             for _ in range(90)}
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    want, q = {0: 0}, deque([0])
    while q:
        u = q.popleft()
        for v in adj.get(u, []):
            if v not in want:
                want[v] = want[u] + 1
                q.append(v)

    edf = spark.createDataFrame(sorted(edges), "src long, dst long")
    sdf = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist for r in bfs_levels(edf, sdf).collect()}
    assert got == want
