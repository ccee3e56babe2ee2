"""Hypothesis property tests over the pure sequential kernels shared by
the batch and streaming surfaces: greedy debounce (operators/debounce +
streaming/debounce) and greedy MMR (operators/similarity.mmr_select).

No Spark here — the kernels are driver-side pure functions by design
(the test_properties.py convention); the Spark-side parity of the
operators that wrap them is pinned by test_llm28/29/30.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from defi_etl_platform_sqlglot_implementation__spark.operators.debounce import (
    greedy_kept_positions,
)
from defi_etl_platform_sqlglot_implementation__spark.operators.similarity import (
    greedy_mmr,
)

# ordered integer "timestamp" sequences (duplicates allowed — ties are a
# real ingest case) + a positive window
ts_seqs = st.lists(st.integers(min_value=0, max_value=10_000),
                   min_size=0, max_size=60).map(sorted)
windows = st.integers(min_value=1, max_value=2_000)


class TestGreedyDebounceProperties:
    @given(ts_seqs, windows)
    @settings(max_examples=200, deadline=None)
    def test_greedy_certificate(self, ts, delta):
        kept = greedy_kept_positions(ts, delta)
        if ts:
            assert kept and kept[0] == 0          # first event always kept
        kept_set = set(kept)
        last = None
        for i, t in enumerate(ts):
            if i in kept_set:
                # every kept event clears the last kept by >= delta
                assert last is None or t >= last + delta
                last = t
            else:
                # every suppressed event is inside the open window
                assert last is not None and t < last + delta

    @given(ts_seqs, windows, st.integers(min_value=0, max_value=60))
    @settings(max_examples=200, deadline=None)
    def test_split_invariance_is_the_streaming_contract(self, ts, delta,
                                                        cut):
        """greedy(all) == greedy(prefix) ++ greedy(suffix seeded with the
        prefix's last kept) for EVERY split point — the exact soundness
        argument of streaming/debounce.py's state fold."""
        cut = min(cut, len(ts))
        whole = greedy_kept_positions(ts, delta)
        head = greedy_kept_positions(ts[:cut], delta)
        seed = ts[head[-1]] if head else None
        tail = greedy_kept_positions(ts[cut:], delta, seed=seed)
        assert whole == head + [cut + i for i in tail]

    @given(ts_seqs, windows)
    @settings(max_examples=100, deadline=None)
    def test_kept_is_maximal_prefix_greedy(self, ts, delta):
        # greedy keeps the earliest admissible event each time, so no
        # suppressed event could be added while keeping all kept ones
        kept = greedy_kept_positions(ts, delta)
        kept_ts = [ts[i] for i in kept]
        for i, t in enumerate(ts):
            if i in set(kept):
                continue
            ok_before = [x for x in kept_ts if x <= t]
            assert ok_before and t < ok_before[-1] + delta


ids = st.integers(min_value=0, max_value=20)
micros = st.integers(min_value=-1_000_000, max_value=1_000_000)


@st.composite
def mmr_instances(draw):
    cids = sorted(draw(st.sets(ids, min_size=1, max_size=8)))
    rel = {c: draw(micros) for c in cids}
    sim = {(a, b): draw(micros) for a in cids for b in cids if a != b}
    k = draw(st.integers(min_value=1, max_value=8))
    return rel, sim, k


class TestGreedyMMRProperties:
    @given(mmr_instances())
    @settings(max_examples=150, deadline=None)
    def test_per_step_argmax_certificate(self, inst):
        rel, sim, k = inst
        out = greedy_mmr(rel, sim, k)
        assert len(out) == min(k, len(rel))
        assert [s for s, *_ in out] == list(range(1, len(out) + 1))
        selected: list = []
        for step, c, r, ms, score in out:
            assert r == rel[c]
            assert ms == max((sim[(c, s)] for s in selected), default=0)
            assert score == 7 * r - 3 * ms
            # the pick is the argmax by (score, -cid) over the remaining
            for other in rel:
                if other in selected or other == c:
                    continue
                oms = max((sim[(other, s)] for s in selected), default=0)
                oscore = 7 * rel[other] - 3 * oms
                assert (oscore, -other) < (score, -c)
            selected.append(c)
        assert len(set(selected)) == len(selected)

    @given(mmr_instances())
    @settings(max_examples=150, deadline=None)
    def test_lambda_one_degenerates_to_pure_topk(self, inst):
        rel, sim, k = inst
        out = greedy_mmr(rel, sim, k, lam_num=10, lam_den=10)
        want = sorted(rel, key=lambda c: (-rel[c], c))[:min(k, len(rel))]
        assert [c for _, c, *_ in out] == want


class TestDriverUnionFind:
    """The r9 CC fast path's min-label union-find, property-tested: on
    random graphs its labels equal an independent BFS closure's minima
    (the same certificate the distributed loop satisfies)."""

    @given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)),
                    min_size=0, max_size=120))
    @settings(max_examples=200, deadline=None)
    def test_labels_equal_bfs_component_minima(self, edges):
        from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
            _driver_union_find,
        )

        got = _driver_union_find(list(edges))
        # independent reference: BFS components over the same edges
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        seen = {}
        for start in adj:
            if start in seen:
                continue
            comp, stack = [], [start]
            while stack:
                n = stack.pop()
                if n in seen:
                    continue
                seen[n] = None
                comp.append(n)
                stack.extend(adj[n] - seen.keys())
            m = min(comp)
            for n in comp:
                seen[n] = m
        assert got == seen
