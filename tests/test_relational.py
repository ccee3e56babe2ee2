"""Relational-core queries (registry_tpch) + LSH ANN: semantics on small
frames and physical-plan shape (broadcast dims, LeftSemi/LeftAnti)."""

from __future__ import annotations

from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark.operators.similarity import (
    lsh_bucket_pairs,
    rademacher_planes,
)
from defi_etl_platform_sqlglot_implementation__spark import registry_tpch  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


class TestPlanShapes:
    def test_q5_broadcasts_dims(self, spark):
        # disable size-based auto-broadcast: at real scale only the explicit
        # broadcast() hints on the dimension sides survive, and the
        # orders ⋈ lineitem fact join must degrade to a shuffle join
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = QUERIES["local_supplier_volume"](spark, SF)._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan

    def test_anti_join_is_left_anti(self, spark):
        plan = QUERIES["customers_without_urgent_orders"](spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" in plan

    def test_semi_join_is_left_semi(self, spark):
        plan = QUERIES["brands_with_shipped_parts"](spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan

    def test_grouped_topk_no_global_sort(self, spark):
        plan = QUERIES["priority_top_orders"](spark, SF)._jdf.queryExecution().executedPlan().toString()
        # window sort is partition-local: no global Exchange rangepartitioning
        assert "rangepartitioning" not in plan.lower()


class TestSetOps:
    def test_cohorts_partition_the_union(self, spark):
        out = QUERIES["user_event_sets"](spark, SF)
        rows = out.collect()
        # each user appears in exactly one cohort
        assert len(rows) == len({r["user_id"] for r in rows})
        assert {r["cohort"] for r in rows} <= {"both", "click_only", "purchase_only"}


class TestLshPairs:
    def test_planes_deterministic(self):
        a = rademacher_planes(2, 3, 8)
        b = rademacher_planes(2, 3, 8)
        assert a == b
        assert all(x in (1.0, -1.0) for t in a for p in t for x in p)
        assert a != rademacher_planes(2, 3, 8, tag="other")

    def test_subset_of_bruteforce_with_recall(self, spark):
        e = spark.read.parquet(f"{SF}/embeddings.parquet")
        planes = rademacher_planes(4, 4, 64)
        lsh = {(r["d1"], r["d2"]) for r in
               lsh_bucket_pairs(e, planes, threshold=0.4).collect()}
        from defi_etl_platform_sqlglot_implementation__spark.operators.similarity import (
            dot, with_norm)
        a = with_norm(e.select(F.col("vec_id").alias("d1"),
                               F.col("embedding").alias("ea")), "ea", "na")
        b = with_norm(e.select(F.col("vec_id").alias("d2"),
                               F.col("embedding").alias("eb")), "eb", "nb")
        brute = {(r["d1"], r["d2"]) for r in
                 a.join(b, F.col("d1") < F.col("d2"))
                 .select("d1", "d2",
                         (dot("ea", "eb") / (F.col("na") * F.col("nb"))).alias("c"))
                 .filter(F.col("c") >= 0.4).collect()}
        assert lsh <= brute  # exact verify: no false positives
        assert len(lsh) >= 0.3 * len(brute)  # recall sanity (theory ~0.5)

    def test_more_tables_raise_recall(self, spark):
        e = spark.read.parquet(f"{SF}/embeddings.parquet")
        few = lsh_bucket_pairs(e, rademacher_planes(2, 4, 64), threshold=0.4).count()
        many = lsh_bucket_pairs(e, rademacher_planes(6, 4, 64), threshold=0.4).count()
        assert many >= few
