"""Wave 34: keep-newest policy + DSIR Gumbel resample draw."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm4  # noqa: F401 — fills QUERIES (keep_canonical)
from defi_etl_platform_sqlglot_implementation__spark import registry_llm11  # noqa: F401 — fills QUERIES (dsir weights)
from defi_etl_platform_sqlglot_implementation__spark import registry_llm34  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry_llm34 import (
    _DRAW_QUOTA_DEN,
    _U_DEN,
)

SF = "/root/testdata/sf0.001"


class TestDedupKeepNewest:
    def test_policies_share_clusters_and_disagree_only_where_flagged(
            self, spark):
        new = QUERIES["dedup_keep_newest"](spark, SF).toPandas()
        old = QUERIES["dedup_keep_canonical"](spark, SF).toPandas()
        # identical cluster partition
        assert (new.set_index("doc_id").cluster_id.to_dict()
                == old.set_index("doc_id").cluster_id.to_dict())
        # exactly one keeper per cluster under each policy
        assert (new.groupby("cluster_id").keep.sum() == 1).all()
        assert (old.groupby("cluster_id").keep.sum() == 1).all()
        # newest keeper IS the max doc_id of its cluster
        keepers = new[new.keep == 1].set_index("cluster_id").doc_id
        maxids = new.groupby("cluster_id").doc_id.max()
        assert keepers.sort_index().equals(maxids.sort_index())
        # policy_differs == (newest keeper != longest keeper), per cluster
        old_keep = old[old.keep == 1].set_index("cluster_id").doc_id
        for cid, g in new.groupby("cluster_id"):
            differs = int(keepers[cid] != old_keep[cid])
            assert set(g.policy_differs) == {differs}
        # the corpus must exercise BOTH regimes for the flag to mean much
        assert new.policy_differs.max() == 1
        assert (new.policy_differs == 0).any()


class TestDsirResampleDraw:
    def test_gumbel_noise_replay(self, spark):
        rows = QUERIES["dsir_resample_draw"](spark, SF).collect()
        for r in rows[:200]:
            h = hashlib.md5(f"draw:{r.doc_id}".encode()).hexdigest()[:12]
            u = int(h, 16)
            g = round(-math.log(-math.log((u + 1) / _U_DEN)) * 1e6)
            assert r.gumbel_micro == g
            assert r.key_micro == r.log_ratio_micro + r.gumbel_micro

    def test_scores_shared_with_dsir_weights(self, spark):
        draw = QUERIES["dsir_resample_draw"](spark, SF).toPandas()
        wts = QUERIES["dsir_importance_weights"](spark, SF).toPandas()
        assert (draw.set_index("doc_id").log_ratio_micro.to_dict()
                == wts.set_index("doc_id").log_ratio_micro.to_dict())

    def test_quota_is_exact_per_source(self, spark):
        draw = QUERIES["dsir_resample_draw"](spark, SF).toPandas()
        for s, g in draw.groupby("source"):
            n = len(g)
            quota = math.ceil(n / _DRAW_QUOTA_DEN)
            assert g.kept.sum() == quota
            # kept = exactly the top-quota sample_ranks
            assert set(g[g.kept == 1].sample_rank) == \
                set(range(1, quota + 1))

    def test_draw_is_importance_biased(self, spark):
        """Gumbel top-k draws ∝ exp(score): the kept set's mean score
        must exceed the dropped set's on this corpus."""
        draw = QUERIES["dsir_resample_draw"](spark, SF).toPandas()
        kept = draw[draw.kept == 1].log_ratio_micro.mean()
        dropped = draw[draw.kept == 0].log_ratio_micro.mean()
        assert kept > dropped
