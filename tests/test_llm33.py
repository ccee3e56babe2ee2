"""Wave 33: LSH bucket skew, k-anonymity report, capped-eval MRR.
Cross-engine value evidence lives in the oracle gates; these pin
cross-gate agreement and operator invariants."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm5  # noqa: F401 — fills QUERIES (capped kNN)
from defi_etl_platform_sqlglot_implementation__spark import registry_llm17  # noqa: F401 — fills QUERIES (band sweep)
from defi_etl_platform_sqlglot_implementation__spark import registry_llm27  # noqa: F401 — fills QUERIES (length histogram)
from defi_etl_platform_sqlglot_implementation__spark import registry_llm33  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry_llm33 import (
    _K_ANON,
)

SF = "/root/testdata/sf0.001"


class TestLshBucketSkew:
    def test_per_band_invariants(self, spark):
        rows = QUERIES["lsh_bucket_skew"](spark, SF).toPandas()
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        # every (config, band) row sees every signed doc exactly once
        assert (rows.n_sigs == len(docs)).all()
        assert set(zip(rows.bands, rows.rows_per_band)) == \
            {(8, 1), (4, 2), (2, 4)}
        for r in rows.itertuples(index=False):
            assert 1 <= r.max_bucket <= r.n_sigs
            assert r.n_buckets <= r.n_sigs
            assert r.collision_pairs >= \
                r.max_bucket * (r.max_bucket - 1) // 2
            assert 0 <= r.top_bucket_pairs_bp <= 10000
        # band index domain per config
        for (b, _), g in rows.groupby(["bands", "rows_per_band"]):
            assert sorted(g.band) == list(range(b))

    def test_collision_pairs_bound_candidate_join(self, spark):
        """Σ C(sz,2) over a config's buckets is EXACTLY the candidate
        join's pre-distinct output; the band sweep's n_candidates is the
        post-distinct count — so per config Σ pairs >= n_candidates."""
        skew = QUERIES["lsh_bucket_skew"](spark, SF).toPandas()
        sweep = QUERIES["minhash_band_sweep"](spark, SF).toPandas()
        per_cfg = (skew.groupby(["bands", "rows_per_band"])
                   .collision_pairs.sum().to_dict())
        for r in sweep.itertuples(index=False):
            assert per_cfg[(r.bands, r.rows_per_band)] >= r.n_candidates


class TestKAnonymityReport:
    def test_pure_pandas_replay(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        exp = Counter()
        for r in docs.itertuples(index=False):
            n = len([w for w in r.text.split(" ") if w != ""])
            bucket = -1 if n == 0 else n.bit_length() - 1
            exp[(r.source, r.lang, bucket)] += 1
        got = {(r.source, r.lang, r.len_bucket): (r.k, r.at_risk)
               for r in QUERIES["kanonymity_report"](spark, SF).collect()}
        assert {k: v[0] for k, v in got.items()} == dict(exp)
        for k, (kk, risk) in got.items():
            assert risk == (kk < _K_ANON)

    def test_agrees_with_length_histogram(self, spark):
        """The QI length bucket is the doc_length_histogram device —
        summing k over lang must reproduce that gate's per-(source,
        bucket) doc counts."""
        ka = QUERIES["kanonymity_report"](spark, SF).toPandas()
        hist = QUERIES["doc_length_histogram"](spark, SF).toPandas()
        got = (ka.groupby(["source", "len_bucket"]).k.sum().to_dict())
        exp = {(r.source, r.bucket): r.n_docs
               for r in hist.itertuples(index=False)}
        assert got == exp


class TestRetrievalMrrCappedEval:
    def test_arithmetic_and_bounds(self, spark):
        rows = QUERIES["retrieval_mrr_capped_eval"](spark, SF).toPandas()
        for r in rows.itertuples(index=False):
            assert 0 <= r.n_hit <= r.n_queries
            assert r.mrr_micro == round(r.sum_rr_micro / r.n_queries)
            # each hit contributes round(1e6/rank) for rank in 1..10
            assert r.sum_rr_micro <= r.n_hit * 1_000_000
            if r.n_hit:
                assert r.sum_rr_micro >= r.n_hit * 100_000

    def test_population_matches_capped_knn_gate(self, spark):
        mrr = QUERIES["retrieval_mrr_capped_eval"](spark, SF).toPandas()
        knn = QUERIES["knn_label_accuracy_capped_eval"](spark, SF) \
            .toPandas()
        assert (mrr.set_index("label").n_queries.to_dict()
                == knn.set_index("label").n_eval.to_dict())

    def test_full_replay_from_shared_ranking(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.registry_llm5 import (
            _knn_capped_ranked,
        )

        ranked = _knn_capped_ranked(spark, SF).toPandas()
        per_label = {}
        for qid, g in ranked.groupby("qid"):
            qlabel = g.qlabel.iloc[0]
            same = g[(g.rk <= 10) & (g.nlabel == g.qlabel)]
            rr = round(1e6 / same.rk.min()) if len(same) else 0
            d = per_label.setdefault(qlabel, [0, 0, 0])
            d[0] += 1
            d[1] += 1 if rr else 0
            d[2] += rr
        got = {r.label: (r.n_queries, r.n_hit, r.sum_rr_micro)
               for r in QUERIES["retrieval_mrr_capped_eval"](spark, SF)
               .collect()}
        assert got == {k: tuple(v) for k, v in per_label.items()}
