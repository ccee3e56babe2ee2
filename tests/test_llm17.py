"""Wave 17: LSH band sweep, Jaccard threshold sweep, IVF balance
report — the knob-pricing artifacts."""

from __future__ import annotations

import hashlib
import itertools

from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark import registry_llm17  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = text.split(" ")
    return {" ".join(toks[i:i + n]) for i in range(max(1, len(toks) - n + 1))}


class TestMinhashBandSweep:
    def test_pure_python_replay(self, spark):
        """Full replay of the sweep from the raw corpus: md5 K=8
        signatures, three band configs, bucket candidates, exact-Jaccard
        truth — every reported integer must match."""
        docs = {r.doc_id: r.text
                for r in spark.read.parquet(f"{SF}/documents.parquet")
                .select("doc_id", "text").collect()}
        sh = {d: _shingles(t) for d, t in docs.items()}
        sig = {
            d: [min(hashlib.md5(f"{i}|{s}".encode()).hexdigest()[:16]
                    for s in shs)
                for i in range(8)]
            for d, shs in sh.items()
        }
        truth = set()
        for d1, d2 in itertools.combinations(sorted(docs), 2):
            inter = len(sh[d1] & sh[d2])
            if inter / (len(sh[d1]) + len(sh[d2]) - inter) >= 0.5:
                truth.add((d1, d2))
        got = {(r.bands, r.rows_per_band): r
               for r in QUERIES["minhash_band_sweep"](spark, SF).collect()}
        assert set(got) == {(8, 1), (4, 2), (2, 4)}
        prev_cand: set | None = None
        for bands, rows in [(2, 4), (4, 2), (8, 1)]:
            buckets: dict[tuple, list] = {}
            for d, hs in sig.items():
                for band in range(bands):
                    key = (band, ",".join(hs[band * rows:(band + 1) * rows]))
                    buckets.setdefault(key, []).append(d)
            cand = set()
            for members in buckets.values():
                for a, b in itertools.combinations(sorted(members), 2):
                    cand.add((a, b))
            r = got[(bands, rows)]
            assert r.n_candidates == len(cand)
            assert r.n_true == len(truth)
            assert r.n_overlap == len(cand & truth)
            assert r.recall_bp == round(1e4 * len(cand & truth) / len(truth))
            # finer banding strictly nests inside coarser banding
            if prev_cand is not None:
                assert prev_cand <= cand
            prev_cand = cand

    def test_recall_monotone_in_bands(self, spark):
        pdf = QUERIES["minhash_band_sweep"](spark, SF).toPandas() \
            .sort_values("bands")
        assert pdf.n_candidates.is_monotonic_increasing
        assert pdf.recall_bp.is_monotonic_increasing
        assert (pdf.n_overlap <= pdf.n_candidates).all()
        assert (pdf.n_overlap <= pdf.n_true).all()


class TestJaccardThresholdSweep:
    def test_monotone_and_anchored(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
            ngram_jaccard_pairs,
        )

        pdf = QUERIES["jaccard_threshold_sweep"](spark, SF).toPandas() \
            .sort_values("threshold_bp").reset_index(drop=True)
        assert list(pdf.threshold_bp) == [5000, 6500, 8000]
        # tighter threshold never finds MORE
        assert pdf.n_pairs.is_monotonic_decreasing
        assert pdf.n_docs.is_monotonic_decreasing
        assert pdf.dup_rate_bp.is_monotonic_decreasing
        # the 0.50 row is exactly the pairwise-gate inventory
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        want = ngram_jaccard_pairs(docs, threshold=0.5, oracle=True).count()
        assert pdf.n_pairs.iloc[0] == want
        # docs bound: a pair affects exactly 2 docs, sharing allowed
        assert (pdf.n_docs <= 2 * pdf.n_pairs).all()


class TestIvfBalanceReport:
    def test_occupancy_consistency(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.operators.similarity import (
            assign_clusters,
        )

        pdf = QUERIES["ivf_balance_report"](spark, SF).toPandas()
        e = spark.read.parquet(f"{SF}/embeddings.parquet")
        n = e.count()
        assert pdf.n_vecs.sum() == n
        # matches the exact assignment the ANN gates query
        cents = e.orderBy("vec_id").limit(16)
        want = {r.cluster_id: r["count"]
                for r in assign_clusters(e, cents)
                .groupBy("cluster_id").count().collect()}
        got = dict(zip(pdf.cluster_id, pdf.n_vecs))
        assert got == want
        # shares renormalize to ~1e4, ranks are the size ordering
        assert abs(pdf.share_bp.sum() - 10000) <= len(pdf) // 2 + 1
        ranked = pdf.sort_values("size_rank")
        assert sorted(pdf.size_rank) == list(range(1, len(pdf) + 1))
        assert ranked.n_vecs.is_monotonic_decreasing
