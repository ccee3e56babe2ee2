"""Wave 37: MinHash K sweep, chunk contamination, normalization impact,
DP Laplace release."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm6  # noqa: F401 — fills QUERIES (estimate error)
from defi_etl_platform_sqlglot_implementation__spark import registry_llm35  # noqa: F401 — fills QUERIES (chunk dedup)
from defi_etl_platform_sqlglot_implementation__spark import registry_llm36  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry_llm34 import (
    _U_DEN,
)
from defi_etl_platform_sqlglot_implementation__spark.registry_llm36 import (
    _CHUNK_SIZE,
    _CHUNK_STRIDE,
    _DP_SCALE,
    _K_SWEEP,
)

SF = "/root/testdata/sf0.001"


class TestMinhashKErrorSweep:
    def test_points_and_population(self, spark):
        rows = {r.k: r for r in
                QUERIES["minhash_k_error_sweep"](spark, SF).collect()}
        assert set(rows) == set(_K_SWEEP)
        # one row per K over the SAME true-pair inventory
        assert len({r.n_pairs for r in rows.values()}) == 1
        est = QUERIES["minhash_estimate_error"](spark, SF)
        assert rows[8].n_pairs == est.count()
        for r in rows.values():
            assert 0 <= r.mean_err_bp <= r.max_err_bp <= 10000

    def test_k8_point_agrees_with_estimate_error_gate(self, spark):
        """The K=8 sweep point must equal the mean/max of the
        single-K gate's per-pair err_bp — same md5 family, same pairs."""
        sweep = {r.k: r for r in
                 QUERIES["minhash_k_error_sweep"](spark, SF).collect()}
        per_pair = QUERIES["minhash_estimate_error"](spark, SF).toPandas()
        assert sweep[8].mean_err_bp == round(per_pair.err_bp.mean())
        assert sweep[8].max_err_bp == per_pair.err_bp.max()


class TestChunkLevelContamination:
    @staticmethod
    def _split_of(doc_id: int) -> str:
        # the llm6 md5 split spine, replicated byte-for-byte
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
        return "val" if h in "cd" else "test" if h in "ef" else "train"

    def test_pure_python_replay(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        train_h, rows = set(), []
        for r in docs.itertuples(index=False):
            toks = r.text.split(" ")
            nblocks = math.floor((len(toks) - 1) / _CHUNK_STRIDE) + 1
            split = self._split_of(int(r.doc_id))
            for j in range(nblocks):
                h = hashlib.md5(" ".join(
                    toks[j * _CHUNK_STRIDE:j * _CHUNK_STRIDE + _CHUNK_SIZE]
                ).encode()).hexdigest()
                rows.append((split, r.source, h))
                if split == "train":
                    train_h.add(h)
        exp = defaultdict(lambda: [0, 0])
        for split, source, h in rows:
            if split == "train":
                continue
            a = exp[(split, source)]
            a[0] += 1
            a[1] += 1 if h in train_h else 0
        got = {(r.split, r.source): (r.n_chunks, r.n_contaminated,
                                     r.contaminated_bp)
               for r in QUERIES["chunk_level_contamination"](spark, SF)
               .collect()}
        assert got == {k: (n, c, round(1e4 * c / n))
                       for k, (n, c) in exp.items()}
        # the corpus (verbatim copies cross splits) must exercise hits
        assert any(c > 0 for _, c, _ in got.values())


class TestNormalizationImpact:
    def test_pure_python_replay(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")

        def norm(x):
            x = re.sub("[0-9]", "0", x.lower())
            x = re.sub("[^a-z0 ]", " ", x)
            x = re.sub("  *", " ", x)
            return x.strip()

        exp = defaultdict(lambda: [0, 0, 0])
        for r in docs.itertuples(index=False):
            n = norm(r.text)
            a = exp[r.source]
            a[0] += 1
            a[1] += 1 if n != r.text else 0
            a[2] += len(r.text) - len(n)
        got = {r.source: (r.n_docs, r.n_changed, r.char_delta,
                          r.changed_bp)
               for r in QUERIES["normalization_impact_report"](spark, SF)
               .collect()}
        assert got == {s: (d, c, cd, round(1e4 * c / d))
                       for s, (d, c, cd) in exp.items()}


class TestDpLaplaceCounts:
    def test_mechanism_replay(self, spark):
        rows = QUERIES["dp_laplace_counts"](spark, SF).collect()
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        counts = docs.groupby("source").size().to_dict()
        assert {r.source: r.true_count for r in rows} == counts
        for r in rows:
            u = (int(hashlib.md5(f"dp:{r.source}".encode())
                     .hexdigest()[:12], 16) + 1) / _U_DEN
            noise = round(-_DP_SCALE * (1 if u >= 0.5 else -1)
                          * math.log(1.0 - 2.0 * abs(u - 0.5)) * 1e6)
            assert r.noise_micro == noise
            assert r.noisy_count_micro == r.true_count * 1_000_000 + noise
        # the noise must take both signs across sources (mechanism alive)
        assert any(r.noise_micro > 0 for r in rows)
        assert any(r.noise_micro < 0 for r in rows)
