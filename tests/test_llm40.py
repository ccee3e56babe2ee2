"""Wave 41: Bloom FPR curve + principal-direction projection report."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np
import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm2  # noqa: F401 — fills QUERIES (contamination)
from defi_etl_platform_sqlglot_implementation__spark import registry_llm37  # noqa: F401 — fills QUERIES (power iteration)
from defi_etl_platform_sqlglot_implementation__spark import registry_llm40  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry_llm40 import (
    _BLOOM_BITS,
)

SF = "/root/testdata/sf0.001"


def _shingles(text):
    l = text.split(" ")
    n = max(1, len(l) - 3)
    return {" ".join(l[i:i + 4]) for i in range(n)}


class TestBloomFprCurve:
    def test_pure_python_replay(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        bench, corpus = set(), {}
        for r in docs.itertuples(index=False):
            sh = _shingles(r.text)
            if r.doc_id % 97 == 0:
                bench |= sh
            else:
                corpus[int(r.doc_id)] = sh
        truth = {d for d, sh in corpus.items() if sh & bench}

        def pos(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

        got = {r.num_bits: r for r in
               QUERIES["bloom_fpr_curve"](spark, SF).collect()}
        assert set(got) == set(_BLOOM_BITS)
        for nb in _BLOOM_BITS:
            bbits = {pos(s) % nb for s in bench}
            cand = {d for d, sh in corpus.items()
                    if any(pos(s) % nb in bbits for s in sh)}
            r = got[nb]
            assert r.n_corpus == len(corpus)
            assert r.n_candidates == len(cand)
            assert r.n_true == len(truth & cand)
            assert r.n_false_pos == len(cand - truth)
            assert r.fpr_bp == round(
                1e4 * len(cand - truth) / (len(corpus) - len(truth)))

    def test_no_false_negatives_and_monotone(self, spark):
        rows = {r.num_bits: r for r in
                QUERIES["bloom_fpr_curve"](spark, SF).collect()}
        cont = QUERIES["contamination_overlap"](spark, SF)
        n_true = cont.count()
        # no false negatives at ANY size: every truly contaminated doc
        # is a candidate
        assert all(r.n_true == n_true for r in rows.values())
        # fewer bits -> more collisions -> more candidates (weakly)
        sizes = sorted(_BLOOM_BITS)
        for small, big in zip(sizes, sizes[1:]):
            assert rows[small].n_candidates >= rows[big].n_candidates
            assert rows[small].fpr_bp >= rows[big].fpr_bp


class TestEmbeddingProjectionOutliers:
    def test_agrees_with_power_iteration_gate(self, spark):
        v3 = {r.dim: r.v3 for r in
              QUERIES["covariance_power_iteration"](spark, SF).collect()
              if r.population == "corpus"}
        df = pd.read_parquet(f"{SF}/embeddings.parquet")
        projs = {}
        labels = {}
        for r in df.itertuples(index=False):
            q = [int(x) for x in
                 np.round(np.array(r.embedding, dtype=np.float64) * 1000)]
            projs[int(r.vec_id)] = sum(q[d] * v3[d] for d in range(len(q)))
            labels[int(r.vec_id)] = int(r.label)
        top = sorted(projs.items(), key=lambda kv: (-abs(kv[1]), kv[0]))[:20]
        got = [(r.vec_id, r.label, r.proj_milli_v, r.abs_proj)
               for r in QUERIES["embedding_projection_outliers"](spark, SF)
               .collect()]
        assert got == [(v, labels[v], p, abs(p)) for v, p in top]
