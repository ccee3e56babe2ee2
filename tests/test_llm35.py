"""Wave 36: blocklist screening, chunk-space dedup, ccnet × dup matrix."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm2  # noqa: F401 — fills QUERIES (doc_chunks)
from defi_etl_platform_sqlglot_implementation__spark import registry_llm27  # noqa: F401 — fills QUERIES (ccnet buckets)
from defi_etl_platform_sqlglot_implementation__spark import registry_llm35  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry_llm35 import (
    _BLOCKLIST,
    _CHUNK_SIZE,
    _CHUNK_STRIDE,
    _RATIO_BAR_BP,
)

SF = "/root/testdata/sf0.001"


class TestBlocklistScreening:
    def test_pure_pandas_replay(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        agg = defaultdict(lambda: [0, 0, 0, 0])   # docs, any, ratio, hits
        for r in docs.itertuples(index=False):
            toks = [w for w in r.text.split(" ") if w != ""]
            hits = sum(1 for w in toks if w in _BLOCKLIST)
            a = agg[r.source]
            a[0] += 1
            a[1] += 1 if hits > 0 else 0
            a[2] += 1 if toks and 1e4 * hits / len(toks) >= _RATIO_BAR_BP \
                else 0
            a[3] += hits
        got = {r.source: (r.n_docs, r.n_any_hit, r.n_ratio_hit,
                          r.total_hits, r.any_hit_bp, r.ratio_hit_bp)
               for r in QUERIES["blocklist_screening_report"](spark, SF)
               .collect()}
        for s, (nd, na, nr, th) in ((k, tuple(v)) for k, v in agg.items()):
            gnd, gna, gnr, gth, abp, rbp = got[s]
            assert (gnd, gna, gnr, gth) == (nd, na, nr, th)
            assert abp == round(1e4 * na / nd)
            assert rbp == round(1e4 * nr / nd)

    def test_rules_are_ordered_and_discriminate(self, spark):
        rows = QUERIES["blocklist_screening_report"](spark, SF).toPandas()
        # any-hit is the weaker (more aggressive) rule
        assert (rows.n_any_hit >= rows.n_ratio_hit).all()
        # the two rules must actually disagree somewhere on this corpus —
        # otherwise the side-by-side pricing is vacuous
        assert (rows.n_any_hit > rows.n_ratio_hit).any()


class TestChunkDedupReport:
    def test_chunk_population_matches_doc_chunks_gate(self, spark):
        rep = QUERIES["chunk_dedup_report"](spark, SF).toPandas()
        chunks = QUERIES["doc_chunks"](spark, SF)
        assert rep.n_chunks.sum() == chunks.count()
        assert (_CHUNK_SIZE, _CHUNK_STRIDE) == (64, 48)

    def test_pure_python_replay(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        occ = defaultdict(list)
        src = {}
        for r in docs.itertuples(index=False):
            src[int(r.doc_id)] = r.source
            toks = r.text.split(" ")
            nblocks = math.floor((len(toks) - 1) / _CHUNK_STRIDE) + 1
            for j in range(nblocks):
                txt = " ".join(
                    toks[j * _CHUNK_STRIDE:j * _CHUNK_STRIDE + _CHUNK_SIZE])
                h = hashlib.md5(txt.encode()).hexdigest()
                occ[h].append((int(r.doc_id), j))
        agg = defaultdict(lambda: [0, set(), 0])
        for h, occs in occ.items():
            ck = min(d * 100000 + j for d, j in occs)
            for d, j in occs:
                a = agg[src[d]]
                a[0] += 1
                a[1].add(h)
                if len(occs) > 1 and d * 100000 + j != ck:
                    a[2] += 1
        got = {r.source: (r.n_chunks, r.distinct_hashes,
                          r.redundant_chunks, r.redundant_bp)
               for r in QUERIES["chunk_dedup_report"](spark, SF).collect()}
        for s, (n, hs, red) in ((k, (v[0], len(v[1]), v[2]))
                                for k, v in agg.items()):
            assert got[s] == (n, hs, red, round(1e4 * red / n))
        # redundancy must exist on this corpus (verbatim copies abound)
        assert any(v[2] > 0 for v in got.values())


class TestCcnetBucketDupMatrix:
    def test_population_matches_bucket_gate(self, spark):
        mat = QUERIES["ccnet_bucket_dup_matrix"](spark, SF).toPandas()
        buckets = QUERIES["ccnet_perplexity_buckets"](spark, SF).toPandas()
        got = mat.set_index(["lang", "bucket"]).n_docs.to_dict()
        exp = buckets.set_index(["lang", "bucket"]).n_docs.to_dict()
        assert got == exp

    def test_dup_counts_bounded_and_informative(self, spark):
        mat = QUERIES["ccnet_bucket_dup_matrix"](spark, SF).toPandas()
        assert (mat.n_dup <= mat.n_docs).all()
        assert (mat.dup_bp <= 10000).all()
        assert mat.n_dup.sum() > 0
