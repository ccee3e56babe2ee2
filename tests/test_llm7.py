"""Property tests for the wave-7 QC/audit ops (registry_llm7): leakage
pairs subset+symmetry, OOV vocab coverage, cluster-distance flag
algebra, percentile-clip rank semantics.  Cross-engine value evidence
lives in the oracle gates; these pin invariants a hash can't express."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark import registry_llm6 as m6
from defi_etl_platform_sqlglot_implementation__spark import registry_llm7 as m

SF = "/root/testdata/sf0.001"


def test_split_leakage_subset_of_true_pairs(spark):
    from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    leaks = m.split_leakage_pairs(spark, SF).collect()
    assert leaks  # non-degenerate on the driver corpus
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    true_pairs = {(r.d1, r.d2) for r in
                  ngram_jaccard_pairs(docs, threshold=0.5,
                                      oracle=True).collect()}
    splits = {r.doc_id: r.split for r in
              docs.select("doc_id",
                          m6._split_col().alias("split")).collect()}
    for r in leaks:
        assert (r.d1, r.d2) in true_pairs
        assert r.split_1 == splits[r.d1] != splits[r.d2] == r.split_2
        assert 5_000 <= r.jaccard_bp <= 10_000
    # and completeness: every true pair with differing splits is reported
    expect = {(a, b) for a, b in true_pairs if splits[a] != splits[b]}
    assert {(r.d1, r.d2) for r in leaks} == expect


def test_oov_rate_vocab_is_topk(spark):
    rows = {r.doc_id: r for r in m.oov_rate(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert len(rows) == docs.count()
    freq = defaultdict(int)
    doc_toks = {}
    for r in docs.select("doc_id", "text").collect():
        toks = [t for t in r.text.split(" ") if t]
        doc_toks[r.doc_id] = toks
        for t_ in toks:
            freq[t_] += 1
    vocab = set(sorted(freq, key=lambda w: (-freq[w], w))[:m._VOCAB_K])
    for doc_id, toks in doc_toks.items():
        r = rows[doc_id]
        assert r.n_tokens == len(toks)
        assert r.n_oov == sum(1 for t_ in toks if t_ not in vocab)
        if toks:
            # half-up like both engines (Python round is half-even)
            assert r.oov_bp == (2 * 10_000 * r.n_oov + r.n_tokens) // (
                2 * r.n_tokens)
        else:
            assert r.oov_bp is None
    # top-16 of a 31-word vocab must leave real OOV mass
    assert 0 < sum(r.n_oov for r in rows.values())


def test_cluster_distance_flag_algebra(spark):
    rows = m.cluster_distance_outliers(spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert len(rows) == emb.count()
    by_cluster = defaultdict(list)
    for r in rows:
        assert r.dist_micro >= 0  # cosine <= 1
        by_cluster[r.cluster_id].append(r)
    assert len(by_cluster) > 1
    for members in by_cluster.values():
        n_c = len(members)
        s_c = sum(r.dist_micro for r in members)
        for r in members:
            assert r.is_far == int(r.dist_micro * n_c > 2 * s_c)
        # >2x-mean cannot flag a majority of its own cluster
        assert sum(r.is_far for r in members) * 2 < max(n_c, 2)


def test_doc_length_percentile_clip_ranks(spark):
    rows = m.doc_length_percentile_clip(spark, SF).collect()
    lens = sorted(r.n_tokens for r in rows)
    n = len(lens)
    p05 = lens[(n + 19) // 20 - 1]
    p95 = lens[(19 * n + 19) // 20 - 1]
    assert rows[0].p05 == p05 and rows[0].p95 == p95
    for r in rows:
        assert (r.p05, r.p95) == (p05, p95)
        expect = ("short" if r.n_tokens < p05
                  else "long" if r.n_tokens > p95 else "keep")
        assert r.verdict == expect
    kept = sum(r.verdict == "keep" for r in rows)
    # by construction at least 90% of rows sit inside [p05, p95]
    assert kept >= 0.9 * n
