"""Property tests for the wave-8 curation diagnostics (registry_llm8):
dup-matrix conservation, decile band structure, Spearman vs scipy-free
pure-Python ranks, fertility reconstruction.  Cross-engine value
evidence lives in the oracle gates; these pin invariants a hash can't
express."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark import registry_llm8 as m

SF = "/root/testdata/sf0.001"


def test_cross_source_matrix_conserves_pairs(spark):
    from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    rows = m.cross_source_dup_matrix(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_true = ngram_jaccard_pairs(docs, threshold=0.5, oracle=True).count()
    assert sum(r.n_pairs for r in rows) == n_true > 0
    for r in rows:
        assert r.source_a <= r.source_b  # normalized unordered pair


def test_perplexity_buckets_are_deciles(spark):
    rows = sorted(m.perplexity_bucket_mix(spark, SF).collect(),
                  key=lambda r: r.band)
    from defi_etl_platform_sqlglot_implementation__spark.registry_llm4 import (
        doc_bigram_logprob,
    )

    scored = doc_bigram_logprob(spark, SF).count()
    assert [r.band for r in rows] == list(range(1, 11))
    assert sum(r.n_docs for r in rows) == scored
    # discrete deciles on a quantized score: each band holds roughly a
    # tenth of the docs (ties can shift boundaries, not explode a band)
    for r in rows:
        assert r.n_docs <= 0.35 * scored
        assert r.total_bigrams > 0
    # bands are ordered worst->best mean logprob: band 1 (lowest mean
    # milli-nats) must have a lower per-bigram score than band 10
    lo = rows[0].total_logprob_micro / rows[0].total_bigrams
    hi = rows[-1].total_logprob_micro / rows[-1].total_bigrams
    assert lo < hi


def test_spearman_matches_pure_python(spark):
    row = m.spearman_len_distinct(spark, SF).collect()[0]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    xs, ys = [], []
    for r in docs.select("text").collect():
        toks = [t for t in r.text.split(" ") if t]
        xs.append(len(toks))
        ys.append(len(set(toks)))

    def avg_ranks(vals):
        by_v = defaultdict(int)
        for v in vals:
            by_v[v] += 1
        rank, start = {}, 1
        for v in sorted(by_v):
            c = by_v[v]
            rank[v] = start + (c - 1) / 2
            start += c
        return [rank[v] for v in vals]

    ra, rb = avg_ranks(xs), avg_ranks(ys)
    n = len(ra)
    sa, sb = sum(ra), sum(rb)
    sab = sum(a * b for a, b in zip(ra, rb))
    saa = sum(a * a for a in ra)
    sbb = sum(b * b for b in rb)
    rho = (n * sab - sa * sb) / (
        (n * saa - sa * sa) ** 0.5 * (n * sbb - sb * sb) ** 0.5)
    assert row.n == n
    assert abs(float(row.spearman_rho) - rho) < 1e-6
    assert 0 < rho < 1  # longer docs have more distinct tokens


def test_fertility_reconstruction(spark):
    rows = {r.lang: r for r in m.bpe_fertility_by_lang(spark, SF).collect()}
    from defi_etl_platform_sqlglot_implementation__spark.registry_llm5 import (
        bpe_encode_segments,
    )

    seg = bpe_encode_segments(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    per_lang = (seg.join(docs.select("doc_id", "lang"), "doc_id")
                .groupBy("lang")
                .agg(F.sum("n_words").alias("w"),
                     F.sum("n_subwords").alias("s")).collect())
    assert len(rows) == len(per_lang) > 1
    for r in per_lang:
        got = rows[r.lang]
        assert (got.n_words, got.n_subwords) == (r.w, r.s)
        assert got.fertility_bp >= 10_000  # >= 1 subword per word
