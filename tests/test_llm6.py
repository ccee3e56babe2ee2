"""Property tests for the wave-6 training-data ops (registry_llm6):
sequence packing reconstruction, token budget consistency, novelty
conservation, minhash estimator bounds, confusion-matrix totals, norm
outlier algebra, split determinism.  Cross-engine value evidence lives
in the oracle gates; these pin operator invariants a hash can't
express."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark import registry_llm6 as m

SF = "/root/testdata/sf0.001"


def _doc_tokens(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return {
        r.doc_id: (r.source, len([t for t in r.text.split(" ") if t]))
        for r in docs.select("doc_id", "source", "text").collect()
    }


def test_sequence_packing_reconstructs(spark):
    rows = {r.doc_id: r for r in m.sequence_packing(spark, SF).collect()}
    toks = _doc_tokens(spark)
    assert set(rows) == set(toks)
    by_source = defaultdict(list)
    for doc_id, (source, n) in toks.items():
        by_source[source].append((doc_id, n))
    for source, docs in by_source.items():
        cum = 0
        for doc_id, n in sorted(docs):
            r = rows[doc_id]
            assert (r.source, r.n_tokens, r.tok_start) == (source, n, cum)
            assert r.first_seq == cum // m._SEQ_LEN
            assert r.last_seq == (cum if n == 0 else cum + n - 1) // m._SEQ_LEN
            assert r.first_seq <= r.last_seq
            cum += n


def test_tokens_per_source_budget_greedy_prefix(spark):
    rows = {r.source: r for r in
            m.tokens_per_source_budget(spark, SF).collect()}
    toks = _doc_tokens(spark)
    by_source = defaultdict(list)
    for doc_id, (source, n) in toks.items():
        by_source[source].append((doc_id, n))
    assert set(rows) == set(by_source)
    for source, docs in by_source.items():
        r = rows[source]
        cum, kept_docs, kept_tokens = 0, 0, 0
        for _, n in sorted(docs):
            cum += n
            if cum <= m._SRC_BUDGET:
                kept_docs += 1
                kept_tokens += n
        assert (r.n_docs, r.kept_docs, r.kept_tokens) == (
            len(docs), kept_docs, kept_tokens)
        assert r.total_tokens == sum(n for _, n in docs)
        assert r.kept_tokens <= m._SRC_BUDGET


def test_ngram_novelty_conserves_distinct_shingles(spark):
    from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
        shingle_table,
    )

    rows = m.ngram_novelty(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sh = shingle_table(docs)
    n_corpus_shingles = sh.select("s").distinct().count()
    # each distinct corpus shingle is novel in exactly one doc (its min)
    assert sum(r.n_novel for r in rows) == n_corpus_shingles
    assert sum(r.n_shingles for r in rows) == sh.count()
    for r in rows:
        assert 0 <= r.n_novel <= r.n_shingles
        assert (r.novelty_bp is None) == (r.n_shingles == 0)
        if r.novelty_bp is not None:
            assert 0 <= r.novelty_bp <= 10_000


def test_minhash_estimate_error_bounds(spark):
    from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    rows = m.minhash_estimate_error(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_true = ngram_jaccard_pairs(docs, threshold=0.5, oracle=True).count()
    assert len(rows) == n_true > 0
    for r in rows:
        assert 0 <= r.est_matches <= m._MH_K
        assert 5_000 <= r.jaccard_bp <= 10_000
        est_bp = 1e4 * r.est_matches / m._MH_K
        assert abs(r.err_bp - round(abs(est_bp - r.jaccard_bp))) <= 1
    # the 8-hash estimator must be informative on true near-dups: mean
    # absolute error well under the trivial always-0 estimator's ~7500
    assert sum(r.err_bp for r in rows) / len(rows) < 4_000


def test_lang_confusion_matrix_totals(spark):
    rows = m.lang_confusion_matrix(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r.n for r in rows) == docs.count()
    per_lang = defaultdict(int)
    for r in rows:
        assert r.lang_pred in {"en", "de", "fr", "es", "unknown"}
        per_lang[r.lang] += r.n
    stored = {r.lang: r.n for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert dict(per_lang) == stored


def test_embedding_norm_outliers_algebra(spark):
    rows = m.embedding_norm_outliers(spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert len(rows) == emb.count()
    n = len(rows)
    s = sum(r.norm_micro for r in rows)
    q = sum(r.norm_micro**2 for r in rows)
    for r in rows:
        expect = int((n * r.norm_micro - s) ** 2 > 4 * (n * q - s * s))
        assert r.is_outlier == expect
    flagged = sum(r.is_outlier for r in rows)
    assert flagged < n  # z>2 cannot flag everything


def test_stratified_split_deterministic_md5(spark):
    rows = m.stratified_split_assignment(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    expect = defaultdict(lambda: [0, 0])  # (source, split) -> [docs, tokens]
    for r in docs.select("doc_id", "source", "text").collect():
        d = hashlib.md5(str(r.doc_id).encode()).hexdigest()[0]
        split = "val" if d in "cd" else "test" if d in "ef" else "train"
        cell = expect[(r.source, split)]
        cell[0] += 1
        cell[1] += len([t for t in r.text.split(" ") if t])
    assert {(r.source, r.split): [r.n_docs, r.n_tokens] for r in rows} == \
        dict(expect)
