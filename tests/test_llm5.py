"""Property tests for the wave-5 curation ops (registry_llm5): quality
rule consistency, incremental dedup partitioning, kNN vote sanity,
mean-pool reconstruction, containment asymmetry.  Cross-engine value
evidence lives in the oracle gates; these pin operator invariants a hash
can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark import registry_llm5 as m

SF = "/root/testdata/sf0.001"


def test_gopher_flags_conjunction_and_bounds(spark):
    rows = m.gopher_quality_flags(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.n_words >= 1
        assert 0.0 < r.distinct_ratio <= 1.0
        assert 1.0 / r.n_words <= r.top_tok_share <= 1.0
        for f in ("f_len", "f_wlen", "f_distinct", "f_toptok", "f_stop",
                  "keep"):
            assert getattr(r, f) in (0, 1)
        expect = (r.f_len and r.f_wlen and r.f_distinct and r.f_toptok
                  and r.f_stop)
        assert r.keep == int(expect)
    # the rule bundle must discriminate on this corpus, not rubber-stamp
    kept = sum(r.keep for r in rows)
    assert 0 < kept < 500


def test_dedup_incremental_statuses_partition_batch(spark):
    rows = m.dedup_incremental(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_new = docs.filter(F.col("doc_id") % 5 == 0).count()
    assert len(rows) == n_new
    by_status = {}
    for r in rows:
        by_status.setdefault(r.status, []).append(r)
    assert set(by_status) <= {"dup_of_corpus", "dup_in_batch", "unique"}
    # per hash: at most one 'unique'/'dup_of_corpus'-free representative
    from collections import Counter

    uniq_h = Counter(r.h for r in by_status.get("unique", []))
    assert all(v == 1 for v in uniq_h.values())
    # a batch hash marked dup_of_corpus must exist in the old partition
    old_h = {
        r.h
        for r in docs.filter(F.col("doc_id") % 5 != 0)
        .select(F.md5("text").alias("h")).collect()
    }
    for r in by_status.get("dup_of_corpus", []):
        assert r.h in old_h
    for r in by_status.get("unique", []) + by_status.get("dup_in_batch", []):
        assert r.h not in old_h


def test_knn_accuracy_counts_consistent(spark):
    rows = m.knn_label_accuracy(spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_eval = emb.filter(F.col("vec_id") % 10 == 0).count()
    assert sum(r.n_eval for r in rows) == n_eval
    for r in rows:
        assert 0 <= r.n_correct <= r.n_eval
        assert abs(r.accuracy - r.n_correct / r.n_eval) < 1e-15


def test_knn_capped_eval_degenerates_to_uncapped_when_cap_not_binding(spark):
    """sf0.001 has 50 eval vectors < the 128 cap, so the capped gate must
    equal the uncapped gate row-for-row — the scoring semantics are
    byte-identical by construction and this pins it."""
    capped = {r.label: (r.n_eval, r.n_correct, r.accuracy)
              for r in m.knn_label_accuracy_capped_eval(spark, SF).collect()}
    full = {r.label: (r.n_eval, r.n_correct, r.accuracy)
            for r in m.knn_label_accuracy(spark, SF).collect()}
    assert capped == full


def test_knn_capped_eval_cap_binds_at_sf01(spark):
    """At sf0.1 the eval split (200 of 2000 vectors) exceeds the 128
    cap: exactly 128 queries are scored — the linear-cost contract.
    (sf0.001/sf0.01 both carry 500 embeddings = 50 eval, under the cap.)"""
    rows = m.knn_label_accuracy_capped_eval(
        spark, "/root/testdata/sf0.1").collect()
    assert sum(r.n_eval for r in rows) == m._KNN_CAP
    for r in rows:
        assert 0 <= r.n_correct <= r.n_eval
        assert abs(r.accuracy - r.n_correct / r.n_eval) < 1e-15


def test_mean_pool_reconstructs_per_label_counts(spark):
    rows = m.embedding_mean_pool(spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    sizes = {r.label: r.n for r in
             emb.groupBy("label").agg(F.count("*").alias("n")).collect()}
    dim = len(emb.select("embedding").first().embedding)
    assert len(rows) == len(sizes) * dim
    for r in rows:
        assert r.n == sizes[r.label]
        assert abs(r.mean_micro - r.sum_micro / r.n) < 1e-9


def test_containment_pairs_superset_of_high_jaccard(spark):
    from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cont = m.minhash_containment(spark, SF).collect()
    assert cont
    for r in cont:
        assert 0.8 <= r.containment <= 1.0
        assert r.inter <= r.n_contained
        assert r.contained != r.container
    # any pair with exact Jaccard >= 0.8 has containment >= 0.8 BOTH ways
    jac = ngram_jaccard_pairs(docs, threshold=0.8, oracle=True).collect()
    cont_pairs = {(r.contained, r.container) for r in cont}
    for r in jac:
        assert (r.d1, r.d2) in cont_pairs
        assert (r.d2, r.d1) in cont_pairs


def test_gopher_empty_text_doc_keeps_its_row(spark, tmp_path):
    """One row per document even when text splits to no tokens: the
    lowest-quality doc must appear with zeroed metrics and keep=0, not
    vanish (review regression)."""
    import defi_etl_platform_sqlglot_implementation__spark.registry_llm5 as m5

    docs = spark.createDataFrame(
        [(0, ""), (1, "the a table big merge scan row filter")],
        "doc_id long, text string")
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {r.doc_id: r for r in
            m5.gopher_quality_flags(spark, str(tmp_path)).collect()}
    assert set(rows) == {0, 1}
    z = rows[0]
    assert (z.n_words, z.stop_hits, z.keep) == (0, 0, 0)
    assert z.distinct_ratio == 0.0 and z.top_tok_share == 0.0
