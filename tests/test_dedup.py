"""Dedup operators: exact, n-gram Jaccard, MinHash-LSH, SimHash."""

import pytest

from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
    char_jaccard_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_signatures,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestExactDedup:
    def test_duplicate_grouping(self, spark):
        docs = _docs(spark, [(1, "a b c"), (2, "a b c"), (3, "x y z")])
        out = {r["canonical_id"]: r for r in exact_dedup(docs).collect()}
        assert out[1]["n_copies"] == 2
        assert out[3]["n_copies"] == 1

    def test_testdata_has_no_exact_dups(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        out = exact_dedup(docs)
        assert out.count() == docs.count()


class TestNgramJaccard:
    def test_identical_docs_jaccard_one(self, spark):
        text = "the quick brown fox jumps over the lazy dog again and again"
        docs = _docs(spark, [(1, text), (2, text), (3, "totally different words here")])
        rows = ngram_jaccard_pairs(docs, threshold=0.9).collect()
        assert len(rows) == 1
        assert rows[0]["d1"] == 1 and rows[0]["d2"] == 2
        assert rows[0]["jaccard"] == 1.0

    def test_near_duplicates_detected(self, spark):
        a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        b = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
        docs = _docs(spark, [(1, a), (2, b)])
        rows = ngram_jaccard_pairs(docs, threshold=0.5).collect()
        assert len(rows) == 1
        assert 0.5 <= rows[0]["jaccard"] < 1.0


class TestMinHashLSH:
    def test_matches_brute_force_on_testdata(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        brute = {(r["d1"], r["d2"]) for r in
                 ngram_jaccard_pairs(docs, threshold=0.5).collect()}
        lsh = {(r["d1"], r["d2"]) for r in
               minhash_lsh_pairs(docs, threshold=0.5).collect()}
        assert lsh == brute
        assert len(brute) >= 20  # planted near-dups exist

    def test_verification_drops_false_candidates(self, spark):
        # same band-bucket collisions possible, but exact verify gates output
        docs = _docs(spark, [(1, "a b c d e f"), (2, "a b c x y z"), (3, "q r s t u v")])
        rows = minhash_lsh_pairs(docs, threshold=0.9).collect()
        assert rows == []


class TestSimHash:
    def test_identical_text_same_signature(self, spark):
        docs = _docs(spark, [(1, "spark flink trino"), (2, "spark flink trino")])
        sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
        assert sigs[1] == sigs[2]
        pairs = simhash_pairs(docs, max_hamming=0).collect()
        assert len(pairs) == 1 and pairs[0]["hamming"] == 0

    def test_signature_is_32bit(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
        for r in simhash_signatures(docs).collect():
            assert 0 <= r["simhash"] < 2**32


class TestCharJaccard:
    def test_identical_docs(self, spark):
        text = "abcdefghijklmnopqrstuvwxyz 0123456789"
        docs = _docs(spark, [(1, text), (2, text), (3, "zzzzzzzz")])
        rows = char_jaccard_pairs(docs, threshold=0.9).collect()
        assert len(rows) == 1 and rows[0]["jaccard"] == 1.0

    def test_tokenization_robust(self, spark):
        # word-level Jaccard sees these as fully different tokens; char
        # 5-grams still overlap heavily (only whitespace shifted)
        a = "deterministic hashing of documents"
        b = "deterministichashing of documents"
        docs = _docs(spark, [(1, a), (2, b)])
        rows = char_jaccard_pairs(docs, threshold=0.5).collect()
        assert len(rows) == 1
        word = ngram_jaccard_pairs(docs, threshold=0.5).collect()
        assert word == []


class TestWeightedSimHash:
    def test_repetition_collapses_to_single_token_signature(self, spark):
        # weighted sums of "spam spam spam" are 3x the ±1 vector of "spam":
        # same signs, so the signature equals the single-token one exactly
        docs = _docs(spark, [(1, "spam spam spam"), (2, "spam")])
        wgt = {r["doc_id"]: r["simhash"]
               for r in simhash_signatures(docs, weighted=True).collect()}
        assert wgt[1] == wgt[2]

    def test_weighted_equals_unweighted_on_distinct_tokens(self, spark):
        docs = _docs(spark, [(1, "one two three four five")])
        [u] = simhash_signatures(docs).collect()
        [w] = simhash_signatures(docs, weighted=True).collect()
        assert u["simhash"] == w["simhash"]


class TestSimHashBlocking:
    def test_blocked_equals_cross_join(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        blocked = {(r["d1"], r["d2"], r["hamming"])
                   for r in simhash_pairs(docs, max_hamming=3, blocked=True).collect()}
        full = {(r["d1"], r["d2"], r["hamming"])
                for r in simhash_pairs(docs, max_hamming=3, blocked=False).collect()}
        assert blocked == full  # pigeonhole: exact recall


class TestShingleDfCap:
    def test_high_cap_is_identity(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
            ngram_jaccard_pairs,
        )

        docs = spark.createDataFrame(
            [(1, "a b c d e"), (2, "a b c d x"), (3, "q r s t u"), (4, "q r s t u")],
            ["doc_id", "text"],
        )
        base = {(r.d1, r.d2): r.jaccard
                for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
        capped = {(r.d1, r.d2): r.jaccard
                  for r in ngram_jaccard_pairs(docs, threshold=0.3,
                                               max_shingle_df=10).collect()}
        assert base == capped and len(base) >= 2

    def test_low_cap_drops_stopword_shingles(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
            ngram_jaccard_pairs,
        )

        # "the of and" appears in every doc (a stopword shingle, df=3);
        # with the cap at 2 it stops linking otherwise-unrelated docs
        docs = spark.createDataFrame(
            [(1, "the of and p q r"), (2, "the of and x y z"),
             (3, "the of and x y z")],
            ["doc_id", "text"],
        )
        uncapped = {(r.d1, r.d2)
                    for r in ngram_jaccard_pairs(docs, threshold=0.1).collect()}
        capped = {(r.d1, r.d2)
                  for r in ngram_jaccard_pairs(docs, threshold=0.1,
                                               max_shingle_df=2).collect()}
        assert (1, 2) in uncapped and (1, 3) in uncapped
        assert (2, 3) in capped
        assert (1, 2) not in capped and (1, 3) not in capped


class TestSpreadSizeAware:
    """_spread: input-size-aware parallelism, no-op for many-file scans."""

    def test_many_file_scan_skips_shuffle(self, spark, tmp_path):
        from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
            _spread,
        )

        n = spark.sparkContext.defaultParallelism
        path = str(tmp_path / "many")
        (spark.createDataFrame([(i, f"doc {i}") for i in range(400)],
                               ["doc_id", "text"])
         .repartition(n + 4).write.parquet(path))
        docs = spark.read.parquet(path)
        assert len(docs.inputFiles()) >= n
        out = _spread(docs, "doc_id")
        assert out is docs  # many-file scan: no extra exchange

    def test_shuffled_input_still_spreads(self, spark):
        # a non-scan input (no inputFiles) keeps the explicit repartition
        # even when its STATIC partition count looks large — AQE could
        # coalesce it at runtime, so the explicit numPartitions stays
        from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
            _spread,
        )

        n = spark.sparkContext.defaultParallelism
        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(200)], ["doc_id", "text"]
        ).repartition(n + 4)
        out = _spread(docs, "doc_id")
        assert out is not docs

    def test_stats_probe_returns_positive_size_on_parquet_scan(self, spark, tmp_path):
        # _scan_size_bytes walks private Spark API; this guard makes a
        # Spark upgrade that breaks the walk fail LOUDLY here instead of
        # silently collapsing _spread to core-count parallelism
        from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
            _scan_size_bytes,
        )

        path = str(tmp_path / "probe")
        (spark.createDataFrame([(i, f"doc {i} " * 20) for i in range(500)],
                               ["doc_id", "text"]).write.parquet(path))
        size = _scan_size_bytes(spark.read.parquet(path))
        assert size is not None and size > 0, (
            "optimizer stats probe broke — _spread would silently "
            "de-optimize; update _scan_size_bytes for this Spark version"
        )

    def test_single_partition_input_spreads(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
            _spread,
        )

        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(200)], ["doc_id", "text"]
        ).coalesce(1)
        out = _spread(docs, "doc_id")
        assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism


class TestAutoCap:
    """The quadratic brute paths must never run uncapped at scale unless
    the caller explicitly declares the oracle path (VERDICT r3 #6)."""

    def test_large_corpus_is_auto_capped(self, spark, monkeypatch):
        from defi_etl_platform_sqlglot_implementation__spark.operators import dedup

        monkeypatch.setattr(dedup, "AUTO_CAP_MIN_DOCS", 3)
        docs = spark.createDataFrame(
            [(i, "the same text everywhere") for i in range(8)],
            ["doc_id", "text"],
        )
        # every shingle has df=8 > AUTO_CAP_DF? no — cap is 64; shrink it
        monkeypatch.setattr(dedup, "AUTO_CAP_DF", 4)
        capped = dedup.char_jaccard_pairs(docs, threshold=0.0).collect()
        assert capped == []  # all grams df=8 > 4 -> dropped before join
        uncapped = dedup.char_jaccard_pairs(
            docs, threshold=0.0, oracle=True).collect()
        assert len(uncapped) == 8 * 7 // 2  # identical docs, all pairs

    def test_small_corpus_stays_exact(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.operators import dedup

        docs = spark.createDataFrame(
            [(i, "the same text everywhere") for i in range(4)],
            ["doc_id", "text"],
        )
        assert len(dedup.char_jaccard_pairs(docs, threshold=0.0).collect()) \
            == 4 * 3 // 2

    def test_auto_cap_warns_and_none_is_uncapped(self, spark, monkeypatch):
        """ADVICE r4: the auto-cap may never SILENTLY change the metric —
        it warns when applied, and an explicit None is the uncapped exact
        path (no probe, no cap, no warning)."""
        import warnings as w

        from defi_etl_platform_sqlglot_implementation__spark.operators import dedup

        monkeypatch.setattr(dedup, "AUTO_CAP_MIN_DOCS", 3)
        monkeypatch.setattr(dedup, "AUTO_CAP_DF", 4)
        docs = spark.createDataFrame(
            [(i, "the same text everywhere") for i in range(8)],
            ["doc_id", "text"],
        )
        with pytest.warns(UserWarning, match="auto-applying"):
            assert dedup.char_jaccard_pairs(docs, threshold=0.0).collect() == []
        with w.catch_warnings():
            w.simplefilter("error")  # any warning -> test failure
            rows = dedup.char_jaccard_pairs(
                docs, threshold=0.0, max_chargram_df=None).collect()
        assert len(rows) == 8 * 7 // 2
        with pytest.raises(ValueError, match="df cap"):
            dedup.char_jaccard_pairs(docs, threshold=0.0,
                                     max_chargram_df="bogus")

    def test_ngram_path_shares_the_guard(self, spark, monkeypatch):
        from defi_etl_platform_sqlglot_implementation__spark.operators import dedup

        monkeypatch.setattr(dedup, "AUTO_CAP_MIN_DOCS", 3)
        monkeypatch.setattr(dedup, "AUTO_CAP_DF", 4)
        docs = spark.createDataFrame(
            [(i, "many shared words in this document") for i in range(8)],
            ["doc_id", "text"],
        )
        assert dedup.ngram_jaccard_pairs(docs, threshold=0.0).collect() == []
        assert len(dedup.ngram_jaccard_pairs(
            docs, threshold=0.0, oracle=True).collect()) == 8 * 7 // 2
