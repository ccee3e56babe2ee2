"""Text analysis: profile stats, language ID, fingerprints."""

from defi_etl_platform_sqlglot_implementation__spark.operators.textstats import (
    fingerprints,
    lang_id,
    text_profile,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestTextProfile:
    def test_known_counts(self, spark):
        r = text_profile(_docs(spark, [(1, "the cat sat on a mat")])).collect()[0]
        assert r["n_chars"] == 20
        assert r["n_words"] == 6
        assert r["n_tokens"] == 6
        assert r["n_stopwords"] == 2  # 'the', 'a'
        assert abs(r["stopword_ratio"] - 2 / 6) < 1e-12
        assert abs(r["avg_word_len"] - 15 / 6) < 1e-12

    def test_quality_bounds(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        rows = text_profile(docs).collect()
        assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)
        assert all(r["n_tokens"] >= r["n_words"] - 1 for r in rows)


class TestLangId:
    def test_marker_detection(self, spark):
        rows = lang_id(
            _docs(spark, [
                (1, "the cat and the dog saw the bird"),
                (2, "der hund und der mann sah der baum"),
                (3, "xyz qqq zzz"),
            ])
        ).collect()
        by_id = {r["doc_id"]: r for r in rows}
        assert by_id[1]["lang_pred"] == "en"
        assert by_id[1]["n_en"] == 3
        assert by_id[2]["lang_pred"] == "de"
        assert by_id[3]["lang_pred"] == "unknown"

    def test_tie_prefers_english(self, spark):
        r = lang_id(_docs(spark, [(1, "the x der y")])).collect()[0]
        assert r["n_en"] == 1 and r["n_de"] == 1
        assert r["lang_pred"] == "en"


class TestFingerprints:
    def test_whitespace_insensitive(self, spark):
        rows = fingerprints(
            _docs(spark, [(1, "Hello  World"), (2, "hello world"), (3, "other")])
        ).collect()
        fp = {r["doc_id"]: r["fingerprint"] for r in rows}
        assert fp[1] == fp[2]
        assert fp[1] != fp[3]
        assert all(len(r["fingerprint"]) == 32 for r in rows)
        assert all(r["fingerprint"].startswith(r["fp_prefix"]) for r in rows)


class TestTokenEntropy:
    def test_entropy_values(self, spark):
        import math

        from defi_etl_platform_sqlglot_implementation__spark.operators.textstats import (
            token_entropy,
        )

        docs = spark.createDataFrame(
            [
                (1, "a a a a"),          # one token: entropy 0
                (2, "a b c d"),          # uniform over 4: ln(4)
                (3, "a a b b b c"),      # mixed: -(2/6 ln 2/6 + 3/6 ln 3/6 + 1/6 ln 1/6)
            ],
            ["doc_id", "text"],
        )
        got = {r["doc_id"]: r for r in token_entropy(docs).collect()}
        assert got[1]["entropy"] == 0.0 and got[1]["n_distinct"] == 1
        assert abs(got[2]["entropy"] - math.log(4)) < 1e-12
        expected3 = -(2/6 * math.log(2/6) + 3/6 * math.log(3/6) + 1/6 * math.log(1/6))
        assert abs(got[3]["entropy"] - expected3) < 1e-12
        assert got[3]["diversity"] == 0.5  # 3 distinct / 6 tokens

    def test_low_entropy_flags_boilerplate(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.operators.textstats import (
            token_entropy,
        )

        docs = spark.createDataFrame(
            [(1, "buy now " * 50), (2, "a genuinely varied sentence with many "
                                       "distinct informative words inside it")],
            ["doc_id", "text"],
        )
        got = {r["doc_id"]: r["entropy"] for r in token_entropy(docs).collect()}
        assert got[1] < got[2]
