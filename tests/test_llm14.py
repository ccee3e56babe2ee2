"""Wave 14: URL canonicalization/dedup, normalized MinHash, paragraph
dedup + reassembly, incremental + streaming decontamination."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark import registry_llm9  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark import registry_llm14  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


class TestUrlCanonicalize:
    def test_edge_urls(self, spark):
        """Hand-built edges the synthetic corpus doesn't produce."""
        from defi_etl_platform_sqlglot_implementation__spark.registry_llm14 import (
            canonicalize_urls,
        )

        rows = [
            (0, "HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&z=1&a=2#f"),
            (1, "https://example.com"),                   # bare domain
            (2, "https://sub.example.com:8443/p"),        # non-default port kept
            (3, "http://example.com:443/p"),              # :443 NOT default for http
            (4, "https://example.com/?utm_a=1&utm_b=2"),  # all params tracking
            (5, "https://www.example.com/x//"),           # only ONE trailing / dropped
            (6, "https://localhost/x"),                   # single-label host
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        got = {r["doc_id"]: r.asDict()
               for r in canonicalize_urls(df).collect()}
        assert got[0]["canonical_url"] == "https://example.com/A/b?a=2&z=1"
        assert got[0]["host"] == "example.com"
        assert got[0]["domain"] == "example.com"
        assert got[1]["canonical_url"] == "https://example.com/"
        assert got[2]["canonical_url"] == "https://sub.example.com:8443/p"
        # domain is computed on the PORT-STRIPPED host
        assert got[2]["domain"] == "example.com"
        assert got[3]["canonical_url"] == "http://example.com:443/p"
        assert got[3]["domain"] == "example.com"
        # single-label host: domain degrades to the host itself (the
        # slice start clamps to 1 — Spark rejects start 0)
        assert got[6]["canonical_url"] == "https://localhost/x"
        assert got[6]["domain"] == "localhost"
        assert got[4]["canonical_url"] == "https://example.com/"
        assert got[5]["canonical_url"] == "https://example.com/x/"

    def test_gate_folds_variants(self, spark):
        """Docs sharing a page key fold to ONE canonical URL despite
        case/port/www/tracking/slash/fragment differences in the raw."""
        pdf = QUERIES["url_canonicalize"](spark, SF).toPandas()
        by_canon = pdf.groupby("canonical_url")["url"].nunique()
        assert (pdf.groupby("canonical_url").size() >= 2).any()
        # raw variants genuinely differ inside a fold group
        assert (by_canon >= 2).any()
        # canonical urls are normalized: no fragments, no utm, lowercase host
        assert not pdf.canonical_url.str.contains("#").any()
        assert not pdf.canonical_url.str.contains("utm_").any()
        assert not pdf.canonical_url.str.contains("WWW").any()
        assert not pdf.canonical_url.str.contains(":443").any()


class TestUrlDomainDedup:
    def test_cap_and_counts(self, spark):
        pdf = QUERIES["url_domain_dedup"](spark, SF).toPandas()
        # ranks are 1..k within every domain, kept iff rank <= cap
        for _, g in pdf.groupby("domain"):
            assert sorted(g.domain_rank) == list(range(1, len(g) + 1))
        assert (pdf.kept == (pdf.domain_rank <= 10)).all()
        # duplicate counts sum to the corpus size
        docs = spark.read.parquet(f"{SF}/documents.parquet").count()
        assert pdf.n_dups.sum() == docs
        # the per-domain cap actually bites on this corpus
        assert (~pdf.kept).any()


class TestNormalizedMinhash:
    def test_normalization_finds_case_punct_digit_dups(self, spark):
        """Three renditions of one sentence (cased / comma-joined /
        digit-suffixed) are invisible to raw-text MinHash but collapse
        to near-identical shingle sets after normalization."""
        from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
            minhash_lsh_pairs,
        )

        base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
        rows = [
            (1, base + " v2024"),
            (2, base.upper() + " V1999"),
            (3, base.replace(" ", ", ") + ", v2000"),
            (4, "totally different words nothing shared here at all ok fine"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        raw_pairs = {(r.d1, r.d2) for r in
                     minhash_lsh_pairs(docs, threshold=0.5).collect()}
        assert raw_pairs == set()  # case/punct/digits defeat raw minhash
        norm = docs.select(
            "doc_id",
            F.expr("trim(regexp_replace(regexp_replace(regexp_replace("
                   "lower(text), '[0-9]', '0'), '[^a-z0 ]', ' '),"
                   " '  *', ' '))").alias("ntext"),
        )
        norm_pairs = {(r.d1, r.d2) for r in
                      minhash_lsh_pairs(norm, threshold=0.5,
                                        text_col="ntext").collect()}
        assert norm_pairs == {(1, 2), (1, 3), (2, 3)}

    def test_gate_jaccard_bounds(self, spark):
        pdf = QUERIES["dedup_minhash_normalized"](spark, SF).toPandas()
        assert (pdf.jaccard >= 0.5).all() and (pdf.jaccard <= 1.0).all()
        assert (pdf.d1 < pdf.d2).all()


class TestParagraphDedup:
    def test_spans_point_at_canonical(self, spark):
        pdf = QUERIES["paragraph_dup_spans"](spark, SF).toPandas()
        assert len(pdf) > 0
        # canonical is strictly smaller in (doc, idx) order
        packed = pdf.doc_id * 100000 + pdf.para_idx
        cpacked = pdf.canonical_doc * 100000 + pdf.canonical_idx
        assert (cpacked < packed).all()

    def test_reassembly_invariants(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
        out = QUERIES["paragraph_dedup_reassembly"](spark, SF).toPandas()
        assert len(out) == len(docs)
        merged = out.merge(docs[["doc_id", "text"]], on="doc_id")
        spans = QUERIES["paragraph_dup_spans"](spark, SF).toPandas()
        dropped_docs = set(spans.doc_id)
        for _, r in merged.iterrows():
            if r.doc_id not in dropped_docs:
                assert r.kept_text == r.text  # no dups -> identity
                assert r.n_dropped == 0
            else:
                # kept_text is the original minus whole 10-token blocks
                orig = r.text.split(" ")
                kept = r.kept_text.split(" ") if r.kept_text else []
                assert len(kept) < len(orig)
        # dropped counts agree with the spans gate
        by_doc = spans.groupby("doc_id").size()
        for doc_id, n in by_doc.items():
            assert int(out.loc[out.doc_id == doc_id, "n_dropped"].iloc[0]) == n


class TestIncrementalDecontamination:
    def test_monotone_and_terminal_totals(self, spark):
        pdf = (QUERIES["decontamination_incremental"](spark, SF)
               .toPandas().sort_values("batch"))
        assert list(pdf.batch) == list(range(8))
        assert pdf.matched_pairs_cum.is_monotonic_increasing
        assert pdf.docs_contaminated_cum.is_monotonic_increasing
        # terminal state equals the static report's totals
        rep = QUERIES["split_decontamination_report"](spark, SF).toPandas()
        assert pdf.matched_pairs_cum.iloc[-1] == rep.n_matched.sum()
        assert (pdf.docs_contaminated_cum.iloc[-1]
                == (rep.n_matched > 0).sum())


class TestStreamingDecontamination:
    def test_stream_matches_batch_final_state(self, spark, tmp_path):
        """Two train micro-batches (maxFilesPerTrigger=1) -> the complete-
        mode sink equals the batch twin's terminal row, proving the
        stateful shingle dedup carries state ACROSS batches."""
        from defi_etl_platform_sqlglot_implementation__spark.registry_llm6 import (
            _split_col,
        )
        from defi_etl_platform_sqlglot_implementation__spark.streaming.decontamination import (
            contamination_stream,
            eval_shingle_pairs,
        )

        docs = (spark.read.parquet(f"{SF}/documents.parquet")
                .select("doc_id", "text").withColumn("split", _split_col()))
        train = docs.filter(F.col("split") == "train").drop("split")
        ev = docs.filter(F.col("split") != "train").drop("split")
        eval_pairs = eval_shingle_pairs(ev)

        src = tmp_path / "train_stream"
        src.mkdir()
        rows = train.collect()
        half = len(rows) // 2
        for i, chunk in enumerate((rows[:half], rows[half:])):
            (src / f"part{i}.json").write_text("\n".join(
                json.dumps({"doc_id": r["doc_id"], "text": r["text"]})
                for r in chunk))

        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", 1).json(str(src)))
        q = (contamination_stream(stream, eval_pairs)
             .writeStream.format("memory").queryName("decontam_test")
             .outputMode("complete")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .start())
        try:
            q.processAllAvailable()
            got = {r["doc_id"]: r["n_matched"]
                   for r in spark.sql("SELECT * FROM decontam_test").collect()}
        finally:
            q.stop()

        batch = (QUERIES["decontamination_incremental"](spark, SF)
                 .toPandas().sort_values("batch"))
        assert sum(got.values()) == batch.matched_pairs_cum.iloc[-1]
        assert len(got) == batch.docs_contaminated_cum.iloc[-1]
        # per-doc parity with the static report
        rep = (QUERIES["split_decontamination_report"](spark, SF)
               .toPandas())
        want = {int(r.doc_id): int(r.n_matched)
                for _, r in rep.iterrows() if r.n_matched > 0}
        assert got == want
