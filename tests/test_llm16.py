"""Wave 16: cross-modal dedup, DoReMi-style source reweighting,
granularity-parameterized exact-substring dedup."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark import registry_llm3  # noqa: F401 — fills QUERIES (substring_dup_spans twin)
from defi_etl_platform_sqlglot_implementation__spark import registry_llm16  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


class TestDupSpanGranularity:
    def test_containment_and_monotonicity(self, spark):
        """Every n=12 duplicated span lies inside some n=6 span of the
        same doc (a 12-token verbatim match contains duplicated 6-token
        windows at every offset), and per doc the n=6 inventory covers
        at least as many tokens — the knob only ever clips MORE as n
        shrinks."""
        pdf = QUERIES["dup_span_granularity"](spark, SF).toPandas()
        assert set(pdf.n) == {6, 12}
        assert (pdf.span_tokens
                == pdf.span_end - pdf.span_start + 1).all()
        six = pdf[pdf.n == 6]
        twelve = pdf[pdf.n == 12]
        assert len(six) and len(twelve)
        by_doc6 = {d: list(zip(g.span_start, g.span_end))
                   for d, g in six.groupby("doc_id")}
        for r in twelve.itertuples():
            spans6 = by_doc6.get(r.doc_id, [])
            assert any(s <= r.span_start and r.span_end <= e
                       for s, e in spans6), (r.doc_id, r.span_start)
        cov6 = six.groupby("doc_id").span_tokens.sum()
        cov12 = twelve.groupby("doc_id").span_tokens.sum()
        joined = cov6.to_frame("c6").join(cov12.to_frame("c12"),
                                          how="right").fillna(0)
        assert (joined.c6 >= joined.c12).all()

    def test_matches_fixed8_gate_at_n8(self, spark):
        """dup_token_spans(n=8) reproduces the registry_llm3 fixed-8
        gate row-for-row — the generalization is a strict superset."""
        from defi_etl_platform_sqlglot_implementation__spark.registry_llm16 import (
            dup_token_spans,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet") \
            .select("doc_id", "text")
        got = dup_token_spans(docs, 8).drop("n").toPandas() \
            .sort_values(["doc_id", "span_start"]).reset_index(drop=True)
        want = QUERIES["substring_dup_spans"](spark, SF).toPandas() \
            .sort_values(["doc_id", "span_start"]).reset_index(drop=True)
        assert got.equals(want[got.columns.tolist()])

    def test_rejects_degenerate_n(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.registry_llm16 import (
            dup_token_spans,
        )

        docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        with pytest.raises(ValueError, match="must be >= 2"):
            dup_token_spans(docs, 1)


class TestCrossModalDedup:
    def test_fuses_both_modalities(self, spark):
        pdf = QUERIES["cross_modal_dedup"](spark, SF).toPandas()
        docs = spark.read.parquet(f"{SF}/documents.parquet").count()
        assert len(pdf) == docs
        # exactly one keep per joint cluster, and it is the min doc id
        for cid, g in pdf.groupby("joint_cluster"):
            assert g.keep.sum() == 1
            assert g[g.keep].doc_id.iloc[0] == g.doc_id.min() == cid
        # docs untouched by either modality are singleton keeps
        none = pdf[pdf.modality == "none"]
        assert (none.joint_cluster == none.doc_id).all()
        assert none.keep.all()
        # both modalities genuinely contribute edges on this corpus
        assert (pdf.modality == "image").any()
        assert (pdf.modality == "text").any()
        # modality string is consistent with the flags
        assert ((pdf.modality == "both")
                == (pdf.img_dup & pdf.txt_dup)).all()
        assert ((pdf.modality == "none")
                == (~pdf.img_dup & ~pdf.txt_dup)).all()

    def test_pairs_land_in_one_cluster(self, spark):
        """Every per-modality near-dup pair ends up in the SAME joint
        cluster — the fused decision can never split what either
        modality joined."""
        from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
            minhash_lsh_pairs,
        )
        from defi_etl_platform_sqlglot_implementation__spark.operators.media_dedup import (
            ahash_near_pairs,
            image_ahash_signatures,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        lbl = {r.doc_id: r.joint_cluster
               for r in QUERIES["cross_modal_dedup"](spark, SF).collect()}
        img = ahash_near_pairs(image_ahash_signatures(docs), 3).collect()
        txt = minhash_lsh_pairs(docs, threshold=0.5) \
            .select("d1", "d2").collect()
        assert img and txt
        for r in img:
            assert lbl[r.doc_a] == lbl[r.doc_b]
        for r in txt:
            assert lbl[r.d1] == lbl[r.d2]


class TestDoremiSourceWeights:
    def test_replay_and_budget(self, spark):
        """Pure-Python replay of the mixture arithmetic from the gate's
        own audit columns, plus the bp budget: weights renormalize to
        ~10^4."""
        pdf = QUERIES["doremi_source_weights"](spark, SF).toPandas() \
            .sort_values("source").reset_index(drop=True)
        assert len(pdf) == pdf.source.nunique()
        # factor replay: max(0, 1e6 + excess), zero-heldout -> neutral
        for r in pdf.itertuples():
            want = max(0, 1000000 + r.excess_micro)
            assert r.factor_micro == want
            if r.n_heldout_bigrams == 0:
                assert r.excess_micro == 0
        # weight replay: ordered sqrt fold in source order
        usum = 0.0
        for r in pdf.itertuples():
            usum += math.sqrt(float(r.n_tokens)) * float(r.factor_micro)
        for r in pdf.itertuples():
            u = math.sqrt(float(r.n_tokens)) * float(r.factor_micro)
            assert r.weight_bp == round(1.0e4 * (u / usum))
        # budget: rounding drift stays under half a bp per source
        assert abs(pdf.weight_bp.sum() - 10000) <= len(pdf) // 2 + 1
        # the update genuinely moves the mix on this corpus
        assert pdf.excess_micro.abs().max() > 0

    def test_reprices_toward_high_excess(self, spark):
        """Against the temperature baseline (factor == 1e6 for all),
        the repriced weight moves WITH excess loss: the max-excess
        source gains share, the min-excess source loses it."""
        pdf = QUERIES["doremi_source_weights"](spark, SF).toPandas()
        usum_base = sum(math.sqrt(float(t)) for t in pdf.n_tokens)
        base_bp = {
            r.source: 1.0e4 * math.sqrt(float(r.n_tokens)) / usum_base
            for r in pdf.itertuples()
        }
        hi = pdf.loc[pdf.excess_micro.idxmax()]
        lo = pdf.loc[pdf.excess_micro.idxmin()]
        assert hi.weight_bp >= base_bp[hi.source] - 1
        assert lo.weight_bp <= base_bp[lo.source] + 1
