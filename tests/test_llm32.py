"""Wave 32: dedup token savings, suffix containment, NB calibration,
crossed source×lang datasheet.  Cross-engine value evidence lives in the
oracle gates; these pin cross-gate agreement and full replays."""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm4  # noqa: F401 — fills QUERIES (dedup_keep_canonical)
from defi_etl_platform_sqlglot_implementation__spark import registry_llm14  # noqa: F401 — fills QUERIES (url_domain_dedup)
from defi_etl_platform_sqlglot_implementation__spark import registry_llm18  # noqa: F401 — fills QUERIES (nb_source_classifier)
from defi_etl_platform_sqlglot_implementation__spark import registry_llm32  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry_llm32 import (
    _SUFFIX_FRAG_OFFSET,
)

SF = "/root/testdata/sf0.001"


def _toks(text):
    return [w for w in text.split(" ") if w != ""]


class TestDedupTokenSavings:
    def _rows(self, spark):
        return {r.strategy: r
                for r in QUERIES["dedup_token_savings"](spark, SF).collect()}

    def test_accounting_identity_and_bounds(self, spark):
        rows = self._rows(spark)
        assert set(rows) == {"exact", "lsh_canonical", "url_domain",
                             "paragraph"}
        for r in rows.values():
            assert r.tokens_kept + r.tokens_removed == r.tokens_total
            assert 0 <= r.savings_bp <= 10000
            assert r.n_victims >= 0
        # one shared token denominator across all strategies
        assert len({r.tokens_total for r in rows.values()}) == 1

    def test_lsh_strategy_agrees_with_keep_canonical(self, spark):
        rows = self._rows(spark)
        keep = QUERIES["dedup_keep_canonical"](spark, SF).toPandas()
        victims = keep[keep.keep == 0].doc_id.tolist()
        assert rows["lsh_canonical"].n_victims == len(victims)
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        ntok = {int(r.doc_id): len(_toks(r.text))
                for r in docs.itertuples(index=False)}
        assert rows["lsh_canonical"].tokens_removed == \
            sum(ntok[d] for d in victims)

    def test_url_strategy_agrees_with_url_domain_dedup(self, spark):
        rows = self._rows(spark)
        url = QUERIES["url_domain_dedup"](spark, SF).toPandas()
        kept_docs = set(url[url.kept].canonical_doc.tolist())
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        assert rows["url_domain"].n_victims == len(docs) - len(kept_docs)

    def test_exact_and_paragraph_replay(self, spark):
        rows = self._rows(spark)
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        by_md5 = defaultdict(list)
        for r in docs.itertuples(index=False):
            by_md5[r.text].append(int(r.doc_id))
        exact_victims = [d for ids in by_md5.values()
                         for d in sorted(ids)[1:]]
        assert rows["exact"].n_victims == len(exact_victims)
        # paragraph: canonical occurrence per 10-token block hash survives
        P = 10
        occ = defaultdict(list)          # para string -> [(doc, idx)]
        for r in docs.itertuples(index=False):
            l = r.text.split(" ")
            nblocks = math.ceil(len(l) / P)
            for j in range(nblocks):
                para = " ".join(l[j * P:(j + 1) * P])
                occ[para].append((int(r.doc_id), j))
        removed_docs, removed_tok = set(), 0
        for para, occs in occ.items():
            if len(occs) < 2:
                continue
            ck = min(d * 100000 + i for d, i in occs)
            for d, i in occs:
                if d * 100000 + i != ck:
                    removed_docs.add(d)
                    removed_tok += len(_toks(para))
        assert rows["paragraph"].n_victims == len(removed_docs)
        assert rows["paragraph"].tokens_removed == removed_tok


class TestDocSuffixContainment:
    def test_brute_force_replay(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        pop = {int(r.doc_id): _toks(r.text)
               for r in docs.itertuples(index=False)}
        for did in sorted(pop):
            tk = pop[did]
            if did % 9 == 0 and len(tk) >= 8:
                pop[did + _SUFFIX_FRAG_OFFSET] = tk[len(tk) - len(tk) // 2:]
        pop = {d: tk for d, tk in pop.items() if len(tk) >= 4}
        expected = set()
        items = sorted(pop.items())
        for da, ta in items:
            for db, tb in items:
                if len(ta) < len(tb) and tb[len(tb) - len(ta):] == ta:
                    expected.add((da, db))
        got = {(r.contained_id, r.container_id)
               for r in QUERIES["doc_suffix_containment"](spark, SF)
               .collect()}
        assert got == expected
        assert got                        # the augmentation guarantees pairs

    def test_every_fragment_finds_its_source(self, spark):
        got = {(r.contained_id, r.container_id)
               for r in QUERIES["doc_suffix_containment"](spark, SF)
               .collect()}
        frags = {a for a, _ in got if a >= _SUFFIX_FRAG_OFFSET}
        for a in frags:
            assert (a, a - _SUFFIX_FRAG_OFFSET) in got


class TestQualityScoreCalibration:
    def test_marginals_agree_with_confusion_matrix(self, spark):
        cal = QUERIES["quality_score_calibration"](spark, SF).toPandas()
        cm = QUERIES["nb_source_classifier"](spark, SF).toPandas()
        per_src_docs = cm.groupby("true_source").n_docs.sum().to_dict()
        per_src_correct = (
            cm[cm.true_source == cm.predicted_source]
            .set_index("true_source").n_docs.to_dict())
        got_docs = cal.groupby("true_source").n_docs.sum().to_dict()
        got_correct = cal.groupby("true_source").n_correct.sum().to_dict()
        assert got_docs == per_src_docs
        for s, n in got_correct.items():
            assert n == per_src_correct.get(s, 0)

    def test_bucket_invariants(self, spark):
        cal = QUERIES["quality_score_calibration"](spark, SF).toPandas()
        assert set(cal.margin_q) <= {1, 2, 3, 4}
        assert (cal.n_correct <= cal.n_docs).all()
        assert (cal.n_keep <= cal.n_docs).all()
        assert (cal.n_dup <= cal.n_docs).all()
        # top1 - top2 under (score DESC, cls) ranking is never negative
        assert (cal.min_margin >= 0).all()
        assert (cal.min_margin <= cal.max_margin).all()
        # quartiles ordered by margin DESC: q1's min >= q4's max per source
        for s, g in cal.groupby("true_source"):
            g = g.set_index("margin_q")
            for q in range(1, 4):
                if q in g.index and (q + 1) in g.index:
                    assert g.loc[q].min_margin >= g.loc[q + 1].max_margin


class TestSourceLangDatasheet:
    def test_marginal_consistency(self, spark):
        ds = QUERIES["source_lang_datasheet"](spark, SF).toPandas()
        cells = ds[(ds.source != "<all>") & (ds.lang != "<all>")]
        for s, g in cells.groupby("source"):
            row = ds[(ds.source == s) & (ds.lang == "<all>")].iloc[0]
            assert row.n_docs == g.n_docs.sum()
            assert row.n_tokens == g.n_tokens.sum()
            assert row.vocab >= g.vocab.max()
        grand = ds[(ds.source == "<all>") & (ds.lang == "<all>")].iloc[0]
        assert grand.n_docs == cells.n_docs.sum()
        assert grand.n_tokens == cells.n_tokens.sum()
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        assert grand.n_docs == len(docs)

    def test_entropy_bounds(self, spark):
        ds = QUERIES["source_lang_datasheet"](spark, SF).toPandas()
        for r in ds.itertuples(index=False):
            assert r.n_tokens >= r.vocab >= 1
            # 0 <= H <= ln(vocab), up to micro-nat quantization slack
            assert -2 <= r.entropy_micro
            assert r.entropy_micro <= round(math.log(r.vocab) * 1e6) + 2
