"""Wave 42: maximal-repeat inventory + span-clipping dividend."""

from __future__ import annotations

import hashlib

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm3  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark import registry_llm41  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _doc_spans(docs: pd.DataFrame, k: int = 8):
    """Pure-Python replay of the duplicated-shingle -> maximal-span
    chain (the substring_dup_spans semantics): returns
    {doc_id: [(start, end), ...]} with 1-based inclusive token
    positions."""
    toks = {int(r.doc_id): r.text.split(" ") for r in
            docs.itertuples(index=False)}
    owners: dict[str, set[int]] = {}
    positions: dict[int, list[int]] = {}
    for d, l in toks.items():
        for i in range(len(l) - k + 1):
            s = " ".join(l[i:i + k])
            owners.setdefault(s, set()).add(d)
    for d, l in toks.items():
        hit = [i + 1 for i in range(len(l) - k + 1)
               if len(owners[" ".join(l[i:i + k])]) > 1]
        if hit:
            positions[d] = hit
    spans = {}
    for d, hs in positions.items():
        out = []
        start = prev = hs[0]
        for p in hs[1:]:
            if p == prev + 1:
                prev = p
            else:
                out.append((start, prev + k - 1))
                start = prev = p
        out.append((start, prev + k - 1))
        spans[d] = out
    return toks, spans


class TestMaximalRepeatInventory:
    def test_exact_replay(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        toks, spans = _doc_spans(docs)
        classes: dict[str, list[tuple[int, int]]] = {}
        for d, sp in spans.items():
            for s, e in sp:
                text = " ".join(toks[d][s - 1:e])
                h = hashlib.md5(text.encode()).hexdigest()
                classes.setdefault(h, []).append((d, e - s + 1))
        exp = {
            h: (max(ln for _, ln in occ),
                len({d for d, _ in occ}),
                len(occ),
                min(d for d, _ in occ),
                1 if len({d for d, _ in occ}) > 1 else 0)
            for h, occ in classes.items()
        }
        got = {r.span_md5: (r.span_tokens, r.n_docs, r.n_occurrences,
                            r.min_doc_id, r.shared)
               for r in QUERIES["maximal_repeat_inventory"](spark, SF)
               .collect()}
        assert got == exp
        # the corpus exercises BOTH class kinds: shared repeat classes
        # (the suffix-array LCP intervals) and ragged singletons
        flags = {v[4] for v in got.values()}
        assert flags == {0, 1}

    def test_classes_partition_the_span_inventory(self, spark):
        """Cross-gate pin: every (doc, span) substring_dup_spans emits
        lands in exactly one repeat class — Σ n_occurrences == span
        count, and span length multisets agree."""
        spans = QUERIES["substring_dup_spans"](spark, SF).collect()
        inv = QUERIES["maximal_repeat_inventory"](spark, SF).collect()
        assert sum(r.n_occurrences for r in inv) == len(spans)
        # shared classes cannot out-length the longest span
        assert max(r.span_tokens for r in inv) \
            == max(r.span_tokens for r in spans)


class TestSpanDedupTokenSavings:
    def test_conservation_vs_clip_gate(self, spark):
        """Σ tokens_removed over sources == Σ (before − after) of
        curation_clip_spans — the clip surgery and its price agree
        token-for-token (same coverage device)."""
        sav = QUERIES["span_dedup_token_savings"](spark, SF).toPandas()
        clip = QUERIES["curation_clip_spans"](spark, SF).toPandas()
        assert int(sav.tokens_removed.sum()) \
            == int((clip.n_tokens_before - clip.n_tokens_after).sum())
        assert int(sav.docs_affected.sum()) \
            == int((clip.n_tokens_after < clip.n_tokens_before).sum())

    def test_source_partition_and_bp(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        sav = QUERIES["span_dedup_token_savings"](spark, SF).toPandas()
        assert int(sav.n_docs.sum()) == len(docs)
        assert set(sav.source) == set(docs.source)
        for r in sav.itertuples(index=False):
            assert 0 <= r.tokens_removed <= r.tokens_total
            assert r.savings_bp == round(
                1e4 * r.tokens_removed / r.tokens_total)
