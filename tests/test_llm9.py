"""Property tests for the wave-9 curation-diagnostic gates
(registry_llm9): cluster-histogram corpus conservation + replay against
the composing dedup_clusters gate, temperature-weight reconstruction
(the exact left-assoc sqrt fold), Heaps-curve reconstruction and
monotonicity, and a pure-Python train→eval decontamination replay.
Cross-engine value evidence lives in the DuckDB oracles; these pin the
invariants a value hash can't express."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from defi_etl_platform_sqlglot_implementation__spark import registry_llm2 as llm2
from defi_etl_platform_sqlglot_implementation__spark import registry_llm9 as m

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text").collect()


def test_dup_cluster_histogram_conserves_and_matches_clusters(spark):
    hist = {r.cluster_size: r for r in
            m.dup_cluster_size_histogram(spark, SF).collect()}
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    # corpus conservation: every doc lands in exactly one cluster
    assert sum(r.docs_total for r in hist.values()) == n_docs
    for r in hist.values():
        assert r.docs_total == r.cluster_size * r.n_clusters
        assert r.docs_removed == (r.cluster_size - 1) * r.n_clusters
    # replay against the composing gate: dedup_clusters covers exactly the
    # docs in some near-dup pair; everything else is a size-1 singleton
    cc = llm2.dedup_clusters(spark, SF).collect()
    sizes = Counter()
    for row in cc:
        sizes[row.cluster_id] += 1
    expect = Counter(sizes.values())
    expect[1] += n_docs - len(cc)
    assert {k: r.n_clusters for k, r in hist.items()} == dict(expect)


def test_source_temperature_weights_reconstructs(spark):
    rows = {r.source: r for r in
            m.source_temperature_weights(spark, SF).collect()}
    toks = defaultdict(lambda: [0, 0])
    for r in _docs(spark):
        toks[r.source][0] += 1
        toks[r.source][1] += len([t for t in r.text.split(" ") if t])
    assert set(rows) == set(toks)
    tot = sum(v[1] for v in toks.values())
    # the same left-assoc source-ordered fold both engines run — Python
    # floats are IEEE doubles, so equality here is EXACT, not approx
    sq_tot = 0.0
    for s in sorted(toks):
        sq_tot += math.sqrt(float(toks[s][1]))
    for s, (n_docs, n_tokens) in toks.items():
        r = rows[s]
        assert (r.n_docs, r.n_tokens) == (n_docs, n_tokens)
        assert r.w_raw == n_tokens / tot
        assert r.w_temp == math.sqrt(float(n_tokens)) / sq_tot
    assert abs(sum(r.w_raw for r in rows.values()) - 1.0) < 1e-12
    assert abs(sum(r.w_temp for r in rows.values()) - 1.0) < 1e-12


def test_vocab_growth_curve_reconstructs(spark):
    rows = sorted(m.vocab_growth_curve(spark, SF).collect(),
                  key=lambda r: r.decile)
    docs = _docs(spark)
    n = max(r.doc_id for r in docs) + 1
    docs_in, tokens_in, new_in = Counter(), Counter(), Counter()
    first = {}
    for r in sorted(docs, key=lambda r: r.doc_id):
        d = r.doc_id * 10 // n + 1
        docs_in[d] += 1
        words = [t for t in r.text.split(" ") if t]
        tokens_in[d] += len(words)
        for wd in words:
            if wd not in first:
                first[wd] = d
    for d in first.values():
        new_in[d] += 1
    assert [r.decile for r in rows] == list(range(1, 11))
    cd = ct = cv = 0
    for r in rows:
        cd += docs_in[r.decile]
        ct += tokens_in[r.decile]
        cv += new_in[r.decile]
        assert (r.docs_seen, r.tokens_seen, r.vocab_size) == (cd, ct, cv)
    assert rows[-1].docs_seen == len(docs)
    assert rows[-1].vocab_size == len(first)
    # Heaps: the curve is non-decreasing and ends at the full vocabulary
    for a, b in zip(rows, rows[1:]):
        assert b.vocab_size >= a.vocab_size >= 0


def _py_split(doc_id: int) -> str:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
    return {"c": "val", "d": "val", "e": "test", "f": "test"}.get(h, "train")


def test_split_decontamination_reconstructs(spark):
    rows = {r.doc_id: r for r in
            m.split_decontamination_report(spark, SF).collect()}
    grams = {}
    for r in _docs(spark):
        toks = r.text.split(" ")
        n = max(1, len(toks) - 3)
        grams[r.doc_id] = {" ".join(toks[i:i + 4]) for i in range(n)}
    train = set()
    for doc_id, g in grams.items():
        if _py_split(doc_id) == "train":
            train |= g
    expect = {doc_id: g for doc_id, g in grams.items()
              if _py_split(doc_id) != "train"}
    assert set(rows) == set(expect)
    for doc_id, g in expect.items():
        r = rows[doc_id]
        assert r.split == _py_split(doc_id)
        assert r.n_shingles == len(g)
        assert r.n_matched == len(g & train)
        assert r.contamination == len(g & train) / len(g)
    # the audit includes clean rows — an all-contaminated report would
    # mean the split leaked wholesale, an all-zero one that the corpus
    # has no repeated 4-grams at all; both are fixture-breaking
    assert any(r.n_matched == 0 for r in rows.values()) or \
        all(len(g & train) > 0 for g in expect.values())
    assert any(r.n_matched > 0 for r in rows.values())
