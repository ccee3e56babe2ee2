"""Property tests for the wave-3 curation ops (registry_llm3): repetition
profile bounds, PII scrub accounting, BM25 monotonicity, posting caps.
The cross-engine value evidence lives in the oracle gates; these pin the
operator-level invariants a hash can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark import registry_llm3 as m

SF = "/root/testdata/sf0.001"


def test_repetition_fractions_bounded(spark):
    rows = m.doc_repetition_profile(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.dup_token_frac < 1.0
        # the top unigram covers at least its fair share and at most all
        assert 1.0 / r.n_tokens <= r.top_unigram_frac <= 1.0
        assert 0.0 <= r.top_bigram_frac <= 1.0


def test_pii_scrub_counts_and_redaction(spark):
    rows = m.pii_scrub(spark, SF).collect()
    assert rows
    for r in rows:
        expected_emails = 2 if r.doc_id % 3 == 0 else 1
        assert r.n_emails == expected_emails, r
        assert r.n_phones == 1
        assert "@" not in r.scrubbed
        assert "555-" not in r.scrubbed
        assert r.scrubbed.count("<EMAIL>") == expected_emails
        assert r.scrubbed.count("<PHONE>") == 1


def test_bm25_more_hits_scores_present(spark):
    df = m.bm25_search(spark, SF)
    rows = df.collect()
    assert rows
    assert all(r.bm25_micro > 0 for r in rows)
    assert all(1 <= r.n_terms_hit <= len(m._BM25_TERMS) for r in rows)
    # every doc containing a query term (and only those) is scored
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    hit = docs.filter(
        F.arrays_overlap(
            F.split("text", " "),
            F.array(*[F.lit(x) for x in m._BM25_TERMS]),
        )
    ).count()
    assert len(rows) == hit


def test_weighted_sample_shape_and_bias(spark):
    rows = m.weighted_sample_topk(spark, SF).collect()
    assert rows
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
        assert 0.0 < r.es_key <= 1.0
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    n_per_source = {}
    for d in docs:
        n_per_source[d.source] = n_per_source.get(d.source, 0) + 1
    for src, rs in by_source.items():
        assert len(rs) == min(m._WSAMPLE_K, n_per_source[src])
        assert sorted(r.rk for r in rs) == list(range(1, len(rs) + 1))
    # weight bias: the sampled docs should skew heavier than the corpus
    # average (Efraimidis-Spirakis favors large w); deterministic check
    mean_corpus = sum(d.n_chars for d in docs) / len(docs)
    mean_sample = sum(r.weight for r in rows) / len(rows)
    assert mean_sample > mean_corpus


def test_inverted_index_postings_sorted_capped(spark):
    rows = m.inverted_index_postings(spark, SF).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r.postings_head.split(",")]
        assert ids == sorted(ids)
        assert len(ids) == min(r.df, m._POSTINGS_CAP)
        assert len(set(ids)) == len(ids)


def test_probed_blocking_dominates_hard_assignment(spark):
    """nprobe=2 soft assignment must find a SUPERSET of the hard-assigned
    pairs (every hard co-membership is also a probe co-membership), and
    its measured recall must be at least the hard recall."""
    from defi_etl_platform_sqlglot_implementation__spark.registry_llm3 import (
        semdedup_pairs_probed,
        semdedup_pairs_trained,
        semdedup_recall_probed,
        semdedup_recall_trained,
    )

    sf = "/root/testdata/sf0.001"
    hard = {(r.d1, r.d2) for r in semdedup_pairs_trained(spark, sf).collect()}
    probed = {(r.d1, r.d2) for r in semdedup_pairs_probed(spark, sf).collect()}
    assert hard <= probed
    rp = semdedup_recall_probed(spark, sf).collect()[0]
    rt = semdedup_recall_trained(spark, sf).collect()[0]
    assert rp.n_true == rt.n_true
    assert rp.recall_bp_probed >= rt.recall_bp_trained
    # the blocking must actually PRUNE: strictly fewer candidates than
    # all-pairs (a regression to full fan-out fails here), and every
    # found pair was a candidate
    assert rp.n_candidates < (500 * 499) // 2
    assert rp.n_candidates >= rp.n_found_probed


def test_locmin_label_propagation_matches_union_find():
    """Fuzz the oracle's connected-components device (the
    dedup_embedding_canonical SQL): min-label propagation seeded only
    from LOCAL minima (nodes smaller than every neighbor), with the
    lab < node pruning guard, must equal union-find components on
    adversarial random graphs — including decreasing chains and
    alternating id arrangements where local minima are plentiful."""
    import random

    import duckdb

    rng = random.Random(7)
    for trial in range(20):
        n = rng.randrange(2, 40)
        m_edges = rng.randrange(1, min(60, n * (n - 1) // 2 + 1))
        edges = set()
        while len(edges) < m_edges:
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        # adversarial extras: a decreasing chain and an alternating path
        if trial % 3 == 0 and n >= 6:
            edges |= {(n - i - 2, n - i - 1) for i in range(4)}
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        expect = {}
        roots = {}
        for v in sorted({x for e in edges for x in e}):
            r = find(v)
            roots.setdefault(r, v)       # min id first in sorted order
            expect[v] = roots[r]

        vals = ", ".join(f"({a}, {b})" for a, b in sorted(edges))
        got = dict(duckdb.sql(f"""
            WITH RECURSIVE e(d1, d2) AS (VALUES {vals}),
            sym AS (SELECT d1 AS a, d2 AS b FROM e
                    UNION SELECT d2, d1 FROM e),
            locmin AS (SELECT a FROM sym GROUP BY a HAVING MIN(b) > a),
            down(node, lab) AS (
                SELECT a, a FROM locmin
                UNION
                SELECT s.b, d.lab FROM down d JOIN sym s
                  ON s.a = d.node AND d.lab < s.b
            )
            SELECT node, MIN(lab) FROM down GROUP BY node
        """).fetchall())
        assert got == expect, f"trial {trial}: {sorted(edges)}"
