"""Property tests for the wave-11 sampling gates (registry_llm11):
pure-Python reconstruction of the temperature sampling plan (sqrt fold
in source order, round-half-up basis points, epoch split) and of the
salted-md5 keep decision, plus the invariants that make the sample
defensible — determinism across partitionings, plan/sample agreement,
and the up-source keep-everything rule.  Cross-engine value evidence
lives in the DuckDB oracles."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from defi_etl_platform_sqlglot_implementation__spark import registry_llm11 as m

SF = "/root/testdata/sf0.001"


def _py_plan(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "source", "text").collect()
    toks = defaultdict(int)
    ndocs = defaultdict(int)
    for r in docs:
        toks[r.source] += len([t for t in r.text.split(" ") if t])
        ndocs[r.source] += 1
    tot = sum(toks.values())
    sq_tot = 0.0
    for s in sorted(toks):                       # the source-ordered fold
        sq_tot += math.sqrt(float(toks[s]))
    plan = {}
    for s, n in toks.items():
        ratio = ((math.sqrt(float(n)) / sq_tot) * float(tot)) / float(n)
        # round-half-up on the exact binary double, like both engines
        ratio_bp = int(math.floor(1.0e4 * ratio + 0.5))
        plan[s] = (ndocs[s], n, ratio_bp)
    return plan


def test_sampling_plan_reconstructs(spark):
    got = {r.source: r for r in m.source_sampling_plan(spark, SF).collect()}
    plan = _py_plan(spark)
    assert set(got) == set(plan)
    for s, (nd, nt, ratio_bp) in plan.items():
        r = got[s]
        assert (r.n_docs, r.n_tokens, r.ratio_bp) == (nd, nt, ratio_bp), s
        assert r.keep_rate_bp == min(10000, ratio_bp)
        assert r.full_epochs == ratio_bp // 10000
        assert r.partial_epoch_bp == (
            ratio_bp % 10000 if ratio_bp >= 10000 else ratio_bp)
        # the schedule decomposition is exact: full epochs + partial = ratio
        assert r.full_epochs * 10000 + r.partial_epoch_bp == ratio_bp


def test_downsample_reconstructs_and_is_deterministic(spark):
    plan = _py_plan(spark)
    got = {r.doc_id: r for r in
           m.deterministic_downsample(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source").collect()
    assert len(got) == len(docs)
    for d in docs:
        ratio_bp = plan[d.source][2]
        if ratio_bp >= 10000:
            want = 1
        else:
            h8 = hashlib.md5(f"samp:{d.doc_id}".encode()).hexdigest()[:8]
            thresh = format(ratio_bp * m._HASH_SPACE // 10000, "08x")
            want = 1 if h8 < thresh else 0
        assert got[d.doc_id].keep == want, d
    # determinism across INPUT partitionings: re-run the gate on a
    # physically repartitioned, row-shuffled copy of the corpus — a
    # partition-seeded draw (F.rand) would change; the hash draw cannot
    import shutil
    import tempfile
    tmp = tempfile.mkdtemp(prefix="samp_repart_")
    try:
        (spark.read.parquet(f"{SF}/documents.parquet")
         .repartition(7)
         .sortWithinPartitions("source")
         .write.mode("overwrite").parquet(f"{tmp}/documents.parquet"))
        out2 = {r.doc_id: r.keep for r in
                m.deterministic_downsample(spark, tmp).collect()}
        assert out2 == {k: v.keep for k, v in got.items()}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_downsample_agrees_with_plan(spark):
    """Per-source realized keep share lands near keep_rate_bp (the hash is
    uniform), and up-sampled sources keep EVERYTHING."""
    plan = {r.source: r for r in m.source_sampling_plan(spark, SF).collect()}
    kept = defaultdict(int)
    seen = defaultdict(int)
    for r in m.deterministic_downsample(spark, SF).collect():
        seen[r.source] += 1
        kept[r.source] += r.keep
    for s, p in plan.items():
        assert seen[s] == p.n_docs
        if p.ratio_bp >= 10000:
            assert kept[s] == seen[s], s        # up-source: keep all
        else:
            # binomial-ish tolerance over small n: 4 sigma + 1
            exp = seen[s] * p.keep_rate_bp / 1e4
            sd = math.sqrt(seen[s] * (p.keep_rate_bp / 1e4)
                           * (1 - p.keep_rate_bp / 1e4))
            assert abs(kept[s] - exp) <= 4 * sd + 1, (s, kept[s], exp)


def _half_away(v: float) -> int:
    # both engines round ties away from zero (Spark HALF_UP == away for
    # either sign; DuckDB round() is half-away) — floor(v+0.5) would be
    # wrong on negative ties (the test_llm10 device)
    import math
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def test_dsir_reconstructs(spark):
    """Pure-Python replay of both Laplace bigram LMs and the micro-nat
    ratio — and the identity that target docs' own mass pushes their
    ratio up on average (the selection property DSIR relies on)."""
    import math
    from collections import Counter

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text").collect()
    bg_all, bg_doc = [], {}
    vocab_b, vocab_t = set(), set()
    for r in docs:
        toks = [x for x in r.text.split(" ") if x]   # the _NTOK convention
        vocab_b.update(toks)
        if r.source == m._DSIR_TARGET:
            vocab_t.update(toks)
        pairs = list(zip(toks, toks[1:])) if len(toks) >= 2 else []
        bg_doc[r.doc_id] = pairs
        if pairs:
            bg_all.append((r.source, pairs))
    cab_b, ca_b, cab_t, ca_t = Counter(), Counter(), Counter(), Counter()
    for src, pairs in bg_all:
        for p in pairs:
            cab_b[p] += 1
            ca_b[p[0]] += 1
            if src == m._DSIR_TARGET:
                cab_t[p] += 1
                ca_t[p[0]] += 1
    vb, vt = len(vocab_b), len(vocab_t)

    def micro(n_ab, n_a, v):
        return _half_away(math.log((n_ab + 1) / (n_a + v)) * 1e6)

    got = {r.doc_id: r for r in
           m.dsir_importance_weights(spark, SF).collect()}
    # EVERY document appears, zero-bigram docs with the neutral score
    assert set(got) == set(bg_doc)
    for doc_id, pairs in bg_doc.items():
        lp_t = sum(micro(cab_t[p], ca_t[p[0]], vt) for p in pairs)
        lp_b = sum(micro(cab_b[p], ca_b[p[0]], vb) for p in pairs)
        r = got[doc_id]
        assert (r.n_bigrams, r.lp_target_micro, r.lp_base_micro) == (
            len(pairs), lp_t, lp_b), doc_id
        assert r.log_ratio_micro == lp_t - lp_b
    # selection property: target-source docs average a HIGHER ratio than
    # the rest (their n-grams are literally the target LM's mass)
    src_of = {r.doc_id: r.source for r in docs}
    tgt = [got[d].log_ratio_micro for d in got
           if src_of[d] == m._DSIR_TARGET]
    rest = [got[d].log_ratio_micro for d in got
            if src_of[d] != m._DSIR_TARGET]
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)
