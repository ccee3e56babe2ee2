"""Wave 27: CCNet perplexity buckets, source overlap matrix, length
histogram."""

from __future__ import annotations

import hashlib
import itertools
import math
from collections import Counter, defaultdict

from defi_etl_platform_sqlglot_implementation__spark import registry_llm27  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _half_away(v):
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def _toks(text):
    return [x for x in text.split(" ") if x]


def _split_of(doc_id):
    h = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
    return {"c": "val", "d": "val", "e": "test", "f": "test"}.get(h, "train")


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text", "lang", "source").collect()


class TestCcnetPerplexityBuckets:
    def test_replay_on_corpus(self, spark):
        rows = _docs(spark)
        # train the Laplace bigram LM on the md5 train split
        cab, ca, vocab = Counter(), Counter(), set()
        bg_by_doc = {}
        for r in rows:
            toks = _toks(r.text)
            split = _split_of(r.doc_id)
            bgs = list(zip(toks, toks[1:]))
            if bgs:
                bg_by_doc[r.doc_id] = (r.lang, bgs)
            if split == "train":
                vocab.update(toks)
                for p in bgs:
                    cab[p] += 1
                    ca[p[0]] += 1
        v = len(vocab)
        per_doc = {}
        for doc_id, (lang, bgs) in bg_by_doc.items():
            lp = sum(
                _half_away(math.log((cab.get(p, 0) + 1)
                                    / (ca.get(p[0], 0) + v)) * 1e6)
                for p in bgs)
            per_doc[doc_id] = (lang, len(bgs), lp)
        # ntile(3) per lang ordered by mean lp desc, doc_id asc
        by_lang = defaultdict(list)
        for doc_id, (lang, nb, lp) in per_doc.items():
            by_lang[lang].append((-(lp / nb), doc_id, nb, lp))
        want = Counter()
        agg = defaultdict(lambda: [0, 0])
        for lang, lst in by_lang.items():
            lst.sort()
            n, k = len(lst), 3
            q, rem = divmod(n, k)
            sizes = [q + (1 if i < rem else 0) for i in range(k)]
            idx = 0
            for b, size in enumerate(sizes, start=1):
                for _ in range(size):
                    _, _, nb, lp = lst[idx]
                    want[(lang, b)] += 1
                    agg[(lang, b)][0] += nb
                    agg[(lang, b)][1] += lp
                    idx += 1
        got = QUERIES["ccnet_perplexity_buckets"](spark, SF).collect()
        assert {(r.lang, r.bucket): (r.n_docs, r.n_bigrams, r.lp_micro_total)
                for r in got} == \
            {k: (want[k], agg[k][0], agg[k][1]) for k in want}

    def test_buckets_are_balanced_and_ordered(self, spark):
        got = QUERIES["ccnet_perplexity_buckets"](spark, SF).collect()
        by_lang = defaultdict(dict)
        for r in got:
            by_lang[r.lang][r.bucket] = r
        for lang, bl in by_lang.items():
            assert set(bl) == {1, 2, 3}
            sizes = [bl[b].n_docs for b in (1, 2, 3)]
            assert max(sizes) - min(sizes) <= 1          # ntile property
            # head has the highest (least negative) mean log-prob
            means = [bl[b].lp_micro_total / bl[b].n_bigrams for b in (1, 2, 3)]
            assert means[0] >= means[1] >= means[2]


class TestSourceOverlapMatrix:
    def test_replay_on_corpus(self, spark):
        rows = _docs(spark)
        src = {r.doc_id: r.source for r in rows}
        sh = {}
        for r in rows:
            toks = r.text.split(" ")
            n = len(toks)
            sh[r.doc_id] = {" ".join(toks[i - 1:i + 2])
                            for i in range(1, max(1, n - 2) + 1)}
        pairs = []
        for a, b in itertools.combinations(sorted(sh), 2):
            inter = len(sh[a] & sh[b])
            union = len(sh[a]) + len(sh[b]) - inter
            if union and inter / union >= 0.5:
                pairs.append((a, b))
        pc, docs_in = Counter(), defaultdict(set)
        for a, b in pairs:
            key = tuple(sorted((src[a], src[b])))
            pc[key] += 1
            docs_in[key].update((a, b))
        tot = len(pairs)
        got = QUERIES["source_overlap_matrix"](spark, SF).collect()
        assert {(r.src_a, r.src_b): (r.n_pairs, r.n_docs, r.pair_share_bp)
                for r in got} == \
            {k: (pc[k], len(docs_in[k]), _half_away(1e4 * pc[k] / tot))
             for k in pc}

    def test_matrix_is_upper_triangular_and_complete(self, spark):
        got = QUERIES["source_overlap_matrix"](spark, SF).collect()
        assert all(r.src_a <= r.src_b for r in got)
        # shares sum to ~1e4 (rounding drift < one bp per row)
        assert abs(sum(r.pair_share_bp for r in got) - 1e4) <= len(got)


class TestDocLengthHistogram:
    def test_replay_on_corpus(self, spark):
        rows = _docs(spark)
        want = defaultdict(lambda: [0, 0])
        for r in rows:
            n = len(_toks(r.text))
            bucket = -1 if n == 0 else n.bit_length() - 1
            want[(r.source, bucket)][0] += 1
            want[(r.source, bucket)][1] += n
        got = QUERIES["doc_length_histogram"](spark, SF).collect()
        assert {(r.source, r.bucket): (r.n_docs, r.total_tokens)
                for r in got} == \
            {k: tuple(v) for k, v in want.items()}
        for r in got:
            if r.bucket >= 0:
                assert r.lo_tokens == 2 ** r.bucket
                assert r.hi_tokens == 2 ** (r.bucket + 1) - 1
                # every doc in the bucket fits the bounds on average
                assert (r.lo_tokens * r.n_docs <= r.total_tokens
                        <= r.hi_tokens * r.n_docs)
            else:
                assert (r.lo_tokens, r.hi_tokens, r.total_tokens) == (0, 0, 0)

    def test_every_doc_counted_once(self, spark):
        rows = _docs(spark)
        got = QUERIES["doc_length_histogram"](spark, SF).collect()
        assert sum(r.n_docs for r in got) == len(rows)
