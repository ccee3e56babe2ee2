"""Wave 24: BPE vocabulary pruning curve."""

from __future__ import annotations

import math
from collections import Counter

from defi_etl_platform_sqlglot_implementation__spark import registry_llm5  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark import registry_llm24  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _half_away(v):
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def _train_and_encode(docs, n_merges):
    """Pure-Python BPE: train on the 80% partition, return ordered
    merges + an encoder for the first k of them."""
    freqs = Counter()
    for d, text in docs:
        if d % 5 != 0:
            for w in text.split(" "):
                if w:
                    freqs[w] += 1
    seqs = {w: list(w) + ["</w>"] for w in freqs}

    def merge(seq, a, b):
        out = []
        for x in seq:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        return out

    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, s in seqs.items():
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += freqs[w]
        if not pc:
            break
        (a, b), _n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        seqs = {w: merge(s, a, b) for w, s in seqs.items()}

    def encode(word, k):
        s = list(word) + ["</w>"]
        for a, b in merges[:k]:
            s = merge(s, a, b)
        return s

    return encode


class TestBpeVocabPruningCurve:
    def test_pure_python_replay(self, spark):
        docs = [(r.doc_id, r.text)
                for r in spark.read.parquet(f"{SF}/documents.parquet")
                .select("doc_id", "text").collect()]
        encode = _train_and_encode(docs, 6)
        words = Counter()
        for _, text in docs:                        # ALL docs are encoded
            for w in text.split(" "):
                if w:
                    words[w] += 1
        expected = {}
        for k in (2, 4, 6):
            n_words = sum(words.values())
            n_sub, vocab = 0, set()
            for w, n_occ in words.items():
                s = encode(w, k)
                n_sub += n_occ * len(s)
                vocab |= set(s)
            expected[k] = (n_words, n_sub,
                           _half_away(1e4 * n_sub / n_words), len(vocab))
        got = {r.n_merges: (r.n_words, r.n_subwords, r.fertility_bp,
                            r.vocab_size)
               for r in QUERIES["bpe_vocab_pruning_curve"](spark, SF)
               .collect()}
        assert got == expected

    def test_curve_shape_and_k6_consistency(self, spark):
        rows = {r.n_merges: r
                for r in QUERIES["bpe_vocab_pruning_curve"](spark, SF)
                .collect()}
        assert set(rows) == {2, 4, 6}
        # more merges never lengthen a segmentation
        assert rows[2].n_subwords >= rows[4].n_subwords >= rows[6].n_subwords
        assert rows[2].fertility_bp >= rows[6].fertility_bp
        # same word mass at every curve point
        assert len({r.n_words for r in rows.values()}) == 1
        # the k=6 point equals the green per-doc segmentation gate's total
        seg = QUERIES["bpe_encode_segments"](spark, SF).collect()
        assert rows[6].n_subwords == sum(r.n_subwords for r in seg)
        assert rows[6].n_words == sum(r.n_words for r in seg)
