"""Wave 18: naive-Bayes source classifier, random-projection (JL)
recall, near-dup pair alignment spans."""

from __future__ import annotations

import hashlib
import itertools
import math
from collections import Counter, defaultdict

from defi_etl_platform_sqlglot_implementation__spark import registry_llm18  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _half_away(v):
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def _split_of(doc_id):
    h = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
    return "val" if h in "cd" else "test" if h in "ef" else "train"


def _toks(text):
    return [x for x in text.split(" ") if x]   # _NTOK convention


class TestNbSourceClassifier:
    def test_pure_python_replay(self, spark):
        """Full replay from the raw corpus: md5 split, Laplace micro-nat
        token log-likelihoods, integer argmax with class-name
        tie-break — the whole confusion matrix must match."""
        rows = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "source", "text").collect()
        cst, ns, dtr = Counter(), Counter(), Counter()
        vocab = set()
        held = []
        for r in rows:
            tk = _toks(r.text)
            if _split_of(r.doc_id) == "train":
                dtr[r.source] += 1
                vocab.update(tk)
                for x in tk:
                    cst[(r.source, x)] += 1
                    ns[r.source] += 1
            else:
                held.append((r.source, tk))
        v, n_train = len(vocab), sum(dtr.values())
        classes = sorted(dtr)
        pri = {s: _half_away(math.log(dtr[s] / n_train) * 1e6)
               for s in classes}
        conf = Counter()
        for true_source, tk in held:
            counts = Counter(tk)
            best = None
            for s in classes:
                score = pri[s] + sum(
                    c * _half_away(
                        math.log((cst.get((s, x), 0) + 1) / (ns[s] + v))
                        * 1e6)
                    for x, c in counts.items())
                if best is None or score > best[0]:
                    best = (score, s)
                # ties break toward the smaller class name — score DESC,
                # cls ASC in the gate's window
            conf[(true_source, best[1])] += 1
        got = {(r.true_source, r.predicted_source): r.n_docs
               for r in QUERIES["nb_source_classifier"](spark, SF).collect()}
        assert got == dict(conf)

    def test_confusion_rows_cover_every_heldout_doc(self, spark):
        rows = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "source").collect()
        per_src = Counter(r.source for r in rows
                          if _split_of(r.doc_id) != "train")
        got = QUERIES["nb_source_classifier"](spark, SF).collect()
        by_true = defaultdict(int)
        for r in got:
            assert r.n_docs > 0
            by_true[r.true_source] += r.n_docs
        assert dict(by_true) == dict(per_src)


class TestRandomProjectionRecall:
    def test_pure_python_replay(self, spark):
        """Replay the projection (sequential left-assoc float fold —
        Python float ops are the same IEEE doubles), the projected
        brute-force top-10, and the exact-cosine truth; n_hits and the
        integer recall must match row-for-row."""
        from defi_etl_platform_sqlglot_implementation__spark.operators.similarity import (
            rademacher_planes,
        )

        planes = rademacher_planes(1, 16, 64, tag="rp18")[0]
        rows = spark.read.parquet(f"{SF}/embeddings.parquet").select(
            "vec_id", "embedding").collect()
        vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}

        def fold(xs, ys):
            acc = 0.0
            for x, y in zip(xs, ys):
                acc = acc + x * y
            return acc

        proj = {i: [fold(v, p) for p in planes] for i, v in vecs.items()}
        pnorm = {i: math.sqrt(fold(p, p)) for i, p in proj.items()}
        assert all(n > 0 for n in pnorm.values())   # no degenerate rows
        enorm = {i: math.sqrt(fold(v, v)) for i, v in vecs.items()}

        expected = {}
        for q in range(5):
            ptop = sorted(
                ((-(fold(proj[q], proj[i]) / (pnorm[q] * pnorm[i])), i)
                 for i in vecs if i != q))[:10]
            truth = sorted(
                ((-(fold(vecs[q], vecs[i]) / (enorm[q] * enorm[i])), i)
                 for i in vecs if i != q))[:10]
            hits = {i for _, i in ptop} & {i for _, i in truth}
            expected[q] = len(hits)
        got = {r.query_id: (r.n_hits, r.recall_bp)
               for r in QUERIES["random_projection_recall"](spark, SF)
               .collect()}
        assert got == {q: (h, h * 1000) for q, h in expected.items()}

    def test_recall_is_integer_consistent(self, spark):
        rows = QUERIES["random_projection_recall"](spark, SF).collect()
        assert sorted(r.query_id for r in rows) == [0, 1, 2, 3, 4]
        for r in rows:
            assert 0 <= r.n_hits <= 10
            assert r.recall_bp == r.n_hits * 1000


class TestPairAlignmentSpans:
    @staticmethod
    def _positional(text, n=3):
        toks = text.split(" ")
        return [(i + 1, " ".join(toks[i:i + n]))
                for i in range(max(1, len(toks) - n + 1))]

    def test_pure_python_replay(self, spark):
        docs = {r.doc_id: r.text
                for r in spark.read.parquet(f"{SF}/documents.parquet")
                .select("doc_id", "text").collect()}
        sh = {d: {s for _, s in self._positional(t)} for d, t in docs.items()}
        pairs = []
        for d1, d2 in itertools.combinations(sorted(docs), 2):
            inter = len(sh[d1] & sh[d2])
            if inter and inter / (len(sh[d1]) + len(sh[d2]) - inter) >= 0.5:
                pairs.append((d1, d2))
        expected = {}
        for d1, d2 in pairs:
            pos2 = defaultdict(list)
            for p, s in self._positional(docs[d2]):
                pos2[s].append(p)
            matches = [(p1, p2) for p1, s in self._positional(docs[d1])
                       for p2 in pos2.get(s, ())]
            diags = defaultdict(list)
            for p1, p2 in matches:
                diags[p1 - p2].append(p1)
            longest = 0
            for ps in diags.values():
                ps.sort()
                run = best = 1
                for a, b in zip(ps, ps[1:]):
                    run = run + 1 if b == a + 1 else 1
                    best = max(best, run)
                longest = max(longest, best)
            expected[(d1, d2)] = (len(matches), len(diags), longest + 2)
        got = {(r.d1, r.d2): (r.n_matches, r.n_diagonals,
                              r.longest_run_tokens)
               for r in QUERIES["pair_alignment_spans"](spark, SF)
               .collect()}
        assert got == expected

    def test_every_pair_has_alignment_evidence(self, spark):
        rows = QUERIES["pair_alignment_spans"](spark, SF).collect()
        assert rows                      # the corpus has near-dup pairs
        for r in rows:
            # any shared shingle IS a 3-token aligned run
            assert r.n_matches >= 1 and r.n_diagonals >= 1
            assert r.longest_run_tokens >= 3
            assert r.n_diagonals <= r.n_matches
