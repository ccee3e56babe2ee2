"""Wave 22: n-gram novelty profile, embedding batch drift, streaming
near-dup ingest twin."""

from __future__ import annotations

import json
import math
import os
import time
from collections import defaultdict

import pandas as pd
from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark import registry_llm21  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark import registry_llm22  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _half_away(v):
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def _shingles(text):
    toks = text.split(" ")
    n = len(toks)
    return {" ".join(toks[i - 1:i + 2]) for i in range(1, max(1, n - 2) + 1)}


def _split(doc_id):
    import hashlib

    h = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
    return "val" if h in "cd" else "test" if h in "ef" else "train"


class TestNgramNoveltyProfile:
    def test_pure_python_replay(self, spark):
        docs = {r.doc_id: r.text
                for r in spark.read.parquet(f"{SF}/documents.parquet")
                .select("doc_id", "text").collect()}
        train_sh = set()
        for d, t in docs.items():
            if _split(d) == "train":
                train_sh |= _shingles(t)
        expected = {}
        for d, t in docs.items():
            sp = _split(d)
            if sp == "train":
                continue
            sh = _shingles(t)
            novel = sum(1 for s in sh if s not in train_sh)
            expected[d] = (sp, len(sh), novel,
                           _half_away(1e4 * novel / len(sh)))
        got = {r.doc_id: (r.split, r.n_shingles, r.n_novel, r.novelty_bp)
               for r in QUERIES["ngram_novelty_profile"](spark, SF)
               .collect()}
        assert got == expected
        assert got                                  # held-out split non-empty

    def test_signal_is_informative(self, spark):
        rows = QUERIES["ngram_novelty_profile"](spark, SF).collect()
        for r in rows:
            assert 0 <= r.n_novel <= r.n_shingles
            assert 0 <= r.novelty_bp <= 10000
        # a small-vocab synthetic corpus reuses train n-grams heavily AND
        # still contains novel ones — both regimes must be visible
        assert any(r.n_novel < r.n_shingles for r in rows)
        assert any(r.n_novel > 0 for r in rows)


class TestEmbeddingBatchDrift:
    N_EB, TAU = 4, 10000

    def test_pure_python_replay(self, spark):
        vecs = {r.vec_id: r.embedding
                for r in spark.read.parquet(f"{SF}/embeddings.parquet")
                .select("vec_id", "embedding").collect()}
        n = len(vecs)
        # rank-based batching (VERDICT r8 #3): batch from the id-order
        # ordinal, not the id VALUE — stays dense on sparse id domains
        rank = {vid: i + 1 for i, vid in enumerate(sorted(vecs))}
        st = defaultdict(lambda: [0, 0])            # (batch, dim) -> [n, s]
        for vid, emb in vecs.items():
            b = (rank[vid] - 1) * self.N_EB // n
            for dim, x in enumerate(emb):
                q = _half_away(float(x) * 1e6)
                st[(b, dim)][0] += 1
                st[(b, dim)][1] += q
        expected = {}
        for (b, dim), (nc, sc) in st.items():
            if (b - 1, dim) not in st:
                continue
            np_, sp_ = st[(b - 1, dim)]
            drift = 1 if abs(sc * np_ - sp_ * nc) > self.TAU * nc * np_ else 0
            expected[(b, dim)] = (nc, sc, np_, sp_, drift)
        got = {(r.batch, r.dim): (r.n_cur, r.sum_cur_micro,
                                  r.n_prev, r.sum_prev_micro, r.drifted)
               for r in QUERIES["embedding_batch_drift"](spark, SF)
               .collect()}
        assert got == expected
        assert len(got) == (self.N_EB - 1) * 64     # one row per (batch, dim)

    def test_flag_is_integer_consistent(self, spark):
        for r in QUERIES["embedding_batch_drift"](spark, SF).collect():
            lhs = abs(r.sum_cur_micro * r.n_prev - r.sum_prev_micro * r.n_cur)
            assert r.drifted == (1 if lhs > self.TAU * r.n_cur * r.n_prev
                                 else 0)

    def test_sparse_id_domain_not_silent(self, spark, tmp_path):
        """VERDICT r8 #3 regression: on a sparse/sharded vec_id domain
        (the sf1 key-shift class) the old value-quartile spine produced
        an EMPTY monitor; the rank-based spine must yield all
        (N_EB-1) x dims consecutive-batch rows regardless of id gaps."""
        rows = [(vid, [float(vid % 7) / 10.0] * 4)
                for vid in (5, 900, 41_000, 41_003, 2_000_000,
                            2_000_001, 90_000_000, 123_456_789)]
        (spark.createDataFrame(rows, "vec_id long, embedding array<float>")
         .write.parquet(str(tmp_path / "embeddings.parquet")))
        got = QUERIES["embedding_batch_drift"](
            spark, str(tmp_path)).collect()
        assert len(got) == (self.N_EB - 1) * 4
        # per-batch counts follow the rank spine: 8 ids -> 2 per batch
        assert {(r.batch, r.n_cur, r.n_prev) for r in got} \
            == {(b, 2, 2) for b in (1, 2, 3)}


class TestStreamingNearDupIngest:
    """The streaming twin must replay the oracled batch gate verdict-
    for-verdict over the llm14 spine (8 doc-id-monotone batches)."""

    def _batch_gate(self, spark):
        return {r.doc_id: (r.first_dup_of, r.n_earlier_dups,
                           r.is_dup_on_arrival)
                for r in QUERIES["dedup_minhash_incremental"](spark, SF)
                .collect()}

    def test_driver_loop_parity_over_spine(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.streaming.near_dup import (
            NearDupIndex,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet") \
            .select("doc_id", "text")
        n = docs.count()
        idx = NearDupIndex(threshold=0.5)
        got = {}
        for b in range(8):
            batch = docs.filter(F.expr(f"(doc_id * 8) div {n}") == b)
            for r in idx.update(batch).collect():
                got[r.doc_id] = (r.first_dup_of, r.n_earlier_dups,
                                 r.is_dup_on_arrival)
        assert got == self._batch_gate(spark)

    def test_single_batch_equals_gate(self, spark):
        """Whole corpus in ONE batch: the intra-batch ordered self-join
        alone must reproduce the gate (pins the restated banding against
        minhash_lsh_pairs — any drift breaks this equality)."""
        from defi_etl_platform_sqlglot_implementation__spark.streaming.near_dup import (
            NearDupIndex,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet") \
            .select("doc_id", "text")
        got = {r.doc_id: (r.first_dup_of, r.n_earlier_dups,
                          r.is_dup_on_arrival)
               for r in NearDupIndex(threshold=0.5).update(docs).collect()}
        assert got == self._batch_gate(spark)

    def test_real_stream_foreachbatch_parity(self, spark, tmp_path):
        from defi_etl_platform_sqlglot_implementation__spark.streaming.near_dup import (
            NearDupIndex,
            near_dup_ingest_stream,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet") \
            .select("doc_id", "text")
        rows = docs.collect()
        n = len(rows)
        src = tmp_path / "doc_stream"
        src.mkdir()
        t0 = time.time()
        for b in range(8):
            chunk = [r for r in rows if r.doc_id * 8 // n == b]
            f = src / f"part{b}.json"
            f.write_text("\n".join(
                json.dumps({"doc_id": r.doc_id, "text": r.text})
                for r in chunk))
            # the file source orders micro-batches by modification time;
            # same-ms writes tie and can arrive out of order — pin the
            # spine order explicitly (caught live by a verify drive)
            os.utime(f, (t0 - 80 + 10 * b, t0 - 80 + 10 * b))

        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", 1).json(str(src)))
        sink: list = []
        q = (near_dup_ingest_stream(stream, NearDupIndex(threshold=0.5),
                                    sink)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        pdf = pd.concat(sink, ignore_index=True)
        assert len(pdf) == n                        # every doc got a verdict
        got = {int(r.doc_id): (None if pd.isna(r.first_dup_of)
                               else int(r.first_dup_of),
                               int(r.n_earlier_dups),
                               bool(r.is_dup_on_arrival))
               for r in pdf.itertuples()}
        assert got == self._batch_gate(spark)
