"""Wave 30: IVF nprobe recall curve, distinct-n diversity, streaming
debounce twin."""

from __future__ import annotations

import json
import math
import os
import time
from collections import defaultdict

import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm28  # noqa: F401 — fills QUERIES (event_debounce twin)
from defi_etl_platform_sqlglot_implementation__spark import registry_llm30  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _half_away(v):
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


class TestIvfNprobeRecallCurve:
    def test_monotone_and_bounded_and_pins_fixed_gate(self, spark):
        rows = QUERIES["ivf_nprobe_recall_curve"](spark, SF).collect()
        assert len(rows) == 15                      # 5 queries x 3 points
        by_q = defaultdict(dict)
        for r in rows:
            assert 0 <= r.hits <= r.k == 10
            by_q[r.query_id][r.nprobe] = r.hits
        for qid, curve in by_q.items():
            assert sorted(curve) == [1, 2, 4]
            # candidate sets nest -> recall is monotone in nprobe
            assert curve[1] <= curve[2] <= curve[4], f"query {qid}"
        # the nprobe=4 point IS similarity_ann_recall_trained, by
        # construction — pinned so the two gates can never drift
        fixed = {r.query_id: r.hits
                 for r in QUERIES["similarity_ann_recall_trained"](
                     spark, SF).collect()}
        assert {q: c[4] for q, c in by_q.items()} == fixed


class TestDistinctNgramDiversity:
    def test_full_replay(self, spark):
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        want = {}
        for n in (1, 2, 3):
            total = defaultdict(int)
            distinct = defaultdict(set)
            for r in docs.itertuples(index=False):
                toks = [x for x in r.text.split(" ") if x != ""]
                for i in range(len(toks) - n + 1):
                    g = " ".join(toks[i:i + n])
                    total[r.source] += 1
                    distinct[r.source].add(g)
            for src in total:
                t, d = total[src], len(distinct[src])
                want[(src, n)] = (t, d, _half_away(1e4 * d / t))
        got = {(r.source, r.n): (r.total_ngrams, r.distinct_ngrams,
                                 r.distinct_bp)
               for r in QUERIES["distinct_ngram_diversity"](spark, SF)
               .collect()}
        assert got == want

    def test_diversity_decreases_with_n_in_counts(self, spark):
        rows = QUERIES["distinct_ngram_diversity"](spark, SF).collect()
        by_src = defaultdict(dict)
        for r in rows:
            assert r.distinct_ngrams <= r.total_ngrams
            by_src[r.source][r.n] = r
        for src, d in by_src.items():
            assert sorted(d) == [1, 2, 3]
            # longer n-grams are rarer each: distinct share rises with n
            # on natural-ish text, while totals shrink by (n-1) per doc
            assert d[1].total_ngrams >= d[2].total_ngrams \
                >= d[3].total_ngrams


class TestStreamingDebounce:
    """The streaming twin's kept rows must equal the DuckDB-oracled
    event_debounce gate's kept set over a ts-monotone spine."""

    @staticmethod
    def _gate_kept(spark):
        return {r.event_id: (r.user_id, r.event_type, r.ts)
                for r in QUERIES["event_debounce"](spark, SF).collect()}

    @staticmethod
    def _sorted_rows(spark):
        rows = spark.read.parquet(f"{SF}/events.parquet") \
            .select("user_id", "event_type", "event_id", "ts").collect()
        rows.sort(key=lambda r: (r.ts, r.event_id))
        return rows

    def test_eight_batch_replay_parity(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.streaming.debounce import (
            DebounceState,
        )

        rows = self._sorted_rows(spark)
        n = len(rows)
        state = DebounceState()
        got = {}
        for b in range(8):
            chunk = rows[b * n // 8:(b + 1) * n // 8]
            batch = spark.createDataFrame(
                [(r.user_id, r.event_type, r.event_id, r.ts)
                 for r in chunk],
                "user_id long, event_type string, event_id long, "
                "ts timestamp")
            for r in state.update(batch).collect():
                got[r.event_id] = (r.user_id, r.event_type, r.ts)
        assert got == self._gate_kept(spark)

    def test_single_batch_equals_gate(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.streaming.debounce import (
            DebounceState,
        )

        events = spark.read.parquet(f"{SF}/events.parquet")
        kept = DebounceState().update(events).collect()
        assert {r.event_id: (r.user_id, r.event_type, r.ts)
                for r in kept} == self._gate_kept(spark)

    def test_real_stream_foreachbatch_parity(self, spark, tmp_path):
        from defi_etl_platform_sqlglot_implementation__spark.streaming.debounce import (
            DebounceState,
            debounce_ingest_stream,
        )
        from pyspark.sql import functions as F

        rows = self._sorted_rows(spark)
        n = len(rows)
        src = tmp_path / "event_stream"
        src.mkdir()
        t0 = time.time()
        for b in range(8):
            chunk = rows[b * n // 8:(b + 1) * n // 8]
            f = src / f"part{b}.json"
            f.write_text("\n".join(
                json.dumps({"user_id": r.user_id,
                            "event_type": r.event_type,
                            "event_id": r.event_id,
                            "ts_us": int(r.ts.timestamp() * 1_000_000)})
                for r in chunk))
            # pin the spine order (file source orders by mtime)
            os.utime(f, (t0 - 80 + 10 * b, t0 - 80 + 10 * b))

        stream = (
            spark.readStream
            .schema("user_id long, event_type string, event_id long, "
                    "ts_us long")
            .option("maxFilesPerTrigger", 1).json(str(src))
            .select("user_id", "event_type", "event_id",
                    F.timestamp_micros("ts_us").alias("ts")))
        sink: list = []
        q = (debounce_ingest_stream(stream, DebounceState(), sink)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        pdf = pd.concat(sink, ignore_index=True)
        got = {int(r.event_id): (int(r.user_id), r.event_type,
                                 r.ts.to_pydatetime())
               for r in pdf.itertuples(index=False)}
        assert got == self._gate_kept(spark)

    def test_seed_crosses_batch_boundary(self, spark):
        """Events at 0s/30s in batch 1 and 70s in batch 2 (60s window):
        batch 2 must debounce against batch 1's kept state — keeping
        {0, 70}, exactly what the one-shot greedy keeps."""
        import datetime as dt

        from defi_etl_platform_sqlglot_implementation__spark.streaming.debounce import (
            DebounceState,
        )

        t0 = dt.datetime(2024, 1, 1)
        schema = ("user_id long, event_type string, event_id long, "
                  "ts timestamp")
        state = DebounceState(window_s=60)
        b1 = spark.createDataFrame(
            [(1, "click", 10, t0),
             (1, "click", 11, t0 + dt.timedelta(seconds=30))], schema)
        b2 = spark.createDataFrame(
            [(1, "click", 12, t0 + dt.timedelta(seconds=70))], schema)
        kept1 = [r.event_id for r in state.update(b1).collect()]
        kept2 = [r.event_id for r in state.update(b2).collect()]
        assert kept1 == [10] and kept2 == [12]
