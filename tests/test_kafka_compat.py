"""Executable Kafka-sink contract twin (S3): the reference producer's
publish path (kafka_producer.py:105-112 value/key, :224-225 topic routing,
:147 flush-per-loop at-least-once) driven end-to-end through a real
Structured Streaming query into an in-process broker — the same
fake-endpoint trick that made the RPC source (S1) executable."""

from __future__ import annotations

import json

import pytest

from defi_etl_platform_sqlglot_implementation__spark.sources.rpc import (
    TOPIC_BLOCKS,
    TOPIC_LOGS,
    TOPIC_TOKEN_TRANSFERS,
    TOPIC_TRANSACTIONS,
    block_to_events,
)
from defi_etl_platform_sqlglot_implementation__spark.streaming.kafka_compat import (
    InProcessBroker,
    kafka_records,
    kafka_sink_executable,
)
from defi_etl_platform_sqlglot_implementation__spark.streaming.pipeline import (
    stream_events,
)

from .test_rpc_ingestion import _chain


def _envelopes() -> list[str]:
    blocks, receipts = _chain()
    out: list[str] = []
    for num in sorted(blocks):
        out.extend(block_to_events(blocks[num], receipts, ingested_at=1.5))
    return out


def _run_stream(spark, tmp_path, msgs, broker, fail_once_at_batch=None,
                subdir="k0"):
    inp = tmp_path / subdir / "input"
    inp.mkdir(parents=True, exist_ok=True)
    (inp / "batch0.txt").write_text("\n".join(msgs))
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(str(inp))
        .selectExpr("CAST(value AS BINARY) AS value")
    )
    events = stream_events(raw)
    q = kafka_sink_executable(
        events, broker, str(tmp_path / subdir / "ckpt"),
        fail_once_at_batch=fail_once_at_batch,
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


class TestKafkaSinkContract:
    def test_topic_routing_and_keys(self, spark, tmp_path):
        msgs = _envelopes()
        broker = InProcessBroker()
        _run_stream(spark, tmp_path, msgs, broker)

        # every reference topic received its events
        assert broker.topics() == sorted(
            [TOPIC_BLOCKS, TOPIC_TRANSACTIONS, TOPIC_LOGS,
             TOPIC_TOKEN_TRANSFERS]
        )
        # block events keyed by block hash (kafka_producer.py:171)
        block_keys = {r.key for r in broker.fetch(TOPIC_BLOCKS)}
        assert block_keys == {"0x" + "01" * 32, "0x" + "02" * 32}
        # transaction events keyed by TX hash (kafka_producer.py:196) —
        # the _tx fixture hash is "0x" + "ab"*31 + block-number byte
        assert {r.key for r in broker.fetch(TOPIC_TRANSACTIONS)} == {
            "0x" + "ab" * 31 + "01", "0x" + "ab" * 31 + "02"}
        # everything else keyed by str(block_number) (default _publish key)
        assert {r.key for r in broker.fetch(TOPIC_LOGS)} == {"1"}
        assert {r.key for r in broker.fetch(TOPIC_TOKEN_TRANSFERS)} == {"1"}
        # the ERC-20 topic[0] test decided token_transfer vs log routing
        assert len(broker.fetch(TOPIC_TOKEN_TRANSFERS)) == 1
        assert len(broker.fetch(TOPIC_LOGS)) == 1

    def test_values_roundtrip_envelopes(self, spark, tmp_path):
        msgs = _envelopes()
        broker = InProcessBroker()
        _run_stream(spark, tmp_path, msgs, broker, subdir="k1")

        published = [
            json.loads(r.value)
            for topic in broker.topics()
            for r in broker.fetch(topic)
        ]
        assert len(published) == len(msgs)
        def norm(payload):
            # the payload-union envelope schema (schemas.PAYLOAD_UNION)
            # carries big-int fields as strings and nulls the other event
            # types' fields — compare on the normalized form
            return json.dumps(
                {k: str(v) if not isinstance(v, list) else v
                 for k, v in payload.items() if v is not None},
                sort_keys=True)

        originals = {(m["event_type"], m["block_number"], norm(m["payload"]))
                     for m in map(json.loads, msgs)}
        got = {(p["event_type"], p["block_number"], norm(p["payload"]))
               for p in published}
        assert got == originals

    def test_at_least_once_replay_after_crash(self, spark, tmp_path):
        msgs = _envelopes()
        broker = InProcessBroker()
        with pytest.raises(Exception):
            _run_stream(spark, tmp_path, msgs, broker,
                        fail_once_at_batch=0, subdir="k2")
        calls_after_crash = broker.produce_calls
        assert calls_after_crash == len(msgs)  # published, but not committed

        # restart from the SAME checkpoint: batch 0 must replay (duplicates
        # allowed — at-least-once), and nothing may be lost
        inp = tmp_path / "k2" / "input"
        raw = (
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", "1")
            .load(str(inp))
            .selectExpr("CAST(value AS BINARY) AS value")
        )
        q = kafka_sink_executable(
            stream_events(raw), broker, str(tmp_path / "k2" / "ckpt")
        ).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        assert broker.produce_calls == 2 * len(msgs)  # replay duplicated
        # a deduping consumer sees each message exactly once per topic
        total_distinct = sum(
            len(broker.distinct_messages(t)) for t in broker.topics()
        )
        assert total_distinct == len(msgs)


def test_kafka_records_matches_batch_projection(spark):
    """kafka_records is the shared projection: batch frame in, (topic,
    key, value) out, all JVM-side (no UDF in the plan)."""
    msgs = _envelopes()
    from defi_etl_platform_sqlglot_implementation__spark.sources.bronze import (
        parse_raw_events,
    )
    raw = spark.createDataFrame(
        [(m.encode(),) for m in msgs], "value binary"
    )
    rec = kafka_records(parse_raw_events(raw))
    assert rec.columns == ["topic", "key", "value"]
    plan = rec._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # pure column expressions
    rows = rec.collect()
    assert len(rows) == len(msgs)
    assert {r["topic"] for r in rows} == {
        TOPIC_BLOCKS, TOPIC_TRANSACTIONS, TOPIC_LOGS, TOPIC_TOKEN_TRANSFERS
    }


def test_kafka_records_tolerates_non_struct_payload(spark):
    """A frame whose payload column is a raw string (not yet parsed into
    the union struct) must route through the block_number key, not crash
    on .fieldNames() (review regression)."""
    from defi_etl_platform_sqlglot_implementation__spark.streaming.kafka_compat import (
        kafka_records,
    )

    df = spark.createDataFrame(
        [("block", 7, '{"raw": true}')],
        "event_type string, block_number long, payload string")
    rows = kafka_records(df).collect()
    assert rows[0].key == "7"
    assert rows[0].topic
