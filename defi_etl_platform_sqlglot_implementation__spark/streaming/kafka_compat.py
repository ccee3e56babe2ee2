"""Executable Kafka-sink contract twin (SURVEY §2 S3).

The sandbox has no Kafka broker and no spark-sql-kafka connector JAR, so
``pipeline.kafka_sink`` (the production ``format("kafka")`` writeStream)
can only be plan-built here.  This module makes the reference producer's
*behavior* executable the same way ``sources/rpc.py`` made S1 executable
against a fake HTTP node: an in-process broker object plus a
``foreachBatch`` sink that performs the identical projection —

- value  = JSON of the full row       (kafka_producer.py:105-112
  ``event.to_json()``),
- key    = payload hash, else the block number as a string
  (kafka_producer.py:105 ``key or str(event.block_number)``),
- topic  = event-type routing blocks/transactions/logs/token_transfers
  (kafka_producer.py:224-225; same table as ``sources.rpc.route_topic``),
- delivery cadence = checkpointed micro-batches standing in for the
  ``flush()``-per-poll-loop (kafka_producer.py:147) — giving the same
  at-least-once contract: a crash between publish and checkpoint commit
  replays the whole batch; it can duplicate, it can never lose.

The broker records (topic, key, value, batch_id) so tests can assert
both the routing/keying contract and the replay-after-crash behavior.
``foreachBatch`` publishes via driver-side ``collect()`` — correct for a
contract test against an in-process Python object (an executor-side
``foreachPartition`` producer would pickle the broker into worker
processes and mutate copies).  The production path stays
``pipeline.kafka_sink``: Spark's Kafka sink already runs producers
per-partition on executors with the same at-least-once semantics.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.rpc import (
    TOPIC_BLOCKS,
    TOPIC_LOGS,
    TOPIC_TOKEN_TRANSFERS,
    TOPIC_TRANSACTIONS,
)

__all__ = [
    "InProcessBroker",
    "kafka_records",
    "kafka_sink_executable",
]


@dataclass
class _Record:
    offset: int
    key: str
    value: str
    batch_id: int


class InProcessBroker:
    """Minimal in-process stand-in for a Kafka cluster: append-only topic
    logs with offsets.  Thread-safe because foreachBatch callbacks run on
    the streaming query's thread, not the test's."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._topics: dict[str, list[_Record]] = {}
        self.produce_calls = 0

    def produce(self, topic: str, key: str, value: str, batch_id: int) -> None:
        with self._lock:
            log = self._topics.setdefault(topic, [])
            log.append(_Record(len(log), key, value, batch_id))
            self.produce_calls += 1

    def topics(self) -> list[str]:
        with self._lock:
            return sorted(self._topics)

    def fetch(self, topic: str) -> list[_Record]:
        with self._lock:
            return list(self._topics.get(topic, []))

    def distinct_messages(self, topic: str) -> set[tuple[str, str]]:
        """(key, value) set — what an idempotent/deduping consumer sees
        after at-least-once delivery."""
        return {(r.key, r.value) for r in self.fetch(topic)}


def _topic_route() -> F.Column:
    """Envelope event_type -> topic (kafka_producer.py TOPIC_* routing;
    a SQL expression so the projection stays JVM-side)."""
    return (
        F.when(F.col("event_type") == "block", F.lit(TOPIC_BLOCKS))
        .when(F.col("event_type") == "transaction", F.lit(TOPIC_TRANSACTIONS))
        .when(F.col("event_type") == "token_transfer",
              F.lit(TOPIC_TOKEN_TRANSFERS))
        .otherwise(F.lit(TOPIC_LOGS))
    )


def kafka_records(df: DataFrame) -> DataFrame:
    """Project an envelope frame to (topic, key, value) — the exact shape
    both the production ``format("kafka")`` sink and the executable twin
    publish.  Key precedence mirrors the reference ``_publish`` call
    sites: block events are keyed by the block hash (kafka_producer.py:171
    ``key=block["hash"].hex()``) and transaction events by the tx hash
    (kafka_producer.py:196 ``key=tx["hash"].hex()``) — both live in
    ``payload.hash``; every other event type uses the default
    ``str(event.block_number)`` key (kafka_producer.py:109)."""
    from pyspark.sql.types import StructType as _StructType

    cols = set(df.columns)
    payload_type = (df.schema["payload"].dataType
                    if "payload" in cols else None)
    # a non-struct payload column (raw JSON string, map) has no fields —
    # fall through to the block_number key instead of crashing on
    # .fieldNames() (review fix)
    if {"event_type", "payload", "block_number"} <= cols and \
            isinstance(payload_type, _StructType) and \
            "hash" in payload_type.fieldNames():
        key = F.when(
            F.col("event_type").isin("block", "transaction"),
            F.coalesce(F.col("payload.hash"),
                       F.col("block_number").cast("string")),
        ).otherwise(F.col("block_number").cast("string"))
    elif "block_number" in cols:
        key = F.col("block_number").cast("string")
    else:
        key = F.lit("")
    topic = _topic_route() if "event_type" in df.columns else F.lit(TOPIC_LOGS)
    return df.select(
        topic.alias("topic"),
        key.cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )


def kafka_sink_executable(
    df: DataFrame,
    broker: InProcessBroker,
    checkpoint_dir: str,
    trigger_seconds: float = 2.0,
    fail_once_at_batch: int | None = None,
):
    """writeStream twin of ``pipeline.kafka_sink`` publishing into an
    ``InProcessBroker``.  ``fail_once_at_batch`` injects one crash AFTER
    publishing but BEFORE the checkpoint commits that batch — the exact
    window where Kafka's at-least-once contract shows: on restart the
    batch replays and its records appear twice in the log.
    """
    failed = {"done": False}

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        rows = kafka_records(batch_df).collect()
        for r in rows:
            broker.produce(r["topic"], r["key"], r["value"], batch_id)
        if (fail_once_at_batch is not None and batch_id == fail_once_at_batch
                and not failed["done"]):
            failed["done"] = True
            raise RuntimeError("injected crash after publish, before commit")

    return (
        df.writeStream.foreachBatch(publish)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
    )
