"""Explicit StructType schemas for the event envelope and payloads.

The reference builds every frame with ``pd.DataFrame(list_of_dicts)`` and
infers types (reference etl_pipeline.py:127,186,422). We use explicit
schemas — the idiomatic Spark choice — while preserving the reference's
numeric semantics (SURVEY.md §1.2): raw wei/gas values stay strings in
bronze exactly as the producer stringifies them (kafka_producer.py:187-191),
and decoded amounts become float64 (etl_pipeline.py:129).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- payload structs (one per event_type; kafka_producer.py:161-225) -------

BLOCK_PAYLOAD = StructType(
    [
        StructField("hash", StringType()),
        StructField("parent_hash", StringType()),
        StructField("miner", StringType()),
        StructField("gas_used", LongType()),
        StructField("gas_limit", LongType()),
        StructField("base_fee_per_gas", StringType()),
        StructField("tx_count", LongType()),
    ]
)

TRANSACTION_PAYLOAD = StructType(
    [
        StructField("hash", StringType()),
        StructField("from", StringType()),
        StructField("to", StringType()),
        StructField("value_wei", StringType()),   # uint256-as-string
        StructField("gas", LongType()),
        StructField("gas_price", StringType()),   # uint256-as-string
        StructField("max_fee_per_gas", StringType()),
        StructField("max_priority_fee", StringType()),
        StructField("nonce", LongType()),
        StructField("input", StringType()),
    ]
)

LOG_PAYLOAD = StructType(
    [
        StructField("tx_hash", StringType()),
        StructField("log_index", LongType()),
        StructField("contract", StringType()),
        StructField("topics", ArrayType(StringType())),
        StructField("data", StringType()),
    ]
)

# One wide nullable payload union (SURVEY.md §2.7): per-type fields are
# nullable and only populated for their event_type.
PAYLOAD_UNION = StructType(
    sorted(
        {f.name: f for f in [*BLOCK_PAYLOAD, *TRANSACTION_PAYLOAD, *LOG_PAYLOAD]}.values(),
        key=lambda f: f.name,
    )
)

# --- envelope (BlockchainEvent dataclass, kafka_producer.py:37-52) ---------

def envelope_schema(payload: StructType = PAYLOAD_UNION) -> StructType:
    return StructType(
        [
            StructField("chain_id", LongType()),
            StructField("network", StringType()),
            StructField("block_number", LongType()),
            StructField("block_timestamp", LongType()),  # epoch seconds
            StructField("event_type", StringType()),
            StructField("payload", payload),
            StructField("ingested_at", DoubleType()),
        ]
    )


ENVELOPE = envelope_schema()

# --- analytics-ready output schemas (SURVEY.md §1.4) -----------------------

TOKEN_TRANSFERS = StructType(
    [
        StructField("standard", StringType()),
        StructField("contract", StringType()),
        StructField("from", StringType()),
        StructField("to", StringType()),
        StructField("token_id", LongType()),
        StructField("amount", DoubleType()),
        StructField("block_number", LongType()),
        StructField("block_timestamp", TimestampType()),
        StructField("tx_hash", StringType()),
        StructField("chain_id", LongType()),
    ]
)

DEFI_SWAPS = StructType(
    [
        StructField("protocol", StringType()),
        StructField("pool", StringType()),
        StructField("amount0_in", DoubleType()),
        StructField("amount1_in", DoubleType()),
        StructField("amount0_out", DoubleType()),
        StructField("amount1_out", DoubleType()),
        StructField("price", DoubleType()),
        StructField("block_number", LongType()),
        StructField("block_timestamp", TimestampType()),
        StructField("chain_id", LongType()),
        StructField("tx_hash", StringType()),
    ]
)

BLOCK_AGG = StructType(
    [
        StructField("block_number", LongType()),
        StructField("tx_count", LongType()),
        StructField("total_eth_volume", DoubleType()),
        StructField("avg_gas_price_gwei", DoubleType()),
        StructField("max_gas_price_gwei", DoubleType()),
        StructField("defi_tx_count", LongType()),
        StructField("contract_deploys", LongType()),
    ]
)

MEV_SCORES = StructType(
    [
        StructField("block_number", LongType()),
        StructField("mev_score", DoubleType()),
        StructField("sandwich_risk", DoubleType()),
        StructField("frontrun_risk", DoubleType()),
        StructField("backrun_opportunities", LongType()),
    ]
)

ENGINEERED_TX_COLUMNS = [
    "hash", "from", "to", "value_wei", "gas", "gas_price", "max_fee_per_gas",
    "max_priority_fee", "nonce", "input", "block_number", "block_timestamp",
    "chain_id", "gas_price_gwei", "value_eth", "is_contract_deploy",
    "fn_selector", "fn_name", "is_defi_tx", "gas_p90", "is_high_priority",
]
