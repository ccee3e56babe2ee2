"""TokenTransferDecoder parity (reference tests/test_etl_pipeline.py:103-125)."""

from pyspark.sql.types import TimestampType

from defi_etl_platform_sqlglot_implementation__spark.operators.transfers import decode_transfers
from defi_etl_platform_sqlglot_implementation__spark.schemas import ENVELOPE

from .conftest import events_df, make_transaction_message, make_transfer_message


class TestDecodeTransfers:
    def test_erc20_decode(self, spark):
        df = decode_transfers(events_df(spark, [make_transfer_message("ERC-20")]))
        rows = df.collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["standard"] == "ERC-20"
        assert r["amount"] == float(10 * 10**18)
        assert r["token_id"] is None
        assert r["chain_id"] == 1

    def test_erc721_decode(self, spark):
        df = decode_transfers(
            events_df(spark, [make_transfer_message("ERC-721", token_id=7)])
        )
        r = df.collect()[0]
        assert r["standard"] == "ERC-721"
        assert r["token_id"] == 7
        assert r["amount"] == 1.0

    def test_checksummed_addresses(self, spark):
        r = decode_transfers(events_df(spark, [make_transfer_message()])).collect()[0]
        # from-topic low 20 bytes = 'a'*40 -> EIP-55 of 0xaaaa…
        assert r["from"].startswith("0x")
        assert r["from"].lower() == "0x" + "a" * 40
        assert r["from"] != "0x" + "a" * 40  # mixed-case applied

    def test_non_transfer_events_skipped(self, spark):
        df = decode_transfers(
            events_df(spark, [make_transaction_message(), make_transfer_message()])
        )
        assert df.count() == 1

    def test_empty_input_empty_output_with_schema(self, spark):
        empty = spark.createDataFrame([], ENVELOPE)
        out = decode_transfers(empty)
        assert out.count() == 0
        assert out.columns == [
            "standard", "contract", "from", "to", "token_id", "amount",
            "block_number", "block_timestamp", "tx_hash", "chain_id",
        ]

    def test_timestamp_is_timestamp_type(self, spark):
        df = decode_transfers(events_df(spark, [make_transfer_message()]))
        assert isinstance(df.schema["block_timestamp"].dataType, TimestampType)
