"""JSON event codec: serialize -> deserialize roundtrip (S4/S5)."""

from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark.sources.bronze import (
    parse_raw_events,
    to_event_json,
)

from .conftest import events_df, make_swap_message, make_transaction_message, make_transfer_message


class TestJsonRoundtrip:
    def test_roundtrip_preserves_envelope(self, spark):
        msgs = [
            make_transfer_message(),
            make_transaction_message(),
            make_swap_message(a0i=1, a1o=2),
        ]
        events = events_df(spark, msgs)
        rejsoned = events.select(to_event_json().alias("value"))
        back = parse_raw_events(rejsoned)
        a = events.select("chain_id", "block_number", "event_type",
                          F.col("payload")["contract"].alias("c")).collect()
        b = back.select("chain_id", "block_number", "event_type",
                        F.col("payload")["contract"].alias("c")).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_malformed_json_yields_nulls_not_errors(self, spark):
        raw = spark.createDataFrame(
            [("{bad json",), ("",), (make_transfer_message(),)], ["value"]
        )
        out = parse_raw_events(raw)
        assert out.count() == 3  # permissive: rows survive as null structs
        assert out.filter(F.col("event_type").isNotNull()).count() == 1


class TestQuarantine:
    def test_split_is_lossless(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.sources.bronze import (
            parse_raw_events_quarantine,
        )
        from .conftest import make_transfer_message, make_transaction_message

        msgs = [
            make_transfer_message(),
            '{"truncated": ',
            make_transaction_message(),
            "not json at all",
            "{}",  # valid JSON, all-null envelope -> parses clean
        ]
        raw = spark.createDataFrame([(m,) for m in msgs], ["value"])
        ok, rejects = parse_raw_events_quarantine(raw)
        assert ok.count() == 3
        assert rejects.count() == 2
        assert set(rejects.columns) == {"raw_value", "rejected_at"}
        bad = {r["raw_value"] for r in rejects.collect()}
        assert bad == {'{"truncated": ', "not json at all"}
        # clean rows match the lenient parser's non-null rows
        assert "_corrupt_record" not in ok.columns
        assert ok.schema["event_type"].dataType.typeName() == "string"
