from .pipeline import (
    hourly_transfer_volume_stream,
    kafka_sink,
    kafka_source,
    stream_events,
    streaming_block_agg,
)

__all__ = [
    "hourly_transfer_volume_stream",
    "kafka_sink",
    "kafka_source",
    "stream_events",
    "streaming_block_agg",
]
