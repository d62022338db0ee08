"""Structured Streaming operators (extensions; the reference has no
streaming — SURVEY §1.1 'not present')."""

from .joins import clicks_purchases_join
from .stateful import (contamination_sink, ingest_sink, snapshot_sink,
                       running_totals,
                       running_totals_batch, streaming_debounce,
                       streaming_funnel, streaming_last_wins,
                       upsert_sink)
from .windows import (
    streaming_cms,
    ohlc_agg,
    tumbling_agg,
    sliding_agg,
    session_agg,
    stream_dedup,
    read_events_stream,
    run_stream_to_memory,
)

__all__ = [
    "tumbling_agg", "sliding_agg", "session_agg", "ohlc_agg", "stream_dedup",
    "read_events_stream", "run_stream_to_memory",
    "running_totals", "running_totals_batch", "streaming_funnel",
    "streaming_debounce", "streaming_last_wins", "upsert_sink",
    "clicks_purchases_join", "streaming_cms", "contamination_sink",
    "ingest_sink", "snapshot_sink",
]
