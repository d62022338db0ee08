"""Windowed streaming aggregations over event streams.

Builders are written against a generic DataFrame so the SAME logical plan
serves batch (t2 Q31 determinism gate) and streaming (``readStream``)
inputs — Structured Streaming's core design point.  Watermarks bound state:
late rows beyond the watermark are dropped instead of growing state forever,
which is what makes these runnable continuously at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_events_stream(spark, sf_dir: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """``events`` as a file-source stream (schema pinned from the batch
    footer — streaming sources must not infer).  TIMESTAMP(NANOS) columns
    arrive as BIGINT nanos (``nanosAsLong``) and are normalized to real
    timestamps so watermarks/windows work, same as the batch loader."""
    from ..sources.registry import ensure_nanos_readable, normalize_nanos

    path = f"{sf_dir}/events.parquet"
    # the stream must be pinned to the RAW footer schema (bigint nanos);
    # normalize_nanos converts after the source — ensure the conf first so
    # this works under a caller-built vanilla session too
    ensure_nanos_readable(spark, path)
    schema = spark.read.parquet(path).schema
    # FileStreamSource needs a directory: stream the sf dir, glob-filtered
    # to the events file(s)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .option("pathGlobFilter", "events*.parquet")
              .parquet(sf_dir))
    return normalize_nanos(stream, path)


def tumbling_agg(events: DataFrame, window: str = "5 minutes",
                 watermark: str = "10 minutes",
                 ts_col: str = "ts") -> DataFrame:
    df = events
    if events.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.round(F.sum("value"), 3).alias("sv"))
              .select(F.col("w.start").alias("w_start"),
                      F.col("w.end").alias("w_end"), "event_type", "n", "sv"))


def sliding_agg(events: DataFrame, window: str = "10 minutes",
                slide: str = "5 minutes", watermark: str = "10 minutes",
                ts_col: str = "ts") -> DataFrame:
    df = events
    if events.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.window(F.col(ts_col), window, slide).alias("w"),
                       "event_type")
              .agg(F.count(F.lit(1)).alias("n"))
              .select(F.col("w.start").alias("w_start"),
                      F.col("w.end").alias("w_end"), "event_type", "n"))


def session_agg(events: DataFrame, gap: str = "30 minutes",
                watermark: str = "30 minutes", key: str = "user_id",
                ts_col: str = "ts") -> DataFrame:
    """Session windows (gap-based).  ``session_window`` works in both batch
    and streaming; streaming needs the watermark to close sessions."""
    df = events
    if events.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), key)
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.round(F.sum("value"), 3).alias("sv"))
              .select(F.col("w.start").alias("session_start"),
                      F.col("w.end").alias("session_end"), key,
                      "n_events", "sv"))


def stream_dedup(events: DataFrame, keys: list[str],
                 watermark: str = "10 minutes", ts_col: str = "ts") -> DataFrame:
    """Stateful exact dedup bounded by the watermark
    (``dropDuplicatesWithinWatermark``): state for a key is released once
    the watermark passes it — constant state at any throughput."""
    if events.isStreaming:
        return (events.withWatermark(ts_col, watermark)
                      .dropDuplicatesWithinWatermark(keys))
    return events.dropDuplicates(keys)


def run_stream_to_memory(stream_df: DataFrame, name: str,
                         output_mode: str = "complete"):
    """Drive a streaming query synchronously to completion against the
    file source (test/smoke harness): memory sink + processAllAvailable."""
    q = (stream_df.writeStream.outputMode(output_mode)
         .format("memory").queryName(name).start())
    q.processAllAvailable()
    q.stop()
    return q


def streaming_cms(terms: DataFrame, term_col: str,
                  depth: int = 4, width: int = 1024,
                  salt: str = "cms",
                  weight_col: str | None = None) -> DataFrame:
    """Streaming count-min sketch: heavy-hitter counters maintained over
    an unbounded term stream with STATE THAT CANNOT GROW — the aggregate's
    key space is the sketch's ``depth × width`` cells (4096 at the
    defaults), so unlike a streaming word count (state ∝ vocabulary, i.e.
    unbounded) the state store holds at most that many rows forever.  No
    watermark is needed for boundedness; the result is the same
    re-aggregable counter table as the batch ``cms_build`` (stream==batch
    parity is the test contract), queryable at any time via
    ``cms_estimate``."""
    from ..operators.sketches import _cms_bucket

    t = F.col(term_col)
    w = F.col(weight_col) if weight_col else F.lit(1)
    cells = F.array(*[
        F.struct(F.lit(j).alias("row"),
                 _cms_bucket(t, j, width, salt).alias("bucket"))
        for j in range(depth)])
    return (terms.select(F.explode(cells).alias("c"), w.alias("__w"))
                 .groupBy(F.col("c.row").alias("row"),
                          F.col("c.bucket").alias("bucket"))
                 .agg(F.sum("__w").cast("long").alias("n")))


def ohlc_agg(events: DataFrame, window: str = "1 hour",
             watermark: str = "10 minutes", ts_col: str = "ts") -> DataFrame:
    """OHLC candle bars per (window, event_type) — the streaming twin of
    query x127 (same min_by/max_by over the portable zero-padded sort
    key); works identically on a batch frame, so stream==batch parity is
    testable on finite input.  State per open window is the O(1) partial
    aggregate, dropped once the watermark closes the bar."""
    df = events
    if events.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    seq = F.format_string("%020d-%012d", F.unix_micros(ts_col),
                          F.col("event_id"))
    return (df.groupBy(F.window(F.col(ts_col), window).alias("w"),
                       "event_type")
              .agg(F.round(F.min_by("value", seq), 2).alias("open"),
                   F.round(F.max("value"), 2).alias("high"),
                   F.round(F.min("value"), 2).alias("low"),
                   F.round(F.max_by("value", seq), 2).alias("close"),
                   F.count(F.lit(1)).alias("n"))
              .select(F.col("w.start").alias("w_start"), "event_type",
                      "open", "high", "low", "close", "n"))
