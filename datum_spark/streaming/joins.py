"""Stream-stream joins with event-time bounds.

A stream-stream join must buffer both sides in state; the time-interval
condition plus watermarks is what lets Spark EVICT state — without them the
buffers grow forever.  The builder takes generic DataFrames so the same
logical plan serves the batch twin (extensions x32) and the streaming run
(parity test), Structured Streaming's design point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_purchases_join(clicks_src: DataFrame, purchases_src: DataFrame,
                          click_type: str = "click",
                          purchase_type: str = "purchase",
                          within: str = "30 minutes",
                          watermark: str = "10 minutes",
                          ts_col: str = "ts") -> DataFrame:
    """Each click joined to the same user's purchases in
    ``[click_ts, click_ts + within]``.

    Pass the events table (or two separate readStream instances of it);
    watermarks are applied only on streaming inputs.  Output:
    ``(click_id, user_id, c_ts, p_ts, value)``.
    """
    clicks = clicks_src.filter(F.col("event_type") == click_type)
    purchases = purchases_src.filter(F.col("event_type") == purchase_type)
    if clicks.isStreaming:
        clicks = clicks.withWatermark(ts_col, watermark)
    if purchases.isStreaming:
        purchases = purchases.withWatermark(ts_col, watermark)
    c = clicks.select("user_id", F.col("event_id").alias("click_id"),
                      F.col(ts_col).alias("c_ts"))
    p = purchases.select(F.col("user_id").alias("p_user"),
                         F.col(ts_col).alias("p_ts"), "value")
    cond = ((F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {within}")))
    return (c.join(p, cond, "inner")
             .select("click_id", "user_id", "c_ts", "p_ts", "value"))
