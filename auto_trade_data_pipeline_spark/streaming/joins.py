"""Stream-stream interval join (ST, SURVEY §2.9 extension).

Spark's stream-stream inner join buffers both sides in state; the
watermark plus the INTERVAL bound on the event-time condition lets
the engine evict: a left row can be dropped once the watermark
passes `its timestamp + window` (no future right row can match it),
and symmetrically for the right side. Without the interval bound the
state would grow with the stream — the time bound is what makes the
join runnable forever.

At 100 TB/day the state footprint is O(symbols x window x rate), not
O(stream): exactly the bound the reference's in-memory pairing
buffer provides, stated declaratively so Spark distributes and
checkpoints it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join_after_anchor"]


def interval_join_after_anchor(
    ticks: DataFrame,
    anchors: DataFrame,
    window_seconds: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner interval join: every tick within ``(anchor_ts,
    anchor_ts + window_seconds]`` of a same-symbol anchor event. Works
    identically on batch DataFrames (a plain range join) and on
    streaming ones (state-bounded stream-stream join) — the caller
    picks by what it passes in.

    The anchor side is renamed (anchor_ts / anchor_id / anchor_price)
    so the joined row carries both sides without ambiguity."""
    a = anchors.select(
        F.col("symbol").alias("a_symbol"),
        F.col("timestamp").alias("anchor_ts"),
        F.col("tick_id").alias("anchor_id"),
        F.col("price").alias("anchor_price"),
    )
    if anchors.isStreaming:
        a = a.withWatermark("anchor_ts", watermark)
    t = ticks
    if ticks.isStreaming:
        t = t.withWatermark("timestamp", watermark)
    cond = (
        (t.symbol == a.a_symbol)
        & (t.timestamp > a.anchor_ts)
        & (t.timestamp <= a.anchor_ts + F.expr(f"INTERVAL {window_seconds} SECONDS"))
    )
    return t.join(a, cond).drop("a_symbol")
