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

__all__ = ["interval_join_after_anchor", "interval_left_outer_orphans"]


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


def interval_left_outer_orphans(
    anchors: DataFrame,
    ticks: DataFrame,
    window_seconds: int = 5,
    watermark: str = "10 minutes",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join — the watermark-gated
    null-emission path Spark reserves for outer stream joins: every
    anchor row joins the same-symbol ticks in ``(anchor_ts,
    anchor_ts + window_seconds]``; an anchor with NO such tick (an
    "orphan": end of a burst, last trade before a session gap) emits
    exactly once with null tick columns — but only after the global
    watermark passes its interval end, proving no late match can
    arrive. Until then Spark holds it in state; on an availableNow
    replay the final no-data micro-batch advances the watermark to
    max(event time) - delay and flushes every provable orphan.

    State bound: both sides keep ``watermark + window_seconds`` of
    rows per key — the interval condition is what lets the join evict
    state instead of buffering the whole stream (SURVEY ST10; the
    same mechanism as the inner variant, plus the null-emission
    contract)."""
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
    return a.join(t, cond, "leftOuter")
