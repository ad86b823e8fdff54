"""Streaming session windows: multi-batch split parity — sessions
must MERGE across micro-batch boundaries (the stateful merging-window
behavior) and emit exactly once when the watermark passes their end."""

from __future__ import annotations

import uuid
from datetime import datetime, timedelta

from pyspark.sql import functions as F

SCHEMA = "symbol string, timestamp timestamp, volume double, tick_id long"
BASE = datetime(2024, 1, 2, 9, 30, 0)


def _ticks():
    """Symbol A: three activity bursts; the middle two are 20 min
    apart (< 30 min gap -> one merged session) and the burst spans a
    file boundary, so the merge happens ACROSS micro-batches. A late
    final tick advances the watermark far enough to close the first
    sessions but not the last."""
    rows = []
    tid = 0

    def burst(sym, start_min, n, step_s=60):
        nonlocal tid
        for i in range(n):
            rows.append(
                (sym, BASE + timedelta(minutes=start_min, seconds=i * step_s), 10.0, tid)
            )
            tid += 1

    # Arrival order == event-time order (no late drops): the
    # watermark only advances past a session after its data arrived.
    burst("A", 0, 5)        # session 1: 09:30-09:34  (ends 10:04)
    burst("B", 10, 3)       # B session 1: 09:40-09:42 (ends 10:12)
    burst("A", 60, 4)       # session 2a: 10:30-10:33
    burst("A", 80, 4)       #   +20 min -> MERGES into session 2 (ends 11:23)
    burst("A", 600, 1)      # watermark driver: 19:30 -> wm 19:20
    burst("B", 600, 1)
    return rows


def _expected_closed(spark, rows, gap_min=30, wm_min=10):
    df = spark.createDataFrame(rows, SCHEMA)
    from pyspark.sql.window import Window

    w = Window.partitionBy("symbol").orderBy("timestamp", "tick_id")
    prev = F.lag("timestamp").over(w)
    s = df.select(
        "*",
        F.when(
            prev.isNull()
            | (F.unix_micros("timestamp") - F.unix_micros(prev) > gap_min * 60_000_000),
            1,
        ).otherwise(0).alias("ns"),
    ).withColumn("sid", F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    g = s.groupBy("symbol", "sid").agg(
        F.min("timestamp").alias("start"),
        (F.max("timestamp") + F.expr(f"INTERVAL {gap_min} MINUTES")).alias("end"),
        F.count(F.lit(1)).alias("n"),
    )
    wm = df.agg(
        (F.max("timestamp") - F.expr(f"INTERVAL {wm_min} MINUTES")).alias("w")
    ).collect()[0]["w"]
    return sorted(
        (r.symbol, r.start, r.end, r.n)
        for r in g.collect()
        if r.end <= wm
    )


def test_streaming_sessions_merge_across_batches(spark, tmp_path):
    rows = _ticks()
    d = str(tmp_path / "ticks")
    # Split so the merged session's two bursts land in DIFFERENT
    # micro-batches (state must merge windows across batches).
    for lo, hi in ((0, 10), (10, 14), (14, 100)):
        chunk = [r for r in rows if lo <= r[3] < hi]
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode("append").parquet(d)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
        .withWatermark("timestamp", "10 minutes")
    )
    sess = stream.groupBy("symbol", F.session_window("timestamp", "30 minutes")).agg(
        F.count(F.lit(1)).alias("n")
    )
    name = f"t_sess_{uuid.uuid4().hex[:8]}"
    q = (
        sess.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.symbol, r.session_window.start, r.session_window.end, r.n)
        for r in spark.table(name).collect()
    )
    expected = _expected_closed(spark, rows)
    assert got == expected
    # The scenario genuinely exercises the merge: symbol A's second
    # session contains BOTH bursts (8 ticks) despite the batch split.
    assert ("A", BASE + timedelta(minutes=60),
            BASE + timedelta(minutes=83, seconds=0) + timedelta(minutes=30), 8) in got
