"""Streaming anchor state machine — single-batch equivalence with the
batch kernel, and state carry across micro-batches (ST5-ST7)."""

from __future__ import annotations

import glob
import shutil
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from auto_trade_data_pipeline_spark.operators.anchors import anchored_vwap_points
from auto_trade_data_pipeline_spark.streaming import run_available_now
from auto_trade_data_pipeline_spark.streaming.anchors import streaming_anchor_points

CANDLES = (
    "symbol string, timestamp timestamp, open double, high double, low double,"
    " close double, volume double, number_of_trades long, vwap double"
)


def _bars(n=120, start=datetime(2024, 1, 2, 14, 0, 0)):
    rng = np.random.default_rng(11)
    c = 100 + np.cumsum(rng.normal(0, 0.5, n))
    rows = []
    for i in range(n):
        rows.append(
            (
                "S",
                start + timedelta(seconds=30 * i),
                float(c[i]),
                float(c[i] + abs(rng.normal(0, 0.4))),
                float(c[i] - abs(rng.normal(0, 0.4))),
                float(c[i]),
                100.0,
                2,
                float(c[i]),
            )
        )
    return rows


def _stream_dir(spark, tmp_path, batches):
    data_dir = tmp_path / "anchor_stream"
    data_dir.mkdir()
    for b, rows in enumerate(batches):
        df = spark.createDataFrame(rows, CANDLES).coalesce(1)
        df.write.parquet(f"{tmp_path}/ab{b}")
        for i, f in enumerate(glob.glob(f"{tmp_path}/ab{b}/part-*.parquet")):
            shutil.copy(f, data_dir / f"f_{b}_{i}.parquet")
    return str(data_dir)


def _read_stream(spark, path, max_files=None):
    r = spark.readStream.format("parquet").schema(CANDLES)
    if max_files:
        r = r.option("maxFilesPerTrigger", max_files)
    return r.load(path)


def _key(r):
    return (r["anchor_type"], r["anchor_timestamp"], r["price_at_anchor"])


def test_single_batch_stream_matches_batch_kernel(spark, tmp_path):
    rows = _bars()
    path = _stream_dir(spark, tmp_path, [rows])
    stream = streaming_anchor_points(
        _read_stream(spark, path), flush_secs=300, buffer_rows=1024
    )
    got = run_available_now(stream, "t_anchor_stream_1", "update")
    batch = anchored_vwap_points(spark.createDataFrame(rows, CANDLES), flush_secs=300)
    # Compare the deduped anchor sets (keep-last on snapshot time).
    g = {_key(r) for r in got.collect()}
    b = {_key(r) for r in batch.collect()}
    assert g == b


def test_state_carries_across_batches(spark, tmp_path):
    rows = _bars(n=120)
    path = _stream_dir(spark, tmp_path, [rows[:60], rows[60:]])
    stream = streaming_anchor_points(
        _read_stream(spark, path, max_files=1), flush_secs=10**9, buffer_rows=1024
    )
    got = run_available_now(stream, "t_anchor_stream_2", "update").collect()
    # The day-extreme state must persist: batch 2's snapshot still
    # references extremes/anchors discovered in batch 1 when batch 2
    # never beats them.
    batch = anchored_vwap_points(
        spark.createDataFrame(rows, CANDLES), flush_secs=10**9
    ).collect()
    want_daily = {
        _key(r) for r in batch if r["anchor_type"].startswith("daily")
    }
    # Streaming emits snapshots per batch; the FINAL batch's snapshot
    # of daily anchors must equal the batch kernel's final snapshot.
    last_snap = max(r["current_snapshot_timestamp"] for r in got)
    got_daily = {
        _key(r)
        for r in got
        if r["anchor_type"].startswith("daily")
        and r["current_snapshot_timestamp"] == last_snap
    }
    assert got_daily == want_daily
