"""Streaming indicator enrichment (ST4 full form): tail-buffered
micro-batches reproduce the batch kernel when the tail covers the
stream so far."""

from __future__ import annotations

import glob
import shutil
from datetime import datetime, timedelta

import numpy as np

from auto_trade_data_pipeline_spark.operators.indicators import enrich_indicators
from auto_trade_data_pipeline_spark.streaming import run_available_now
from auto_trade_data_pipeline_spark.streaming.indicators import streaming_indicators

CANDLES = (
    "symbol string, timestamp timestamp, open double, high double, low double,"
    " close double, volume double, number_of_trades long, vwap double"
)

CHECK_COLS = ["adx", "macd", "psar", "atr", "t3", "t3_slope", "candle_pattern_sum",
              "is_micro_peak", "CDLDOJI"]


def _bars(n, start=datetime(2024, 1, 2, 14, 0, 0)):
    rng = np.random.default_rng(23)
    c = 100 + np.cumsum(rng.normal(0, 0.4, n))
    rows = []
    for i in range(n):
        o = float(c[i] + rng.normal(0, 0.3))
        rows.append(
            ("S", start + timedelta(seconds=i), o,
             float(max(o, c[i]) + abs(rng.normal(0, 0.2))),
             float(min(o, c[i]) - abs(rng.normal(0, 0.2))),
             float(c[i]), 100.0, 2, float(c[i]))
        )
    return rows


def _stream_dir(spark, tmp_path, batches):
    d = tmp_path / "si"
    d.mkdir()
    for b, rows in enumerate(batches):
        spark.createDataFrame(rows, CANDLES).coalesce(1).write.parquet(f"{tmp_path}/sib{b}")
        for i, f in enumerate(glob.glob(f"{tmp_path}/sib{b}/part-*.parquet")):
            shutil.copy(f, d / f"f_{b}_{i}.parquet")
    return str(d)


def test_multibatch_stream_equals_batch_with_covering_tail(spark, tmp_path):
    rows = _bars(500)
    path = _stream_dir(spark, tmp_path, [rows[:250], rows[250:]])
    stream = streaming_indicators(
        spark.readStream.format("parquet").schema(CANDLES)
        .option("maxFilesPerTrigger", 1).load(path),
        buffer_rows=1000,  # covers the whole stream -> exact equality
    )
    got = run_available_now(stream, "t_si", "update")
    batch = enrich_indicators(spark.createDataFrame(rows, CANDLES))
    g = {r["timestamp"]: r for r in got.collect()}
    b = {r["timestamp"]: r for r in batch.collect()}
    assert set(g) == set(b)
    for ts, br in b.items():
        for c in CHECK_COLS:
            gv, bv = g[ts][c], br[c]
            if isinstance(bv, float):
                assert abs(gv - bv) < 1e-9, (ts, c, gv, bv)
            else:
                assert gv == bv, (ts, c, gv, bv)
