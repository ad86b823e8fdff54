"""Streaming volume bars — exact-once emission, split-parity with the
batch operator, and the closed-bar contract (ST4 shape: bounded keyed
state, no watermark)."""

from __future__ import annotations

import glob
import shutil
from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.operators.bars import information_bars
from auto_trade_data_pipeline_spark.streaming import run_available_now
from auto_trade_data_pipeline_spark.streaming.bars import streaming_volume_bars

TICKS = "symbol string, timestamp timestamp, tick_id long, price double, vol_i long"

_V = 500  # small threshold => many bars from few ticks


def _ticks(n=240, start=datetime(2024, 1, 2, 14, 0, 0)):
    rows = []
    for i in range(n):
        sym = "A" if i % 3 else "B"
        rows.append(
            (
                sym,
                start + timedelta(seconds=7 * i),
                i,
                100.0 + ((i * 37) % 50) / 10.0,
                40 + (i * 13) % 60,
            )
        )
    return rows


def _stream_dir(spark, tmp_path, batches):
    data_dir = tmp_path / "vbars_stream"
    data_dir.mkdir()
    for b, rows in enumerate(batches):
        df = spark.createDataFrame(rows, TICKS).coalesce(1)
        df.write.parquet(f"{tmp_path}/vb{b}")
        for i, f in enumerate(glob.glob(f"{tmp_path}/vb{b}/part-*.parquet")):
            shutil.copy(f, data_dir / f"f_{b}_{i}.parquet")
    return str(data_dir)


def _read_stream(spark, path, max_files=None):
    r = spark.readStream.format("parquet").schema(TICKS)
    if max_files:
        r = r.option("maxFilesPerTrigger", max_files)
    return r.load(path)


def _batch_closed_bars(spark, rows):
    """Batch bars minus each symbol's last (still open) bar."""
    df = spark.createDataFrame(rows, TICKS)
    bars = information_bars(
        df.select("symbol", "timestamp", "tick_id", "price", F.col("vol_i").alias("m0")),
        _V,
        F.col("m0"),
        "volume",
    )
    from pyspark.sql.window import Window

    mx = F.max("bar_id").over(Window.partitionBy("symbol"))
    return bars.withColumn("__mx", mx).filter(F.col("bar_id") < F.col("__mx")).drop("__mx")


def _key(r):
    return (r["symbol"], r["bar_id"], r["volume"], r["n_ticks"], r["open"], r["close"])


@pytest.mark.parametrize("splits", [1, 3, 5])
def test_streamed_bars_equal_batch_closed_bars(spark, tmp_path, splits):
    rows = _ticks()
    k = len(rows) // splits
    batches = [
        rows[i * k : (i + 1) * k if i < splits - 1 else len(rows)] for i in range(splits)
    ]
    path = _stream_dir(spark, tmp_path, batches)
    stream = streaming_volume_bars(
        _read_stream(spark, path, max_files=1 if splits > 1 else None), _V
    )
    got = run_available_now(stream, f"t_vbars_{splits}", "update").collect()
    want = _batch_closed_bars(spark, rows).collect()
    assert {_key(r) for r in got} == {_key(r) for r in want}
    # exact-once: no (symbol, bar_id) appears twice in the stream output
    seen = [(r["symbol"], r["bar_id"]) for r in got]
    assert len(seen) == len(set(seen))


def test_open_bar_is_never_emitted(spark, tmp_path):
    rows = _ticks(n=30)
    path = _stream_dir(spark, tmp_path, [rows])
    stream = streaming_volume_bars(_read_stream(spark, path), _V)
    got = run_available_now(stream, "t_vbars_open", "update").collect()
    batch_all = (
        information_bars(
            spark.createDataFrame(rows, TICKS).select(
                "symbol", "timestamp", "tick_id", "price", F.col("vol_i").alias("m0")
            ),
            _V,
            F.col("m0"),
            "volume",
        )
        .groupBy("symbol")
        .agg(F.max("bar_id").alias("last_bar"))
        .collect()
    )
    last = {r["symbol"]: r["last_bar"] for r in batch_all}
    for r in got:
        assert r["bar_id"] < last[r["symbol"]]
