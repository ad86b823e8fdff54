"""Value-equality pins for the round-10 selectExpr fast lanes.

with_local_time / with_session_flags / with_bollinger /
with_volume_spike now build their expressions as SQL strings in one
selectExpr call (driver build-latency: one py4j round trip instead of
dozens). These tests pin the string forms exactly equal to the
Column-object reference forms (`_session_preds`, `_bollinger_cols`,
`_volume_spike_cols`) on real candle data — any parse/coercion drift
(decimal literals, cast placement) fails loudly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.operators.candles import aggregate_candles
from auto_trade_data_pipeline_spark.operators.windows import (
    _bollinger_cols,
    _session_preds,
    _volume_spike_cols,
    symbol_window,
    with_bollinger,
    with_local_time,
    with_session_flags,
    with_volume_spike,
)
from auto_trade_data_pipeline_spark.sources import ticks_from_events


@pytest.fixture(scope="module")
def candles(spark, sf_small):
    return aggregate_candles(ticks_from_events(spark, sf_small), 1)


def _frames_equal(a, b):
    assert a.schema == b.schema
    ac = a.collect()
    bc = b.collect()
    assert ac == bc


def test_local_time_fastlane(spark, candles):
    from auto_trade_data_pipeline_spark.operators.windows import NY_TZ

    local = F.from_utc_timestamp(F.col("timestamp"), NY_TZ)
    ref = (
        candles.withColumn("local_timestamp", local)
        .withColumn("local_date", F.to_date(local))
        .withColumn("local_hour", F.hour(local))
        .withColumn("local_minute", F.minute(local))
    )
    _frames_equal(
        with_local_time(candles).orderBy("symbol", "timestamp"),
        ref.orderBy("symbol", "timestamp"),
    )


def test_session_flags_fastlane(spark, candles):
    from auto_trade_data_pipeline_spark.operators.windows import NY_TZ

    local = F.from_utc_timestamp(F.col("timestamp"), NY_TZ)
    h, m = F.hour(local), F.minute(local)
    ref = candles.withColumns(
        {name: pred.cast("int") for name, pred in _session_preds(h, m)}
    )
    _frames_equal(
        with_session_flags(candles).orderBy("symbol", "timestamp"),
        ref.orderBy("symbol", "timestamp"),
    )


def test_bollinger_fastlane(spark, candles):
    w = symbol_window().rowsBetween(-19, 0)
    ref = _bollinger_cols(candles, w, 20, 2.0)
    _frames_equal(
        with_bollinger(candles).orderBy("symbol", "timestamp"),
        ref.orderBy("symbol", "timestamp"),
    )


def test_volume_spike_fastlane(spark, candles):
    w = symbol_window().rowsBetween(-59, 0)
    ref = _volume_spike_cols(candles, w, 1.5)
    _frames_equal(
        with_volume_spike(candles).orderBy("symbol", "timestamp"),
        ref.orderBy("symbol", "timestamp"),
    )
