"""Property tests for candle aggregation (FIXTURES.md §C invariants)."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark import schemas
from auto_trade_data_pipeline_spark.operators.candles import aggregate_candles
from auto_trade_data_pipeline_spark.sources import ticks_from_events


def _ticks_fixture(spark):
    """Hand-built ticks with sub-second multiplicity, out-of-order rows,
    an exact duplicate timestamp, and a zero-volume bucket."""
    base = datetime(2024, 3, 8, 14, 30, 0)
    rows = [
        # (symbol, ts_offset_us, price, volume, tick_id)
        ("NVDA", 0, 100.0, 10.0, 1),
        ("NVDA", 500_000, 101.0, 5.0, 2),     # same second
        ("NVDA", 999_999, 99.5, 2.0, 3),      # same second, last by time
        ("NVDA", 1_200_000, 98.0, 1.0, 5),    # next second, out of order id
        ("NVDA", 1_100_000, 97.0, 4.0, 4),
        ("NVDA", 1_100_000, 96.0, 3.0, 6),    # duplicate ts -> id breaks tie
        ("NVDA", 5_000_000, 50.0, 0.0, 7),    # zero-volume bucket -> null vwap
        ("AAPL", 0, 200.0, 1.0, 8),
    ]
    data = [
        (s, base + timedelta(microseconds=us), p, v, i) for s, us, p, v, i in rows
    ]
    return spark.createDataFrame(data, schema=schemas.TICKS)


def test_ohlc_semantics(spark):
    c = aggregate_candles(_ticks_fixture(spark), 1)
    rows = {(r.symbol, r.timestamp.second): r for r in c.collect()}

    b0 = rows[("NVDA", 0)]
    assert b0.open == 100.0 and b0.close == 99.5
    assert b0.high == 101.0 and b0.low == 99.5
    assert b0.volume == 17.0 and b0.number_of_trades == 3
    expected_vwap = (100 * 10 + 101 * 5 + 99.5 * 2) / 17
    assert abs(b0.vwap - expected_vwap) < 1e-12

    # open at equal ts resolved by tick_id asc (4 before 6), close by ts desc (id 5 @1.2s)
    b1 = rows[("NVDA", 1)]
    assert b1.open == 97.0 and b1.close == 98.0

    # zero-volume bucket -> vwap null
    b5 = rows[("NVDA", 5)]
    assert b5.vwap is None and b5.volume == 0.0

    assert rows[("AAPL", 0)].number_of_trades == 1


def test_conservation_and_bounds(spark, sf_small):
    """Σ candle volume == Σ tick volume; low ≤ vwap ≤ high; low ≤ o,c ≤ high."""
    t = ticks_from_events(spark, sf_small)
    c = aggregate_candles(t, 1).cache()

    tick_vol = t.agg(F.sum("volume")).first()[0]
    candle_vol = c.agg(F.sum("volume")).first()[0]
    assert abs(tick_vol - candle_vol) < 1e-6

    assert t.count() == c.agg(F.sum("number_of_trades")).first()[0]

    bad = c.filter(
        (F.col("low") > F.col("open"))
        | (F.col("low") > F.col("close"))
        | (F.col("high") < F.col("open"))
        | (F.col("high") < F.col("close"))
        | (F.col("vwap").isNotNull() & ((F.col("vwap") < F.col("low") - 1e-9) | (F.col("vwap") > F.col("high") + 1e-9)))
        | (F.col("vwap").isNull() & (F.col("volume") != 0))
    )
    assert bad.count() == 0


def test_timeframe_parameterization(spark, sf_small):
    t = ticks_from_events(spark, sf_small)
    c1 = aggregate_candles(t, 1)
    c60 = aggregate_candles(t, 60)
    assert c60.count() <= c1.count()
    # bucket boundaries land on the timeframe grid
    off = c60.filter(F.unix_timestamp("timestamp") % 60 != 0).count()
    assert off == 0
