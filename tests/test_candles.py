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


def test_gap_fill_dense_grid_and_forward_fill(spark):
    """Hand-built fixture: two candles 3 minutes apart on one day —
    the dense grid has all 1440 slots, the in-between minutes carry
    the forward-filled close with volume 0 and the flag set, and
    minutes before the first candle stay null."""
    import datetime as dt

    from auto_trade_data_pipeline_spark.operators.candles import gap_fill_candles

    d = dt.datetime(2024, 3, 4)
    rows = [
        ("S", d + dt.timedelta(minutes=10), 5.0, 7.0, 4.0, 6.0, 100.0, 3, 5.5),
        ("S", d + dt.timedelta(minutes=13), 6.5, 6.5, 6.5, 6.5, 50.0, 1, 6.5),
    ]
    candles = spark.createDataFrame(
        rows,
        "symbol string, timestamp timestamp, open double, high double, low double,"
        " close double, volume double, number_of_trades long, vwap double",
    )
    out = gap_fill_candles(candles, seconds=60).collect()
    by_min = {r["timestamp"].minute + 60 * r["timestamp"].hour: r for r in out}
    assert len(out) == 1440 and len(by_min) == 1440
    assert by_min[9]["close_ff"] is None and by_min[9]["is_gap_fill"] == 1
    assert by_min[10]["close_ff"] == 6.0 and by_min[10]["is_gap_fill"] == 0
    assert by_min[11]["close_ff"] == 6.0 and by_min[11]["is_gap_fill"] == 1
    assert by_min[12]["close_ff"] == 6.0 and by_min[12]["volume"] == 0.0
    assert by_min[13]["close_ff"] == 6.5 and by_min[13]["is_gap_fill"] == 0
    assert by_min[1439]["close_ff"] == 6.5 and by_min[1439]["number_of_trades"] == 0
