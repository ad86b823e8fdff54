"""Property-based invariants (FIXTURES.md §C, SURVEY §5.2) over
randomized tick batches — hypothesis drives the generators, Spark
computes, invariants must hold for every draw."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.operators.candles import aggregate_candles
from auto_trade_data_pipeline_spark.operators.dedup import dedup_keep_last, upsert
from auto_trade_data_pipeline_spark.operators.windows import with_local_time, with_session_flags

TICKS = "symbol string, timestamp timestamp, price double, volume double, tick_id long"
BASE = datetime(2024, 1, 2, 14, 30, 0)

_spark = None


@pytest.fixture(autouse=True)
def _grab_spark(spark):
    global _spark
    _spark = spark


#: Ticks: clustered sub-second timestamps (many per bucket), duplicate
#: instants, zero volumes (null-VWAP path), two symbols.
ticks_strategy = st.lists(
    st.tuples(
        st.sampled_from(["A", "B"]),
        st.integers(min_value=0, max_value=15),       # second offset
        st.integers(min_value=0, max_value=999_999),  # microsecond
        st.floats(min_value=0.5, max_value=100, allow_nan=False, width=32),
        st.sampled_from([0.0, 1.0, 50.0, 300.0]),
    ),
    min_size=1,
    max_size=60,
)


def _df(rows):
    data = [
        (s, BASE + timedelta(seconds=sec, microseconds=us), float(p), float(v), i)
        for i, (s, sec, us, p, v) in enumerate(rows)
    ]
    return _spark.createDataFrame(data, TICKS)


_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=ticks_strategy)
@_settings
def test_candle_conservation_and_ohlc_sanity(rows):
    ticks = _df(rows)
    candles = aggregate_candles(ticks, 1).collect()
    # Conservation: per-bucket volume/trade totals match the ticks.
    agg = {
        (r["symbol"], r["bucket"]): r
        for r in ticks.groupBy(
            "symbol", F.date_trunc("second", "timestamp").alias("bucket")
        )
        .agg(
            F.sum("volume").alias("v"),
            F.count("*").alias("n"),
            F.min("price").alias("lo"),
            F.max("price").alias("hi"),
        )
        .collect()
    }
    assert len(candles) == len(agg)
    for c in candles:
        t = agg[(c["symbol"], c["timestamp"])]
        assert c["volume"] == pytest.approx(t["v"])
        assert c["number_of_trades"] == t["n"]
        assert c["low"] == t["lo"] and c["high"] == t["hi"]
        assert c["low"] <= c["open"] <= c["high"]
        assert c["low"] <= c["close"] <= c["high"]
        if c["vwap"] is None:
            assert c["volume"] == 0
        else:
            assert c["volume"] > 0
            assert c["low"] - 1e-9 <= c["vwap"] <= c["high"] + 1e-9


@given(rows=ticks_strategy)
@_settings
def test_dedup_and_upsert_idempotence(rows):
    ticks = _df(rows)
    once = dedup_keep_last(ticks, ["symbol", "timestamp"], ["tick_id"])
    # Dedup is idempotent and keeps exactly one row per key.
    twice = dedup_keep_last(once, ["symbol", "timestamp"], ["tick_id"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    keys = once.select("symbol", "timestamp").distinct().count()
    assert once.count() == keys
    # Upserting a batch into itself changes nothing (reference
    # re-run idempotence, src/fetch_historical_trades_nvda.py:237-248).
    merged = upsert(once, once, ["symbol", "timestamp"], ["tick_id"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, once.collect()))


@given(rows=ticks_strategy)
@_settings
def test_session_flags_partition_the_day(rows):
    flagged = with_session_flags(with_local_time(_df(rows)))
    flag_cols = [c for c in flagged.columns if c.startswith("is_")]
    total = flagged.select(
        sum(F.col(c) for c in flag_cols).alias("s")
    ).collect()
    assert all(r["s"] == 1 for r in total)
