"""Window-operator invariants (FIXTURES.md §C.5 and spec checks)."""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.operators.candles import aggregate_candles
from auto_trade_data_pipeline_spark.operators.windows import (
    SESSION_FLAGS,
    with_bollinger,
    with_local_time,
    with_running_daily_extrema,
    with_session_flags,
    with_volume_spike,
)
from auto_trade_data_pipeline_spark.sources import ticks_from_events


def _candles(spark, sf):
    return aggregate_candles(ticks_from_events(spark, sf), 1)


def test_session_flags_partition_day(spark, sf_small):
    """Exactly one session flag per row — the buckets tile the NY day."""
    c = with_session_flags(with_local_time(_candles(spark, sf_small)))
    total = reduce(add, [F.col(f) for f in SESSION_FLAGS])
    assert c.filter(total != 1).count() == 0


def test_bollinger_warmup_and_band_order(spark, sf_small):
    c = with_bollinger(_candles(spark, sf_small))
    # warm-up rows: bands collapse to close
    assert (
        c.filter(
            (F.col("bb_mid") == F.col("close"))
            & (F.col("bb_width") != 0)
        ).count()
        == 0
    )
    assert c.filter(F.col("bb_upper") < F.col("bb_lower")).count() == 0


def test_running_extrema_monotone(spark, sf_small):
    c = with_running_daily_extrema(_candles(spark, sf_small))
    # running high never below the row's own high; low never above
    assert c.filter(F.col("running_day_high") < F.col("high")).count() == 0
    assert c.filter(F.col("running_day_low") > F.col("low")).count() == 0


def test_volume_spike_flag_consistent(spark, sf_small):
    c = with_volume_spike(_candles(spark, sf_small))
    bad = c.filter(
        (F.col("is_volume_spike") == 1)
        & (F.col("volume") <= 1.5 * F.col("rolling_avg_volume"))
    )
    assert bad.count() == 0
