"""End-to-end pipeline: the three reference stages as one job, with
checkpointed outputs round-tripping."""

from __future__ import annotations

from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.pipeline import run_batch_pipeline
from auto_trade_data_pipeline_spark.sources import ticks_from_events


def test_batch_pipeline_end_to_end(spark, sf_small, tmp_path):
    ticks = ticks_from_events(spark, sf_small)
    out = run_batch_pipeline(ticks, output_dir=str(tmp_path / "out"))

    n_ticks = ticks.count()
    assert out.invalid_ticks.count() + (
        out.candles.agg(F.sum("number_of_trades")).first()[0]
    ) == n_ticks  # every tick is either quarantined or in a candle

    # The calculated table carries the full surface on every candle.
    assert out.calculated.count() == out.candles.count()
    assert {"adx", "t3", "bb_upper", "is_morning", "CDLDOJI"} <= set(out.calculated.columns)

    # Anchors exist and their filled VWAP respects candle price bounds.
    a = out.anchors.filter(F.col("anchored_vwap").isNotNull())
    assert a.count() > 0
    lo, hi = ticks.agg(F.min("price"), F.max("price")).first()
    bad = a.filter((F.col("anchored_vwap") < lo - 1e-6) | (F.col("anchored_vwap") > hi + 1e-6))
    assert bad.count() == 0

    # Checkpoints round-trip.
    assert spark.read.parquet(str(tmp_path / "out/candles_1s")).count() == out.candles.count()
    assert (
        spark.read.parquet(str(tmp_path / "out/anchored_vwap_points_1s")).count()
        == out.anchors.count()
    )
