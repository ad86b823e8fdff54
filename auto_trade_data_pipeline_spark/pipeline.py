"""The three reference stages as one composable Spark job.

The reference runs ingest -> candles -> enrichment as three CLI
programs communicating through CSV files (SURVEY §3). Here the same
DAG is a library function: no intermediate round-trips, one lineage,
Catalyst sees the whole plan. Stage boundaries can still be
checkpointed to parquet (pass ``output_dir``) to keep the
reference's restartable-stage property.

    ticks (any source: rest.fetch_trades, files.read_ticks, events)
      └─ validate_split ──────────── invalid side-output (S9)
      └─ valid ─ aggregate_candles ─ candles_1s (A1-A3)
                   └─ enrich: local cols + sessions + kernel +
                      bollinger + volume spike  →  candles_calculated
                   └─ anchored_vwap_points (+ filled VWAP)

Reference lifecycle being replaced:
``src/fetch_historical_trades_nvda.py:356-403`` ->
``src/aggregator_candles.py:444-492`` ->
``src/candle_to_calcs.py:580-700``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from auto_trade_data_pipeline_spark import sinks
from auto_trade_data_pipeline_spark.operators.anchors import (
    anchored_vwap_points,
    fill_anchored_vwap,
)
from auto_trade_data_pipeline_spark.operators.candles import aggregate_candles
from auto_trade_data_pipeline_spark.operators.indicators import enrich_indicators
from auto_trade_data_pipeline_spark.operators.validation import (
    tick_valid_predicate,
    validate_split,
)
from auto_trade_data_pipeline_spark.operators.windows import (
    with_bollinger,
    with_local_time,
    with_session_flags,
    with_volume_spike,
)

__all__ = ["PipelineResult", "run_batch_pipeline"]


@dataclass
class PipelineResult:
    invalid_ticks: DataFrame
    candles: DataFrame
    calculated: DataFrame
    anchors: DataFrame


def run_batch_pipeline(
    ticks: DataFrame,
    timeframe_seconds: int = 1,
    flush_secs: int = 300,
    output_dir: str | None = None,
    blocked_windows: bool = False,
) -> PipelineResult:
    """Run the full reference DAG over a tick DataFrame and return all
    four logical tables (SURVEY §1.1). With ``output_dir`` set, each
    table is also checkpointed to parquet (restartable stages).
    ``blocked_windows=True`` routes the bounded ROWS windows through
    the block-parallel evaluator (operators/blocked.py)."""
    valid, invalid = validate_split(ticks, tick_valid_predicate())
    candles = aggregate_candles(valid, timeframe_seconds)
    # Narrow native families first, the wide kernel last — no shuffle
    # ever moves the 119-column enriched rows.
    calculated = with_local_time(candles)
    calculated = with_session_flags(calculated)
    calculated = with_bollinger(calculated, blocked=blocked_windows)
    calculated = with_volume_spike(calculated, blocked=blocked_windows)
    calculated = enrich_indicators(calculated)
    anchors = fill_anchored_vwap(
        anchored_vwap_points(candles, f"{timeframe_seconds}s", flush_secs), candles
    )
    if output_dir is not None:
        sinks.write_append(invalid, f"{output_dir}/invalid_ticks")
        for name, df in (
            ("candles_1s", candles),
            ("candles_1s_calculated", calculated),
            ("anchored_vwap_points_1s", anchors),
        ):
            df.write.mode("overwrite").parquet(f"{output_dir}/{name}")
    return PipelineResult(
        invalid_ticks=invalid, candles=candles, calculated=calculated, anchors=anchors
    )
