"""Structured Streaming variants (ST1-ST4, SURVEY §2.9).

The reference simulates micro-batch streaming with a hand-rolled
pandas loop (``/root/reference/src/candle_to_calcs.py:702-829``:
1-minute event-time slices, a 10k-row rolling buffer, wall-clock
sleeps). Spark-first, those become:

- ST1 micro-batch trigger  -> ``readStream`` + ``trigger(availableNow
  | processingTime)`` (replay vs live);
- ST2 windowed candles     -> ``groupBy(window(ts, '1 second'),
  symbol)`` with a watermark, append mode;
- ST3 streaming dedup      -> ``withWatermark + dropDuplicates``;
- ST4 bounded state buffer -> ``applyInPandasWithState`` carrying
  per-symbol running state across batches (the reference's rolling
  tail, done with real state instead of a buffer concat);
- ST8 late data            -> the watermark policy itself — an
  improvement over the reference, which silently mis-buckets late
  rows (SURVEY §2.9 ST8).

Checkpointed sinks give exactly-once where the reference relies on
keyed dedup for idempotence.

Spark 4's ``transformWithStateInPandas`` is the successor API for the
stateful ops here (timers, multiple state variables, TTL); it needs a
working ``google.protobuf`` Python package, which this container
lacks, so the ops stay on ``applyInPandasWithState`` — migrating is a
per-operator mechanical change (value state + timer registration).
"""

from auto_trade_data_pipeline_spark.streaming.anchors import (  # noqa: F401
    streaming_anchor_points,
)
from auto_trade_data_pipeline_spark.streaming.indicators import (  # noqa: F401
    streaming_indicators,
)
from auto_trade_data_pipeline_spark.streaming.joins import (  # noqa: F401
    interval_join_after_anchor,
    interval_left_outer_orphans,
)
from auto_trade_data_pipeline_spark.streaming.candles import (  # noqa: F401
    read_table_stream,
    read_ticks_stream,
    run_available_now,
    streaming_candles,
    streaming_candles_cascade,
    streaming_dedup,
    streaming_running_vwap,
)
from auto_trade_data_pipeline_spark.streaming.sink import (  # noqa: F401
    apply_upsert_batch,
    committed_batches,
    stream_upsert_writer,
)
