"""Sources & sinks: schema-asserting scans, append/upsert sinks, and
the REST-paginated batch source adapter."""

from auto_trade_data_pipeline_spark.sources.files import (
    load_table,
    read_candles,
    read_ticks,
    ticks_from_events,
)

__all__ = ["load_table", "read_ticks", "read_candles", "ticks_from_events"]
