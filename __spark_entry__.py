"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the full corpus from
``auto_trade_data_pipeline_spark.corpus`` — one named query per
implemented operator of SURVEY.md §2, each with a DuckDB oracle where
the semantics are SQL-expressible (recursive/stateful ops are
rows-only by design).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from auto_trade_data_pipeline_spark.corpus import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 1-second OHLCV+VWAP candles (reference stage 2,
    ``src/aggregator_candles.py:181-226``) over events-as-ticks at
    sf0.001."""
    from auto_trade_data_pipeline_spark.corpus.trade import candles_1s

    return candles_1s(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
