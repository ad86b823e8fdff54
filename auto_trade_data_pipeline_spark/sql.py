"""SQL API surface: register the driver tables (and the derived tick
view) as temp views so users can drive the whole engine with
``spark.sql(...)`` — the same capability surface as the DataFrame
API, exercised by a pure-SQL corpus query.

Everything the DataFrame corpus can do is reachable from SQL (they
compile to the same Catalyst plans); this module pins that contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from auto_trade_data_pipeline_spark.sources import load_table, ticks_from_events

#: The driver's parquet tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every driver table as a temp view, plus the derived
    ``ticks`` view (the events->ticks mapping every trade query
    starts from). Views are lazy — registration reads only parquet
    footers; queries against them still get full pushdown/pruning."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    ticks_from_events(spark, sf_dir).createOrReplaceTempView("ticks")
    return [*TABLES, "ticks"]


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run an ANSI-SQL query over the registered views (registering
    them first) — the one-call SQL entry point."""
    register_views(spark, sf_dir)
    return spark.sql(query)
