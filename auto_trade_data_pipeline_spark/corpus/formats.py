"""Format round-trip queries — CSV and JSON source/sink coverage.

The reference ingests REST JSON and persists CSV/parquet
(``src/fetch_historical_trades_nvda.py:48`` writes the
``%Y-%m-%d %H:%M:%S.%f UTC`` timestamp format this module round-trips).
Each query here writes the tick tape to a text format under the
repo-local warehouse, reads it back through a DECLARED schema (never
inferSchema — SURVEY §2.1 S4), and aggregates; the DuckDB oracle
computes the same aggregate straight from the parquet events table,
so any loss in the write→read round trip (double shortest-repr,
microsecond timestamps, long ids) breaks the hash.

Scale note: text formats are the interchange path, not the analytic
store — reads carry an explicit schema so Catalyst still prunes and
pushes down, and the written layout inherits the upstream
partitioning (one file per task, no coalesce(1) bottleneck).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from auto_trade_data_pipeline_spark.corpus import register
from auto_trade_data_pipeline_spark.corpus.trade import TICKS_CTE
from auto_trade_data_pipeline_spark.sources import ticks_from_events

_TS_US_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"

_TICK_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("volume", T.DoubleType()),
        T.StructField("tick_id", T.LongType()),
    ]
)

_ROUNDTRIP_ORACLE = f"""
WITH {TICKS_CTE}
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_ticks,
       CAST(sum(CAST(round(volume) AS BIGINT)) AS BIGINT) AS vol_sum,
       CAST(sum(CAST(round(price * 10000) AS BIGINT)) AS BIGINT) AS price_e4_sum,
       CAST(sum(tick_id) AS BIGINT) AS id_sum,
       strftime(min(timestamp), '%Y-%m-%d %H:%M:%S.%f') AS ts_min,
       strftime(max(timestamp), '%Y-%m-%d %H:%M:%S.%f') AS ts_max
FROM ticks GROUP BY symbol
"""


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    ticks = ticks_from_events(spark, sf_dir)
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
        "roundtrip",
        tag,
        fmt,
    )
    writer = ticks.write.mode("overwrite").option("timestampFormat", _TS_US_SPARK)
    reader = spark.read.schema(_TICK_SCHEMA).option("timestampFormat", _TS_US_SPARK)
    if fmt == "csv":
        writer.option("header", "true").csv(path)
        back = reader.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
        back = reader.json(path)
    elif fmt == "orc":
        # Columnar binary format: native TIMESTAMP/DOUBLE types, no
        # text rendering involved — timestampFormat is a no-op here.
        writer.orc(path)
        back = spark.read.schema(_TICK_SCHEMA).orc(path)
    elif fmt == "xml":
        writer.option("rowTag", "tick").format("xml").save(path)
        back = reader.option("rowTag", "tick").format("xml").load(path)
    else:
        raise ValueError(f"unsupported round-trip format {fmt!r}")
    return back.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum(F.round("volume", 0).cast("long")).alias("vol_sum"),
        F.sum(F.expr("CAST(round(price * 10000) AS BIGINT)")).alias("price_e4_sum"),
        F.sum("tick_id").alias("id_sum"),
        F.date_format(F.min("timestamp"), _TS_US_SPARK).alias("ts_min"),
        F.date_format(F.max("timestamp"), _TS_US_SPARK).alias("ts_max"),
    )


@register("source_csv_roundtrip", _ROUNDTRIP_ORACLE, tags=("S4", "S5"))
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + schema-declared CSV source, proven lossless: the
    tick tape is written to CSV (microsecond timestampFormat, shortest
    round-trip double repr) and read back through the DECLARED tick
    schema; per-symbol counts, integer-scaled price/volume sums, id
    sums, and microsecond min/max timestamps must hash-match an oracle
    that never left parquet. Covers the reference's CSV persistence
    path (``src/fetch_historical_trades_nvda.py:48``)."""
    return _roundtrip(spark, sf_dir, "csv")


@register("source_json_roundtrip", _ROUNDTRIP_ORACLE, tags=("S4", "S5"))
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + schema-declared JSON source round trip —
    the REST-ingest interchange format (the reference's Polygon
    responses are JSON pages) pushed through the same losslessness
    gate as the CSV path: identical per-symbol aggregate hash as the
    straight-from-parquet oracle."""
    return _roundtrip(spark, sf_dir, "json")


@register("source_orc_roundtrip", _ROUNDTRIP_ORACLE, tags=("S4", "S5"))
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source round trip — the second columnar format a
    warehouse interop layer must speak (Hive/Trino estates are
    ORC-heavy). Binary columnar storage with native TIMESTAMP and
    DOUBLE types, predicate-pushdown-capable stripes, written with the
    upstream partitioning (one file per task). The same losslessness
    gate as CSV/JSON: per-symbol counts, integer-scaled sums, and
    microsecond min/max timestamps must hash-match the parquet-only
    oracle."""
    return _roundtrip(spark, sf_dir, "orc")


@register("source_xml_roundtrip", _ROUNDTRIP_ORACLE, tags=("S4", "S5"))
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + schema-declared XML source round trip (Spark 4
    built-in `xml` format, one <tick> element per row) — the
    enterprise-interchange format: written with microsecond
    timestampFormat and read back through the DECLARED tick schema
    (never inferSchema), pushed through the identical losslessness
    gate as the other text formats."""
    return _roundtrip(spark, sf_dir, "xml")


_SCHEMA_EVOLUTION_ORACLE = f"""
WITH {TICKS_CTE}
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_ticks,
       CAST(sum(CASE WHEN tick_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_v1,
       CAST(sum(CASE WHEN tick_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_v2,
       CAST(sum(CASE WHEN tick_id % 2 = 1
                     THEN CAST(round(volume) AS BIGINT) ELSE 0 END) AS BIGINT)
         AS vol_sum_v2,
       CAST(sum(CAST(round(price * 10000) AS BIGINT)) AS BIGINT) AS price_e4_sum
FROM ticks GROUP BY symbol
"""


@register("schema_evolution_merge", _SCHEMA_EVOLUTION_ORACLE, tags=("S4", "S5"))
def schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution, proven lossless: the tape is written
    as two generations under one table root — batch=1 with the v1
    schema (no ``volume`` column) and batch=2 with the v2 schema that
    added it — then read back in ONE scan with ``mergeSchema=true``
    (+ partition discovery recovering the ``batch`` column). Rows from
    v1 files must surface NULL volume, v2 rows their real volume, and
    the per-symbol counts / integer-scaled sums must hash-match an
    oracle that reconstructs the same split straight from parquet.
    This is the contract every long-lived 100 TB table depends on:
    old files are never rewritten when a column is added, and the
    merged read planner unions footer schemas per file (an O(files)
    driver step — bounded by compaction, not data volume)."""
    ticks = ticks_from_events(spark, sf_dir)
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
        "roundtrip",
        tag,
        "schema_evolution",
    )
    v1 = ticks.filter(F.col("tick_id") % 2 == 0).select(
        "symbol", "timestamp", "price", "tick_id"
    )
    v2 = ticks.filter(F.col("tick_id") % 2 == 1)
    v1.write.mode("overwrite").parquet(os.path.join(path, "batch=1"))
    v2.write.mode("overwrite").parquet(os.path.join(path, "batch=2"))
    back = (
        spark.read.option("mergeSchema", "true")
        .option("basePath", path)
        .parquet(path)
    )
    return back.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum(F.when(F.col("batch") == 1, 1).otherwise(0)).alias("n_v1"),
        F.sum(F.when(F.col("batch") == 2, 1).otherwise(0)).alias("n_v2"),
        F.sum(F.coalesce(F.round("volume", 0).cast("long"), F.lit(0))).alias(
            "vol_sum_v2"
        ),
        F.sum(F.expr("CAST(round(price * 10000) AS BIGINT)")).alias("price_e4_sum"),
    )
