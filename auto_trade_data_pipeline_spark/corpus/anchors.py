"""Anchor corpus (ST5-ST7 batch form): the anchored_vwap_points table
from the per-symbol state machine, the filled anchored VWAP, and an
oracle-checked daily key-level companion query.

The state machine itself is inherently sequential (rows-only at the
driver; pinned by pytest including a DST-boundary day — SURVEY §7
hard-part 4). The daily key levels — what the daily anchors converge
to at end of day — ARE relational, and get a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.corpus import register
from auto_trade_data_pipeline_spark.corpus.trade import CANDLES_CTE, TS_FMT_DUCK, TS_FMT_SPARK
from auto_trade_data_pipeline_spark.operators.anchors import (
    anchored_vwap_points,
    fill_anchored_vwap,
)
from auto_trade_data_pipeline_spark.operators.candles import aggregate_candles
from auto_trade_data_pipeline_spark.sources import ticks_from_events

_NY = "CAST(timestamp AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York' AS TIMESTAMP)"


def _candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return aggregate_candles(ticks_from_events(spark, sf_dir), 1)


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return anchored_vwap_points(_candles(spark, sf_dir), "1s", flush_secs=300)


@register("anchored_vwap_points", None, tags=("ST5", "ST6", "ST7", "bench"))
def anchored_vwap_points_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's fourth output table
    (``src/candle_to_calcs.py:236-247``): per-symbol anchor snapshots
    from the daily/peak state machine with event-time 300 s flushes,
    deduped keep-last per anchor. Rows-only (stateful replay)."""
    p = _points(spark, sf_dir)
    return p.select(
        "symbol",
        "timeframe",
        "anchor_type",
        F.date_format("anchor_timestamp", TS_FMT_SPARK).alias("anchor_ts"),
        "anchor_idx",
        F.round("price_at_anchor", 4).alias("price_at_anchor"),
        F.date_format("current_snapshot_timestamp", TS_FMT_SPARK).alias("snapshot_ts"),
        "current_idx",
        "anchored_vwap",
    )


@register("anchored_vwap_filled", None, tags=("ST5", "J5"))
def anchored_vwap_filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The anchored VWAP the reference leaves as a NULL placeholder
    (``:246``), actually computed: per-symbol cumulative prefix sums +
    two equi joins (no range explosion). Rows-only (depends on the
    stateful anchor table)."""
    candles = _candles(spark, sf_dir)
    filled = fill_anchored_vwap(anchored_vwap_points(candles, "1s", 300), candles)
    return filled.select(
        "symbol",
        "anchor_type",
        F.date_format("anchor_timestamp", TS_FMT_SPARK).alias("anchor_ts"),
        F.date_format("current_snapshot_timestamp", TS_FMT_SPARK).alias("snapshot_ts"),
        F.round("price_at_anchor", 4).alias("price_at_anchor"),
        F.round("anchored_vwap", 4).alias("anchored_vwap"),
    )


_FILL_ORACLE = f"""
WITH {CANDLES_CTE},
ny AS (
  SELECT *, CAST({_NY} AS DATE) AS ny_date FROM candles
),
anch AS (
  SELECT symbol, ny_date, min(timestamp) AS anchor_timestamp
  FROM ny GROUP BY symbol, ny_date
),
snaps AS (
  SELECT symbol, ny_date, max(timestamp) AS snap_ts
  FROM ny GROUP BY symbol, ny_date, date_trunc('minute', timestamp)
),
pts AS (
  SELECT s.symbol, a.anchor_timestamp, s.snap_ts
  FROM snaps s JOIN anch a ON s.symbol = a.symbol AND s.ny_date = a.ny_date
)
SELECT p.symbol,
       strftime(p.anchor_timestamp, '{TS_FMT_DUCK}') AS anchor_ts,
       strftime(p.snap_ts, '{TS_FMT_DUCK}') AS snapshot_ts,
       CASE WHEN sum(c.volume) > 0
            THEN round(sum(c.close * c.volume) / sum(c.volume), 4) END AS anchored_vwap
FROM pts p
JOIN candles c ON c.symbol = p.symbol
              AND c.timestamp >= p.anchor_timestamp AND c.timestamp <= p.snap_ts
GROUP BY p.symbol, p.anchor_timestamp, p.snap_ts
"""


@register("anchored_vwap_fill", _FILL_ORACLE, tags=("ST5", "J5"))
def anchored_vwap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The anchored-VWAP FILL stage (``fill_anchored_vwap``) in
    isolation, against a deterministic SQL-expressible anchor fixture:
    anchor = first candle of each (symbol, NY day), snapshot = last
    candle of each minute — i.e. session-anchored VWAP sampled per
    minute. The oracle recomputes each window directly; the operator
    uses per-symbol prefix sums + two equi joins (one window pass, no
    range explosion), so this green row certifies the J5-style fill
    math the stateful table (rows-only) reuses."""
    candles = _candles(spark, sf_dir)
    ny_date = F.to_date(F.from_utc_timestamp("timestamp", "America/New_York"))
    c = candles.withColumn("ny_date", ny_date)
    anch = c.groupBy("symbol", "ny_date").agg(F.min("timestamp").alias("anchor_timestamp"))
    snaps = c.groupBy(
        "symbol", "ny_date", F.date_trunc("minute", "timestamp").alias("minute")
    ).agg(F.max("timestamp").alias("current_snapshot_timestamp"))
    pts = snaps.join(anch, ["symbol", "ny_date"]).select(
        "symbol",
        "anchor_timestamp",
        "current_snapshot_timestamp",
        F.lit(None).cast("double").alias("anchored_vwap"),
    )
    filled = fill_anchored_vwap(pts, candles)
    return filled.select(
        "symbol",
        F.date_format("anchor_timestamp", TS_FMT_SPARK).alias("anchor_ts"),
        F.date_format("current_snapshot_timestamp", TS_FMT_SPARK).alias("snapshot_ts"),
        F.round("anchored_vwap", 4).alias("anchored_vwap"),
    )


_DAILY_LEVELS_ORACLE = f"""
WITH {CANDLES_CTE},
ny AS (
  SELECT *, CAST({_NY} AS DATE) AS ny_date FROM candles
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY symbol, ny_date ORDER BY high DESC, timestamp) AS rh,
         row_number() OVER (PARTITION BY symbol, ny_date ORDER BY low ASC, timestamp) AS rl,
         row_number() OVER (PARTITION BY symbol, ny_date ORDER BY timestamp) AS rf,
         row_number() OVER (PARTITION BY symbol, ny_date ORDER BY timestamp DESC) AS rz
  FROM ny
)
SELECT symbol,
       strftime(ny_date, '%Y-%m-%d') AS ny_day,
       max(high) AS day_high,
       max(CASE WHEN rh = 1 THEN strftime(timestamp, '{TS_FMT_DUCK}') END) AS day_high_ts,
       min(low) AS day_low,
       max(CASE WHEN rl = 1 THEN strftime(timestamp, '{TS_FMT_DUCK}') END) AS day_low_ts,
       max(CASE WHEN rf = 1 THEN open END) AS day_open,
       max(CASE WHEN rz = 1 THEN close END) AS day_close,
       count(*) AS bars
FROM ranked
GROUP BY symbol, ny_date
"""


@register("daily_key_levels", _DAILY_LEVELS_ORACLE, tags=("ST5", "A7"))
def daily_key_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the daily_high/daily_low anchors converge to by end of NY
    day (first-extreme timestamps, deterministic earliest-bar
    tiebreak) plus day open/close — the relational companion to the
    state machine, exercising the same NY-session semantics with a
    full oracle."""
    c = _candles(spark, sf_dir)
    ny_date = F.to_date(F.from_utc_timestamp("timestamp", "America/New_York"))
    d = c.withColumn("ny_date", ny_date)
    return d.groupBy("symbol", "ny_date").agg(
        F.max("high").alias("day_high"),
        F.date_format(
            F.min_by("timestamp", F.struct((-F.col("high")).alias("k"), F.col("timestamp"))),
            TS_FMT_SPARK,
        ).alias("day_high_ts"),
        F.min("low").alias("day_low"),
        F.date_format(
            F.min_by("timestamp", F.struct(F.col("low").alias("k"), F.col("timestamp"))),
            TS_FMT_SPARK,
        ).alias("day_low_ts"),
        F.min_by("open", "timestamp").alias("day_open"),
        F.max_by("close", "timestamp").alias("day_close"),
        F.count(F.lit(1)).alias("bars"),
    ).select(
        "symbol",
        F.date_format("ny_date", "yyyy-MM-dd").alias("ny_day"),
        "day_high",
        "day_high_ts",
        "day_low",
        "day_low_ts",
        "day_open",
        "day_close",
        "bars",
    )
