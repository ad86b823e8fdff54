"""Stage-3 enrichment queries that are native-window expressible
(SURVEY §2.5): session flags W12, Bollinger W6, volume spike W10,
running daily extrema A7, gap detection W13, trend labels W8.

Inputs are the 1-second candles built from events-as-ticks, mirroring
the reference pipeline order (candles → enrichment,
``src/candle_to_calcs.py``). Oracles reuse the shared candle CTE so
both engines derive from identical intermediates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.corpus import register
from auto_trade_data_pipeline_spark.corpus.trade import (
    CANDLES_CTE,
    TS_FMT_DUCK,
    TS_FMT_SPARK,
)
from auto_trade_data_pipeline_spark.operators.candles import aggregate_candles
from auto_trade_data_pipeline_spark.operators.windows import (
    SESSION_FLAGS,
    gap_report,
    symbol_window,
    with_local_time,
    with_running_daily_extrema,
    with_session_flags,
    with_trend_labels,
    with_typical_price,
)
from auto_trade_data_pipeline_spark.sources import ticks_from_events

#: DuckDB rendering of from_utc_timestamp(ts, 'America/New_York')
_NY = "CAST(timestamp AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York' AS TIMESTAMP)"


def _candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return aggregate_candles(ticks_from_events(spark, sf_dir), 1)


_SESSION_ORACLE = f"""
WITH {CANDLES_CTE},
loc AS (
  SELECT symbol, timestamp, {_NY} AS local_timestamp FROM candles
)
SELECT symbol,
       strftime(timestamp, '{TS_FMT_DUCK}') AS ts,
       strftime(local_timestamp, '%Y-%m-%d') AS local_date,
       hour(local_timestamp) AS local_hour,
       minute(local_timestamp) AS local_minute,
       CASE WHEN hour(local_timestamp) >= 0 AND hour(local_timestamp) < 2 THEN 1 ELSE 0 END AS is_overnight_early,
       CASE WHEN hour(local_timestamp) >= 2 AND hour(local_timestamp) < 4 THEN 1 ELSE 0 END AS is_overnight_late,
       CASE WHEN hour(local_timestamp) >= 4 AND hour(local_timestamp) < 8 THEN 1 ELSE 0 END AS is_early_morning,
       CASE WHEN hour(local_timestamp) >= 8 AND hour(local_timestamp) < 9 THEN 1 ELSE 0 END AS is_premarket_early,
       CASE WHEN hour(local_timestamp) = 9 AND minute(local_timestamp) < 30 THEN 1 ELSE 0 END AS is_premarket_morn,
       CASE WHEN (hour(local_timestamp) = 9 AND minute(local_timestamp) >= 30) OR hour(local_timestamp) = 10 THEN 1 ELSE 0 END AS is_morning,
       CASE WHEN hour(local_timestamp) = 11 OR (hour(local_timestamp) = 12 AND minute(local_timestamp) < 30) THEN 1 ELSE 0 END AS is_late_morning,
       CASE WHEN (hour(local_timestamp) = 12 AND minute(local_timestamp) >= 30) OR hour(local_timestamp) = 13 THEN 1 ELSE 0 END AS is_midday,
       CASE WHEN hour(local_timestamp) = 14 OR (hour(local_timestamp) = 15 AND minute(local_timestamp) < 30) THEN 1 ELSE 0 END AS is_early_afternoon,
       CASE WHEN (hour(local_timestamp) = 15 AND minute(local_timestamp) >= 30) OR (hour(local_timestamp) = 16 AND minute(local_timestamp) < 30) THEN 1 ELSE 0 END AS is_late_afternoon,
       CASE WHEN (hour(local_timestamp) = 16 AND minute(local_timestamp) >= 30) OR (hour(local_timestamp) = 17 AND minute(local_timestamp) < 1) THEN 1 ELSE 0 END AS is_closing,
       CASE WHEN (hour(local_timestamp) = 17 AND minute(local_timestamp) >= 1) OR hour(local_timestamp) >= 18 THEN 1 ELSE 0 END AS is_afterhours
FROM loc
"""


@register("session_flags", _SESSION_ORACLE, tags=("W12",))
def session_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12 mutually-exclusive NY-session flags + local-time derivation
    (``src/candle_to_calcs.py:352-379,642-645``)."""
    c = with_session_flags(with_local_time(_candles(spark, sf_dir)))
    return c.select(
        "symbol",
        F.date_format("timestamp", TS_FMT_SPARK).alias("ts"),
        F.date_format("local_date", "yyyy-MM-dd").alias("local_date"),
        "local_hour",
        "local_minute",
        *SESSION_FLAGS,
    )


_ROLLING_ORACLE = f"""
WITH {CANDLES_CTE},
w AS (
  SELECT symbol, timestamp, close, volume, high, low,
         count(close) OVER roll20 AS cnt20,
         avg(close) OVER roll20 AS sma20,
         stddev_pop(close) OVER roll20 AS sd20,
         avg(volume) OVER roll60 AS rolling_avg_volume,
         max(high) OVER daily AS running_day_high,
         min(low) OVER daily AS running_day_low
  FROM candles
  WINDOW
    roll20 AS (PARTITION BY symbol ORDER BY timestamp ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
    roll60 AS (PARTITION BY symbol ORDER BY timestamp ROWS BETWEEN 59 PRECEDING AND CURRENT ROW),
    daily AS (PARTITION BY symbol, CAST({_NY} AS DATE) ORDER BY timestamp
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
b AS (
  SELECT *,
         CASE WHEN cnt20 >= 20 THEN sma20 ELSE close END AS bb_mid,
         CASE WHEN cnt20 >= 20 THEN sma20 + 2 * sd20 ELSE close END AS bb_upper,
         CASE WHEN cnt20 >= 20 THEN sma20 - 2 * sd20 ELSE close END AS bb_lower
  FROM w
)
SELECT symbol,
       strftime(timestamp, '{TS_FMT_DUCK}') AS ts,
       round(bb_mid, 4) AS bb_mid,
       round(bb_upper, 4) AS bb_upper,
       round(bb_lower, 4) AS bb_lower,
       round(bb_upper - bb_lower, 4) AS bb_width,
       round(CASE WHEN bb_upper - bb_lower != 0
                  THEN (close - bb_lower) / (bb_upper - bb_lower) ELSE 0 END, 4) AS bb_pos,
       CASE WHEN close > bb_upper OR close < bb_lower THEN 1 ELSE 0 END AS bb_breakout,
       round(rolling_avg_volume, 4) AS rolling_avg_volume,
       CASE WHEN volume > rolling_avg_volume * 1.5 THEN 1 ELSE 0 END AS is_volume_spike,
       running_day_high,
       running_day_low
FROM b
"""


@register("rolling_window_features", _ROLLING_ORACLE, tags=("W6", "W10", "A7"))
def rolling_window_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger(20,2) + volume-spike(60,1.5×) + running daily
    extrema (``src/candle_to_calcs.py:419-425,517-526,301-311``).
    The bounded ROWS frames run through the blocked evaluator
    (operators/blocked.py): block-level parallelism with overlap
    carry — identical hashes to the symbol-global window, no
    one-task-per-symbol serialization at 100 TB."""
    from auto_trade_data_pipeline_spark.operators.windows import (
        with_rolling_features_blocked,
    )

    c = with_running_daily_extrema(
        with_rolling_features_blocked(_candles(spark, sf_dir))
    )
    return c.select(
        "symbol",
        F.date_format("timestamp", TS_FMT_SPARK).alias("ts"),
        F.round("bb_mid", 4).alias("bb_mid"),
        F.round("bb_upper", 4).alias("bb_upper"),
        F.round("bb_lower", 4).alias("bb_lower"),
        F.round("bb_width", 4).alias("bb_width"),
        F.round("bb_pos", 4).alias("bb_pos"),
        "bb_breakout",
        F.round("rolling_avg_volume", 4).alias("rolling_avg_volume"),
        "is_volume_spike",
        "running_day_high",
        "running_day_low",
    )


_GAP_ORACLE = f"""
WITH {CANDLES_CTE},
g AS (
  SELECT symbol, timestamp,
         (epoch_us(timestamp) - epoch_us(lag(timestamp) OVER (PARTITION BY symbol ORDER BY timestamp)))
           / 1000000.0 AS gap_s
  FROM candles
),
f AS (
  SELECT symbol, timestamp, gap_s,
         row_number() OVER (PARTITION BY symbol ORDER BY timestamp) AS rn
  FROM g
  WHERE gap_s > 1.5
)
SELECT symbol,
       count(*) AS gap_count,
       max(gap_s) AS max_gap_seconds,
       array_to_string(
         list_sort(list(strftime(timestamp, '%Y-%m-%d %H:%M:%S.%f')) FILTER (WHERE rn <= 5)),
         ',') AS gap_starts
FROM f
GROUP BY symbol
"""


@register("gap_report", _GAP_ORACLE, tags=("W13", "O2"))
def gap_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-gap detection per symbol with top-5 gap starts
    (``src/candle_to_calcs.py:113-128``)."""
    return gap_report(_candles(spark, sf_dir), gap_seconds=1.5, top_n=5)


_TREND_ORACLE = f"""
WITH {CANDLES_CTE},
s AS (
  SELECT symbol, timestamp, high, low, close,
         coalesce(close - lag(close, 60) OVER (PARTITION BY symbol ORDER BY timestamp), 0) AS slope
  FROM candles
)
SELECT symbol,
       strftime(timestamp, '{TS_FMT_DUCK}') AS ts,
       round(slope, 6) AS slope,
       CASE WHEN slope > 0.2 THEN 1 ELSE 0 END AS is_uptrend,
       CASE WHEN slope < -0.2 THEN 1 ELSE 0 END AS is_downtrend,
       CASE WHEN NOT (slope > 0.2 OR slope < -0.2) THEN 1 ELSE 0 END AS is_no_trend,
       round((high + low + close) / 3, 6) AS typical_price
FROM s
"""


@register("trend_labels", _TREND_ORACLE, tags=("W8", "W1"))
def trend_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend labels over a 60-row close diff plus typical price W1.

    The close-diff slope is exactly the reference's ``t3_slope`` in
    its warm-up region (below 354 rows ``t3`` is close-filled, so
    ``t3.diff(60) == close.diff(60)``, ``src/candle_to_calcs.py:429-452``)
    — which keeps this query SQL-oracle-able. The REAL t3-based
    labels (is_uptrend/... from the T3 cascade) ship from the
    indicator kernel: see ``indicators_recursive_pack`` and
    ``full_enrichment`` (corpus/indicators.py)."""
    c = with_typical_price(_candles(spark, sf_dir))
    c = c.withColumn(
        "slope",
        F.coalesce(F.col("close") - F.lag("close", 60).over(symbol_window()), F.lit(0.0)),
    )
    c = with_trend_labels(c, slope_col="slope")
    return c.select(
        "symbol",
        F.date_format("timestamp", TS_FMT_SPARK).alias("ts"),
        F.round("slope", 6).alias("slope"),
        "is_uptrend",
        "is_downtrend",
        "is_no_trend",
        F.round("typical_price", 6).alias("typical_price"),
    )


# ---------------------------------------------------------------------------
# P9: default-column projection (initialize_output_columns)
# ---------------------------------------------------------------------------

from auto_trade_data_pipeline_spark.operators.projection import (  # noqa: E402
    DEFAULT_COLUMNS,
    initialize_output_columns,
)


def _default_projection_oracle() -> str:
    lits = ",\n       ".join(
        f"CAST({v} AS DOUBLE) AS {name}" for name, v in DEFAULT_COLUMNS.items()
    )
    return f"""
WITH {CANDLES_CTE}
SELECT symbol,
       strftime(timestamp, '{TS_FMT_DUCK}') AS bucket_ts,
       {lits}
FROM candles
"""


@register("default_projection", _default_projection_oracle(), tags=("P9",))
def default_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 (``src/candle_to_calcs.py:316-350``): pre-create all 106
    derived output columns with defaults (0.0; is_no_trend=1.0) on the
    candle table — pure select extension, literals folded by Catalyst,
    zero data movement."""
    c = _candles(spark, sf_dir)
    out = initialize_output_columns(c.select("symbol", "timestamp"))
    return out.select(
        "symbol",
        F.date_format("timestamp", TS_FMT_SPARK).alias("bucket_ts"),
        *DEFAULT_COLUMNS.keys(),
    )
