"""Explicit StructType registry for every logical table.

The reference infers schemas on read and then asserts a hard-coded
column list (reference ``src/aggregator_candles.py:73-77,142-146``,
``src/candle_to_calcs.py:84-90``). We go one step stricter: every
table has a declared StructType; engine reads pass it to
``spark.read.schema(...)`` so nothing is ever inferred, and
:func:`assert_schema` gives the same reject-whole-input behavior the
reference has when columns are missing.

Types follow SURVEY.md §1.2: DoubleType for money/prices (the
reference uses float64, ``src/fetch_historical_trades_nvda.py:158``),
TimestampType stored UTC (session tz pinned to UTC), IntegerType 0/1
flags (not boolean — keeps oracle hash-equality simple).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference-native tables (SURVEY.md §1.1)
# ---------------------------------------------------------------------------

#: Raw trades. Reference row construction
#: ``src/fetch_historical_trades_nvda.py:155-160``; key (symbol, timestamp)
#: after dedup keep-last (``:245``). ``tick_id`` is ours: a monotonically
#: assigned ingest id used as the deterministic dedup / open-close
#: tiebreaker (pandas `keep='last'` is file-positional — SURVEY §2.4 note).
TICKS = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("volume", T.DoubleType(), True),
        T.StructField("tick_id", T.LongType(), True),
    ]
)

#: 1-second (parameterized) OHLCV candles. Column list
#: ``src/aggregator_candles.py:142``; vwap nullable when bucket volume = 0
#: (``:147,212``); key (symbol, timestamp) (``:124``).
CANDLES = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.DoubleType(), True),
        T.StructField("number_of_trades", T.LongType(), True),
        T.StructField("vwap", T.DoubleType(), True),
    ]
)

#: Anchor snapshots. Row construction ``src/candle_to_calcs.py:236-247``;
#: key (symbol, timeframe, anchor_timestamp) keep-last by snapshot ts
#: (``:189-191``).
ANCHORED_VWAP_POINTS = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("timeframe", T.StringType(), False),
        T.StructField("anchor_type", T.StringType(), False),
        T.StructField("anchor_timestamp", T.TimestampType(), False),
        T.StructField("anchor_idx", T.LongType(), True),
        T.StructField("price_at_anchor", T.DoubleType(), True),
        T.StructField("current_snapshot_timestamp", T.TimestampType(), True),
        T.StructField("current_idx", T.LongType(), True),
        T.StructField("anchored_vwap", T.DoubleType(), True),
    ]
)

#: Anchor types emitted by the daily state machine
#: (``src/candle_to_calcs.py:46,660``).
ANCHOR_TYPES = (
    "daily_4am",
    "daily_930",
    "daily_4pm",
    "daily_high",
    "daily_low",
    "micro_peak",
    "minor_peak",
    "major_peak",
    "micro_valley",
    "minor_valley",
    "major_valley",
)

# ---------------------------------------------------------------------------
# Driver synthetic tables (TESTDATA.md / FIXTURES.md §B)
# ---------------------------------------------------------------------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), True),
        T.StructField("l_partkey", T.LongType(), True),
        T.StructField("l_suppkey", T.LongType(), True),
        T.StructField("l_linenumber", T.IntegerType(), True),
        T.StructField("l_quantity", T.DoubleType(), True),
        T.StructField("l_extendedprice", T.DoubleType(), True),
        T.StructField("l_discount", T.DoubleType(), True),
        T.StructField("l_tax", T.DoubleType(), True),
        T.StructField("l_returnflag", T.StringType(), True),
        T.StructField("l_linestatus", T.StringType(), True),
        T.StructField("l_shipdate", T.TimestampType(), True),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

#: table name -> schema for the driver testdata dirs. Dimension tables
#: are loaded schema-inferred-free too but their shapes come from the
#: parquet footer; we only pin the ones the engine manipulates.
DRIVER_TABLES = {
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
    "lineitem": LINEITEM,
    "orders": ORDERS,
}


class SchemaMismatchError(ValueError):
    """Input rejected: observed schema does not carry the expected columns.

    Mirrors the reference's reject-whole-input behavior
    (``src/aggregator_candles.py:73-77``).
    """


def assert_schema(df: DataFrame, expected: T.StructType, table: str = "<df>") -> DataFrame:
    """Assert ``df`` contains every expected column with a compatible type.

    Extra columns are allowed (the reference tolerates them at
    ``src/candle_to_calcs.py:84-90`` by selecting expected ones);
    missing columns or wrong types reject the whole input.
    """
    actual = {f.name: f.dataType for f in df.schema.fields}
    missing = [f.name for f in expected.fields if f.name not in actual]
    if missing:
        raise SchemaMismatchError(f"{table}: missing columns {missing}; have {list(actual)}")
    wrong = [
        (f.name, str(actual[f.name]), str(f.dataType))
        for f in expected.fields
        if actual[f.name] != f.dataType
    ]
    if wrong:
        raise SchemaMismatchError(f"{table}: type mismatches {wrong}")
    return df.select(*[f.name for f in expected.fields])
