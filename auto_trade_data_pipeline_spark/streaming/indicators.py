"""ST4 full form: streaming indicator enrichment with a rolling
warm-up tail.

The reference's streaming mode prepends a 10 000-row tail to every
micro-batch so recursive indicators (EMA cascades, Wilder smoothing,
SAR state) have history, then emits only the new rows
(``/root/reference/src/candle_to_calcs.py:647-655,691,770-779``).
This operator is that pattern as real keyed state: the tail lives in
the state store, the batch computation IS the batch kernel
(operators/indicators.py) run over tail+batch, and only batch rows
are emitted.

Fidelity note (same as the reference): indicators near a tail
boundary see truncated history — exact equality with a full batch
pass holds whenever the tail covers the series so far; beyond that
the divergence decays exponentially (EMA memory), which is the
trade the reference makes with its 10k-row buffer.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from auto_trade_data_pipeline_spark.operators.indicators import (
    INDICATOR_COLUMNS,
    _indicator_kernel,
    _SPARK_TYPES,
)

__all__ = ["streaming_indicators"]

_CANDLE_COLS = [
    "symbol", "timestamp", "open", "high", "low", "close",
    "volume", "number_of_trades", "vwap",
]

_STATE_SCHEMA = "buf string"


def _make_fn(buffer_rows: int):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        tail = pd.DataFrame(columns=_CANDLE_COLS)
        if state.exists:
            (buf_js,) = state.get
            raw = json.loads(buf_js)
            if raw["timestamp"]:
                tail = pd.DataFrame(raw)
                tail["timestamp"] = pd.to_datetime(tail["timestamp"])
                tail["symbol"] = symbol
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            yield pd.DataFrame(columns=_CANDLE_COLS + [n for n, _ in INDICATOR_COLUMNS])
            return
        batch = batch.sort_values("timestamp", kind="mergesort").reset_index(drop=True)
        combined = (
            pd.concat([tail[_CANDLE_COLS], batch[_CANDLE_COLS]], ignore_index=True)
            if len(tail)
            else batch[_CANDLE_COLS]
        )
        n_tail = len(tail)
        enriched = _indicator_kernel(combined.copy())
        out = enriched.iloc[n_tail:].reset_index(drop=True)

        keep = combined.iloc[max(0, len(combined) - buffer_rows) :]
        state.update(
            (
                json.dumps(
                    {
                        "timestamp": [
                            str(np.datetime64(t, "us")) for t in keep["timestamp"].to_numpy()
                        ],
                        **{
                            c: [None if pd.isna(v) else float(v) for v in keep[c]]
                            if c not in ("number_of_trades",)
                            else [int(v) for v in keep[c]]
                            for c in _CANDLE_COLS
                            if c not in ("symbol", "timestamp")
                        },
                    }
                ),
            )
        )
        yield out

    return fn


def streaming_indicators(candles: DataFrame, buffer_rows: int = 10_000) -> DataFrame:
    """Streaming twin of enrich_indicators: per-symbol keyed state
    carries the last `buffer_rows` bars (the reference's
    ROLLING_BUFFER_SIZE, ``:42``); each micro-batch runs the batch
    kernel over tail+batch and emits only the new rows."""
    out_fields = [
        T.StructField("symbol", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.DoubleType()),
        T.StructField("number_of_trades", T.LongType()),
        T.StructField("vwap", T.DoubleType()),
    ] + [T.StructField(name, _SPARK_TYPES[t], True) for name, t in INDICATOR_COLUMNS]
    return candles.groupBy("symbol").applyInPandasWithState(
        _make_fn(buffer_rows),
        outputStructType=T.StructType(out_fields),
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
