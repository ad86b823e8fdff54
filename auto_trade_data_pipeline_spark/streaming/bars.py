"""Streaming information-driven bars (volume bars) — the stateful
streaming twin of ``operators.bars.information_bars``.

State per symbol is O(1) forever: the running total of the activity
measure plus the accumulators of the single OPEN (partial) bar. Each
micro-batch extends the prefix sum, closes every bar whose threshold
was crossed, and carries the still-open bar forward. A bar is emitted
EXACTLY ONCE — in the micro-batch where a later bar opens — so the
replayed stream equals the batch bars minus the final (still open)
bar per symbol. That emission contract is itself relational, which is
what lets the corpus query carry a full SQL oracle for this stateful
operator (same pattern as the streaming CMS/KMV sketches).

Ordering contract: ticks must arrive per-symbol in (timestamp,
tick_id) order ACROSS micro-batches (each batch is sorted
internally); day-partitioned file replay satisfies this. Out-of-order
arrivals would need a watermark + reorder buffer upstream, at which
point the bar assignment is the same prefix-sum fold.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_volume_bars"]

_STATE_SCHEMA = "st string"

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("bar_id", T.LongType()),
        T.StructField("open_ts", T.StringType()),
        T.StructField("close_ts", T.StringType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.LongType()),
        T.StructField("n_ticks", T.LongType()),
    ]
)

_TS_FMT = "%Y-%m-%d %H:%M:%S"


def _make_fn(threshold: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"cum": 0, "bar": None}

        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            yield pd.DataFrame(columns=[f.name for f in _OUT_SCHEMA.fields])
            return
        batch = batch.sort_values(["timestamp", "tick_id"], kind="mergesort").reset_index(
            drop=True
        )

        out_rows = []
        cum = int(st["cum"])
        bar = st["bar"]  # dict or None
        for ts, price, vol in zip(
            batch["timestamp"], batch["price"], batch["vol_i"], strict=True
        ):
            bar_id = cum // threshold
            ts_s = pd.Timestamp(ts).strftime(_TS_FMT)
            if bar is not None and bar["bar_id"] != bar_id:
                out_rows.append(bar)
                bar = None
            if bar is None:
                bar = {
                    "bar_id": bar_id,
                    "open_ts": ts_s,
                    "close_ts": ts_s,
                    "open": float(price),
                    "high": float(price),
                    "low": float(price),
                    "close": float(price),
                    "volume": 0,
                    "n_ticks": 0,
                }
            bar["close_ts"] = ts_s
            bar["close"] = float(price)
            bar["high"] = max(bar["high"], float(price))
            bar["low"] = min(bar["low"], float(price))
            bar["volume"] += int(vol)
            bar["n_ticks"] += 1
            cum += int(vol)

        state.update((json.dumps({"cum": cum, "bar": bar}),))
        out = pd.DataFrame(
            out_rows, columns=[f.name for f in _OUT_SCHEMA.fields if f.name != "symbol"]
        )
        out.insert(0, "symbol", symbol)
        yield out

    return fn


def streaming_volume_bars(ticks: DataFrame, threshold: int) -> DataFrame:
    """ticks: streaming (symbol, timestamp, tick_id, price, vol_i
    BIGINT). Emits each volume bar once, when it closes."""
    return (
        ticks.groupBy("symbol")
        .applyInPandasWithState(
            _make_fn(int(threshold)),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
