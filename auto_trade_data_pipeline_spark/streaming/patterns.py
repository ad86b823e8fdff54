"""Streaming sequential-pattern detection (CEP) — the streaming form
of `corpus.trade.pattern_momentum_spike`: per symbol, find every tick
that completes three consecutive upticks and report whether a volume
spike (> 3x the trailing-20 average) confirms it within the next two
ticks.

Emission contract (what makes this oracle-able): a match for tick i is
emitted exactly when its confirmation window has fully arrived — i.e.
once two later ticks of that symbol exist. The batch twin states the
same rule relationally (`... AND lead(tick_id, 2) IS NOT NULL`), so
the replayed stream hash-matches a pure SQL oracle.

State is BOUNDED: the last `_BUF` ticks per symbol — enough to give
every not-yet-finalized tick its 20-tick volume history and 2 uptick
lags — plus a finalized-through watermark (the latest (ts, tick_id)
that has two successors). No timers, no unbounded buffers; same
tail-buffer discipline as `streaming/indicators.py`.

Ordering: rows are keyed internally by the MICROSECOND timestamp
string + tick_id (the same total order as the batch window's
`ORDER BY timestamp, tick_id`); the emitted `match_ts` is the
seconds-formatted prefix, matching the batch output format.
Micro-batches must arrive in within-symbol time order (the replay
contract shared by every streaming form in this repo).

Determinism note: volumes in this pipeline are integral doubles
(round(|value| * 100)), so the trailing mean is an exact integer sum
divided once — the kernel's mean equals the engines' window AVG
bit-for-bit regardless of summation order.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_pattern_matches"]

#: 2 unfinalized ticks + 20 volume lookback + 2 uptick lags + slack
_BUF = 25

_STATE_SCHEMA = "buf string, w_ts string, w_tick long"

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("match_ts", T.StringType()),
        T.StructField("tick_id", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("volume_confirmed", T.IntegerType()),
    ]
)


def _evaluate(rows: list[list], w_ts: str, w_tick: int):
    """Evaluate the pattern over time-ordered rows ([us_ts, price,
    volume, tick_id]). Rows at or before the (w_ts, w_tick) watermark
    were finalized in an earlier batch. A row is FINAL when two later
    rows exist. Returns (emissions, new_watermark)."""
    out = []
    n = len(rows)
    ups = [0] * n
    for i in range(1, n):
        ups[i] = 1 if rows[i][1] > rows[i - 1][1] else 0
    for i in range(n - 2):  # needs 2 successors to finalize
        if (rows[i][0], rows[i][3]) <= (w_ts, w_tick):
            continue
        # Lag flags for a just-finalizing row are always in-buffer
        # (it sits >= _BUF - 2 deep); rows nearer the head were
        # finalized before and are skipped by the watermark.
        if not (i >= 2 and ups[i] == 1 and ups[i - 1] == 1 and ups[i - 2] == 1):
            continue
        confirmed = 0
        for j in (i, i + 1, i + 2):
            lo = max(0, j - 20)
            prior = [r[2] for r in rows[lo:j]]
            if prior and rows[j][2] > 3 * (sum(prior) / len(prior)):
                confirmed = 1
                break
        out.append((rows[i][0], rows[i][3], rows[i][1], confirmed))
    if n >= 3:
        w_ts, w_tick = rows[n - 3][0], rows[n - 3][3]
    return out, w_ts, w_tick


def _fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (symbol,) = key
    if state.exists:
        buf_js, w_ts, w_tick = state.get
        buf = json.loads(buf_js)
    else:
        buf, w_ts, w_tick = [], "", -1
    new = []
    for pdf in pdfs:
        for ts, price, volume, tick_id in zip(
            pdf["ts"], pdf["price"], pdf["volume"], pdf["tick_id"]
        ):
            new.append([str(ts), float(price), float(volume), int(tick_id)])
    new.sort(key=lambda r: (r[0], r[3]))
    rows = buf + new
    emitted, w_ts, w_tick = _evaluate(rows, w_ts, w_tick)
    state.update((json.dumps(rows[-_BUF:]), w_ts, w_tick))
    yield pd.DataFrame(
        {
            "symbol": [symbol] * len(emitted),
            "match_ts": [e[0][:19] for e in emitted],
            "tick_id": [e[1] for e in emitted],
            "price": [e[2] for e in emitted],
            "volume_confirmed": [e[3] for e in emitted],
        }
    )


def streaming_pattern_matches(ticks: DataFrame) -> DataFrame:
    """Stateful streaming CEP over a tick stream with columns
    (symbol, timestamp, price, volume, tick_id). Emits one row per
    FINALIZED match (append semantics — a match appears exactly once,
    in the micro-batch where its second confirming tick arrives)."""
    vals = ticks.select(
        "symbol",
        F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "price",
        "volume",
        "tick_id",
    )
    return vals.groupBy("symbol").applyInPandasWithState(
        _fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
