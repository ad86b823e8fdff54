"""ST5-ST7 streaming form: the anchor state machine as a keyed
stateful streaming operator (``applyInPandasWithState``).

The reference's ``--stream`` mode replays the same per-symbol loop
over 1-minute event-time slices with a rolling tail buffer
(``/root/reference/src/candle_to_calcs.py:702-829``). Here the state
slot carries exactly what survives between micro-batches:

- the daily-anchor state (NY date, one-shot trigger flags, running
  day extremes) — ST5;
- the active-anchor map (serialized JSON) with event-time 300 s
  flushes — ST6; the final batch flush is the EOS flush — ST7;
- a bounded tail of recent bars (ts/high/low) so peak/valley
  detection has context across batch boundaries — ST4. As in the
  reference, streaming peaks are buffer-local: ``find_peaks`` runs
  on tail+batch, so confirmations near the buffer edge can differ
  from a global batch pass (the reference has the same property,
  ``:651-655``).

State is O(buffer_rows + active anchors) per symbol — bounded, no
stream-length growth.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from auto_trade_data_pipeline_spark.functions import ta
from auto_trade_data_pipeline_spark.operators.anchors import DAILY_ANCHOR_TYPES, PEAK_SCALES

__all__ = ["streaming_anchor_points"]

_OUT_SCHEMA = (
    "symbol string, timeframe string, anchor_type string,"
    " anchor_timestamp timestamp, price_at_anchor double,"
    " current_snapshot_timestamp timestamp"
)

#: cur_date, 4am/930/4pm one-shots, day extremes, flush clock,
#: active anchors (json), tail buffer (json arrays).
_STATE_SCHEMA = (
    "cur_date string, f4am boolean, f930 boolean, f4pm boolean,"
    " day_high double, day_low double, last_flush_ns bigint,"
    " anchors string, buf string"
)


def _make_fn(timeframe: str, flush_secs: int, buffer_rows: int):
    flush_ns = int(flush_secs * 1_000_000_000)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        if state.exists:
            (cur_date, f4am, f930, f4pm, day_high, day_low, last_flush_ns, anchors_js, buf_js) = state.get
            active: dict[str, list] = json.loads(anchors_js)
            buf = json.loads(buf_js)
        else:
            cur_date, f4am, f930, f4pm = None, False, False, False
            day_high = day_low = None
            last_flush_ns = None
            active = {}
            buf = {"ts": [], "high": [], "low": []}

        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            yield pd.DataFrame(
                columns=["symbol", "timeframe", "anchor_type", "anchor_timestamp",
                         "price_at_anchor", "current_snapshot_timestamp"]
            )
            return
        batch = batch.sort_values("timestamp", kind="mergesort").reset_index(drop=True)
        ts = batch["timestamp"]
        ts_vals = ts.to_numpy()
        ts_ns = ts_vals.astype("datetime64[ns]").astype("int64")
        h = batch["high"].to_numpy(dtype=float)
        l = batch["low"].to_numpy(dtype=float)  # noqa: E741
        c = batch["close"].to_numpy(dtype=float)
        local = ts.dt.tz_localize("UTC").dt.tz_convert("America/New_York")
        l_date = local.dt.date.astype(str).to_numpy()
        l_hour = local.dt.hour.to_numpy()
        l_min = local.dt.minute.to_numpy()

        # Peaks over tail + batch; only batch rows (offset >= n_tail)
        # produce anchors this round.
        n_tail = len(buf["ts"])
        full_h = np.concatenate([np.asarray(buf["high"], dtype=float), h])
        full_l = np.concatenate([np.asarray(buf["low"], dtype=float), l])
        flags = {}
        for prefix, dist, prom in PEAK_SCALES:
            pk = np.zeros(len(full_h), dtype=bool)
            vl = np.zeros(len(full_h), dtype=bool)
            pk[ta.find_peaks(full_h, dist, prom)] = True
            vl[ta.find_peaks(-full_l, dist, prom)] = True
            flags[f"{prefix}_peak"] = pk[n_tail:]
            flags[f"{prefix}_valley"] = vl[n_tail:]

        if last_flush_ns is None:
            last_flush_ns = int(ts_ns[0])

        out: list[tuple] = []

        def add(atype: str, price: float, when_iso: str) -> None:
            if atype in DAILY_ANCHOR_TYPES:
                active[atype] = []
            active.setdefault(atype, []).append([when_iso, price])

        def snapshot(when) -> None:
            for atype, lst in active.items():
                for a_ts, a_price in lst:
                    out.append(
                        (symbol, timeframe, atype, np.datetime64(a_ts), a_price, when)
                    )

        for i in range(len(batch)):
            when_iso = str(np.datetime64(ts_vals[i], "us"))
            if cur_date is None or l_date[i] != cur_date:
                cur_date = l_date[i]
                for atype in DAILY_ANCHOR_TYPES:
                    active.pop(atype, None)
                f4am = f930 = f4pm = False
                day_high, day_low = h[i], l[i]
            if not f4am and l_hour[i] == 4 and l_min[i] == 0:
                add("daily_4am", c[i], when_iso)
                f4am = True
            if not f930 and l_hour[i] == 9 and l_min[i] == 30:
                add("daily_930", c[i], when_iso)
                f930 = True
            if not f4pm and l_hour[i] == 16 and l_min[i] == 0:
                add("daily_4pm", c[i], when_iso)
                f4pm = True
            if h[i] > (day_high if day_high is not None else -np.inf):
                day_high = h[i]
                add("daily_high", h[i], when_iso)
            if l[i] < (day_low if day_low is not None else np.inf):
                day_low = l[i]
                add("daily_low", l[i], when_iso)
            for atype, flag in flags.items():
                if flag[i]:
                    add(atype, h[i] if "peak" in atype else l[i], when_iso)
            if ts_ns[i] - last_flush_ns >= flush_ns:
                snapshot(ts_vals[i])
                active.clear()
                last_flush_ns = int(ts_ns[i])

        # End-of-batch snapshot (ST7's EOS flush happens naturally on
        # the last batch; intermediate batches emit their snapshot too
        # so downstream dedup keep-last sees monotone progress).
        snapshot(ts_vals[-1])

        tail_from = max(0, len(batch) - buffer_rows)
        new_buf = {
            "ts": [str(np.datetime64(t, "us")) for t in ts_vals[tail_from:]],
            "high": [float(x) for x in h[tail_from:]],
            "low": [float(x) for x in l[tail_from:]],
        }
        state.update(
            (
                cur_date,
                bool(f4am),
                bool(f930),
                bool(f4pm),
                float(day_high) if day_high is not None else None,
                float(day_low) if day_low is not None else None,
                int(last_flush_ns),
                json.dumps(active),
                json.dumps(new_buf),
            )
        )
        yield pd.DataFrame(
            out,
            columns=["symbol", "timeframe", "anchor_type", "anchor_timestamp",
                     "price_at_anchor", "current_snapshot_timestamp"],
        )

    return fn


def streaming_anchor_points(
    candles: DataFrame,
    timeframe: str = "1s",
    flush_secs: int = 300,
    buffer_rows: int = 256,
) -> DataFrame:
    """Streaming anchored_vwap_points: per-symbol keyed state across
    micro-batches. Downstream, the same keep-last dedup as batch
    (by snapshot time) collapses repeated snapshots of one anchor."""
    return candles.groupBy("symbol").applyInPandasWithState(
        _make_fn(timeframe, flush_secs, buffer_rows),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
