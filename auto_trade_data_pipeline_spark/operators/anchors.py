"""Stateful anchor tracking + anchored VWAP (ST5-ST7 batch form).

The reference drives a per-symbol state machine over time-ordered
candles (``/root/reference/src/candle_to_calcs.py:210-311``, loop
``:657-675``):

- NY-date change resets all daily anchors (``:281-288``);
- first bar at NY 04:00 / 09:30 / 16:00 adds a daily close anchor,
  once per day (``:289-299``);
- a new daily high/low REPLACES the daily_high/daily_low anchor
  (``:301-311``);
- peak/valley bars (6 scale/direction flags) APPEND anchors
  (``:660-662``; the reference's ``max_per_type`` parameter is
  accepted but never enforced — accumulation is bounded by flushes);
- every ANCHOR_FLUSH_INTERVAL (300 s) all active anchors are
  snapshotted and cleared (``:664-675``); a final snapshot flushes at
  end of input;
- snapshots dedup keep-last on (symbol, timeframe, anchor_timestamp)
  ordered by snapshot time (``:183-193``).

Deterministic deviations (documented; SURVEY §7 hard-parts 4-5):
- the reference flushes on WALL clock (``time.time()``), which is
  irreproducible; we flush on EVENT time (>= 300 s of event time
  since the last flush), so replays are bit-identical;
- the reference snapshots against the chunk's last row
  (``current_idx = len(df)-1``, ``:236``) — a buffer artifact; we
  snapshot against the row that triggered the flush;
- anchor_idx/current_idx are global per-symbol row numbers (the
  reference's are buffer-relative);
- the keep-last dedup gets a deterministic anchor_type tiebreak.

Scale shape: one applyInPandas pass per symbol (the state is
inherently sequential per symbol — same constraint as the reference);
the anchored-VWAP fill is pure window + join work, no Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from auto_trade_data_pipeline_spark.functions import ta

__all__ = ["anchored_vwap_points", "fill_anchored_vwap"]

DAILY_ANCHOR_TYPES = ("daily_4am", "daily_930", "daily_4pm", "daily_high", "daily_low")
PEAK_SCALES = (("major", 10, 0.9), ("minor", 7, 0.7), ("micro", 5, 0.5))

ANCHOR_SCHEMA = (
    "symbol string, timeframe string, anchor_type string,"
    " anchor_timestamp timestamp, anchor_idx long, price_at_anchor double,"
    " current_snapshot_timestamp timestamp, current_idx long, anchored_vwap double"
)


def _make_kernel(timeframe: str, flush_secs: int):
    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("timestamp", kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        if n == 0:
            return pd.DataFrame(
                columns=[
                    "symbol", "timeframe", "anchor_type", "anchor_timestamp",
                    "anchor_idx", "price_at_anchor", "current_snapshot_timestamp",
                    "current_idx", "anchored_vwap",
                ]
            )
        symbol = pdf["symbol"].iloc[0]
        h_arr = pdf["high"].to_numpy(dtype=float)
        l_arr = pdf["low"].to_numpy(dtype=float)
        ts = pdf["timestamp"]
        local = ts.dt.tz_localize("UTC").dt.tz_convert("America/New_York")
        # Python-scalar lists for the state-machine loop (same values;
        # per-element numpy indexing boxes a scalar per access — the
        # ta.py loop discipline, round 10).
        h = h_arr.tolist()
        l = pdf["low"].to_numpy(dtype=float).tolist()  # noqa: E741
        c = pdf["close"].to_numpy(dtype=float).tolist()
        l_date = local.dt.date.to_numpy().tolist()
        l_hour = local.dt.hour.to_numpy().tolist()
        l_min = local.dt.minute.to_numpy().tolist()

        # Shared candidates/prominences across the three scales per
        # direction (ta.find_peaks_multi — exact-equal to per-scale
        # find_peaks, pinned in tests/test_indicators.py).
        specs = [(dist, prom) for _prefix, dist, prom in PEAK_SCALES]
        peak_idx = ta.find_peaks_multi(h_arr, specs)
        valley_idx = ta.find_peaks_multi(-l_arr, specs)
        flags = {}
        for (prefix, _d, _p), pi, vi in zip(PEAK_SCALES, peak_idx, valley_idx):
            pk = np.zeros(n, dtype=bool)
            vl = np.zeros(n, dtype=bool)
            pk[pi] = True
            vl[vi] = True
            flags[f"{prefix}_peak"] = pk.tolist()
            flags[f"{prefix}_valley"] = vl.tolist()
        flag_items = list(flags.items())

        # Timestamps as datetime64[ns] round-trip intact.
        ts_vals = ts.to_numpy()
        ts_ns = ts_vals.astype("datetime64[ns]").astype("int64").tolist()
        flush_ns = int(flush_secs * 1_000_000_000)

        active: dict[str, list[tuple[int, object, float]]] = {}
        cur_date = None
        added = {"daily_4am": False, "daily_930": False, "daily_4pm": False}
        day_high = day_low = None
        # Keep-last IN the kernel: each (anchor_type, anchor_idx) key
        # overwrites its previous snapshot row, so the kernel emits at
        # most one row per dedup key — the later row_number window
        # (and its exchange+sort) the operator used to pay is gone.
        # (anchor_timestamp is the candle timestamp at anchor_idx and
        # candle timestamps are unique per symbol, so (anchor_type,
        # anchor_idx) IS the operator's documented dedup key with the
        # constant symbol/timeframe dropped.)
        latest: dict[tuple[str, int], tuple] = {}
        last_flush_ns = ts_ns[0]

        def add(atype: str, idx: int, price: float, when) -> None:
            if atype in DAILY_ANCHOR_TYPES:
                active[atype] = []
            active.setdefault(atype, []).append((idx, when, price))

        def snapshot(idx: int, when) -> None:
            for atype, lst in active.items():
                for a_idx, a_ts, a_price in lst:
                    latest[(atype, a_idx)] = (
                        symbol, timeframe, atype, a_ts, a_idx, a_price, when, idx, None
                    )

        for i in range(n):
            when = ts_vals[i]
            if cur_date is None or l_date[i] != cur_date:
                cur_date = l_date[i]
                for atype in DAILY_ANCHOR_TYPES:
                    active.pop(atype, None)
                added = {k: False for k in added}
                day_high, day_low = h[i], l[i]
            if not added["daily_4am"] and l_hour[i] == 4 and l_min[i] == 0:
                add("daily_4am", i, c[i], when)
                added["daily_4am"] = True
            if not added["daily_930"] and l_hour[i] == 9 and l_min[i] == 30:
                add("daily_930", i, c[i], when)
                added["daily_930"] = True
            if not added["daily_4pm"] and l_hour[i] == 16 and l_min[i] == 0:
                add("daily_4pm", i, c[i], when)
                added["daily_4pm"] = True
            if day_high is None or h[i] > day_high:
                day_high = h[i]
                add("daily_high", i, h[i], when)
            if day_low is None or l[i] < day_low:
                day_low = l[i]
                add("daily_low", i, l[i], when)
            for atype, flag in flag_items:
                if flag[i]:
                    add(atype, i, h[i] if "peak" in atype else l[i], when)

            if ts_ns[i] - last_flush_ns >= flush_ns:
                snapshot(i, when)
                active.clear()
                last_flush_ns = ts_ns[i]

        snapshot(n - 1, ts_vals[n - 1])
        return pd.DataFrame(
            list(latest.values()),
            columns=[
                "symbol", "timeframe", "anchor_type", "anchor_timestamp",
                "anchor_idx", "price_at_anchor", "current_snapshot_timestamp",
                "current_idx", "anchored_vwap",
            ],
        )

    return _kernel


def anchored_vwap_points(
    candles: DataFrame, timeframe: str = "1s", flush_secs: int = 300
) -> DataFrame:
    """Replay the anchor state machine per symbol and emit the
    deduplicated ``anchored_vwap_points_1s`` table, keep-last by
    snapshot time.

    Documented deviation: the dedup key here is (symbol, timeframe,
    anchor_type, anchor_timestamp). The reference's key omits
    anchor_type (``src/candle_to_calcs.py:189-191``), which silently
    drops one of two DIFFERENT anchors landing on the same bar (e.g.
    a bar that is both the day's new high and new low trigger) —
    clearly unintended data loss we do not replicate.

    The keep-last dedup happens INSIDE the kernel (round 10): the
    whole key lives within one symbol group, so a per-key overwrite
    as snapshots replay IS keep-last-by-snapshot-time — the
    row_number window this operator used to run over the kernel
    output re-shuffled and re-sorted rows the kernel had already
    made unique (plan: 1 Exchange + 2 Sort + Window removed;
    tests/test_anchors.py pins key uniqueness and the keep-last
    row content)."""
    return candles.groupBy("symbol").applyInPandas(
        _make_kernel(timeframe, flush_secs), schema=ANCHOR_SCHEMA
    )


def fill_anchored_vwap(points: DataFrame, candles: DataFrame) -> DataFrame:
    """Fill the reference's NULL ``anchored_vwap`` placeholder
    (``src/candle_to_calcs.py:246``): volume-weighted average of
    candle closes over [anchor_timestamp, current_snapshot_timestamp].

    Shape: per-symbol cumulative sums via one window pass (exact
    prefix sums), then two broadcast-able equi joins on the candle
    timestamps — no range explosion, no Python."""
    w = (
        Window.partitionBy("symbol")
        .orderBy("timestamp")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = candles.select(
        "symbol",
        "timestamp",
        F.sum(F.col("close") * F.col("volume")).over(w).alias("__cpv"),
        F.sum("volume").over(w).alias("__cv"),
        (F.col("close") * F.col("volume")).alias("__pv"),
        F.col("volume").alias("__v"),
    )
    at_anchor = cum.select(
        "symbol",
        F.col("timestamp").alias("anchor_timestamp"),
        (F.col("__cpv") - F.col("__pv")).alias("__cpv_before"),
        (F.col("__cv") - F.col("__v")).alias("__cv_before"),
    )
    at_snap = cum.select(
        "symbol",
        F.col("timestamp").alias("current_snapshot_timestamp"),
        F.col("__cpv").alias("__cpv_snap"),
        F.col("__cv").alias("__cv_snap"),
    )
    joined = points.drop("anchored_vwap").join(
        at_anchor, ["symbol", "anchor_timestamp"], "left"
    ).join(at_snap, ["symbol", "current_snapshot_timestamp"], "left")
    vol = F.col("__cv_snap") - F.col("__cv_before")
    vwap = F.when(vol > 0, (F.col("__cpv_snap") - F.col("__cpv_before")) / vol)
    return joined.withColumn("anchored_vwap", vwap).drop(
        "__cpv_before", "__cv_before", "__cpv_snap", "__cv_snap"
    )
