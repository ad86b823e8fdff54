"""TA-Lib-compatible indicator math in pure numpy.

TA-Lib is not installed in this environment, so these implement the
*published* TA-Lib algorithms (SMA-seeded EMAs, Wilder smoothing,
the documented SAR state machine, Tillson T3 cascade) from public
specifications. Every function mirrors TA-Lib's NaN warm-up behavior
(leading NaNs up to the indicator's lookback), because the reference
relies on `.fillna(...)` of exactly those NaNs
(``/root/reference/src/candle_to_calcs.py:386-438``).

All functions take/return 1-D float64 numpy arrays and run inside the
per-symbol `applyInPandas` kernel — one pass per group, no Spark
shuffle beyond the group-by.

Loop discipline (round-10 per-task-work pass, guide §4.2): the
inherently sequential recursions iterate over ``ndarray.tolist()``
Python floats with the output accumulated in a list, not over numpy
scalars with per-element ``out[i] =`` stores. CPython float arithmetic
and numpy float64 arithmetic are the same C-double IEEE operations in
the same order, so results are bit-identical (pinned per function in
tests/test_ta_loop_parity.py against the prior scalar-indexing forms),
but each element step drops the ndarray->np.float64 boxing and the
per-element ndarray __setitem__ — measured 1.4-2.4x per loop at 20k
rows, 41x for the fully vectorized rolling_mean.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "ema",
    "macd",
    "true_range",
    "atr",
    "adx_di",
    "psar",
    "t3",
    "rolling_mean",
    "find_peaks",
    "heikin_ashi",
    "cusum_events",
    "imbalance_bar_ids",
]


def imbalance_bar_ids(signed: np.ndarray, threshold: int) -> np.ndarray:
    """Imbalance-bar assignment (de Prado ch. 2, fixed-threshold
    form): accumulate SIGNED flow per tick; when |accumulator|
    exceeds ``threshold`` the current bar closes (the triggering tick
    is its last member) and the accumulator resets. Integer state
    only — the same exact reset-fold contract as `cusum_events`, so
    the oracle replays it as a BIGINT prefix list_reduce.

    Returns int64 bar ids (0-based) per tick, in input order.
    """
    n = len(signed)
    out = np.empty(n, dtype=np.int64)
    ss = np.asarray(signed).tolist()
    acc = 0
    bar = 0
    for i in range(n):
        out[i] = bar
        acc += int(ss[i])
        if acc > threshold or acc < -threshold:
            bar += 1
            acc = 0
    return out


def cusum_events(dp: np.ndarray, h: int) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric CUSUM filter (de Prado ch. 2, event-based sampling)
    on INTEGER increments: S+ accumulates positive drift (clamped at
    0 from below), S- negative drift, and an event fires when either
    exceeds ``h`` — the monitor then resets to 0. All state is int64,
    so the recursion is exact and the DuckDB oracle can replay it as
    a per-row prefix list_reduce with a BIGINT accumulator (no float
    drift anywhere).

    Returns (up_flags, dn_flags) int64 0/1 arrays aligned with dp;
    NaN-free integer input is the caller's contract (first-row dp=0).
    """
    n = len(dp)
    up = np.zeros(n, dtype=np.int64)
    dn = np.zeros(n, dtype=np.int64)
    dps = np.asarray(dp).tolist()
    sp = 0
    sn = 0
    for i in range(n):
        d = int(dps[i])
        sp = sp + d
        if sp < 0:  # max(0, sp + d), branch form
            sp = 0
        if sp > h:
            up[i] = 1
            sp = 0
        sn = sn + d
        if sn > 0:  # min(0, sn + d), branch form
            sn = 0
        if sn < -h:
            dn[i] = 1
            sn = 0
    return up, dn


def heikin_ashi(
    o: np.ndarray, h: np.ndarray, l: np.ndarray, c: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Heikin-Ashi smoothed candles (public charting definition):
    ha_close = (o+h+l+c)/4; ha_open recurses as the midpoint of the
    PREVIOUS ha_open/ha_close (seeded with (o+c)/2 on the first bar);
    ha_high/ha_low wrap the raw extremes around the smoothed body.
    The ha_open recursion is a left-to-right scalar fold — the
    cross-engine oracle replays exactly this arithmetic as a DuckDB
    list_reduce (same pattern as `ema`)."""
    n = len(o)
    hc = (o + h + l + c) / 4.0
    ho = _nan(n)
    if n == 0:
        return ho, _nan(0), _nan(0), hc
    hcs = hc.tolist()
    prev = (float(o[0]) + float(c[0])) / 2.0
    res = [prev]
    append = res.append
    for i in range(1, n):
        prev = (prev + hcs[i - 1]) / 2.0
        append(prev)
    ho[:] = res
    hh = np.maximum(h, np.maximum(ho, hc))
    hl = np.minimum(l, np.minimum(ho, hc))
    return ho, hh, hl, hc


def _nan(n: int) -> np.ndarray:
    out = np.empty(n)
    out.fill(np.nan)
    return out


def ema(x: np.ndarray, period: int) -> np.ndarray:
    """TA-Lib EMA: first valid value at index period-1 is the SMA of
    the first `period` inputs; thereafter the usual recursion with
    k = 2/(period+1). Inputs may lead with NaNs (cascaded EMAs) —
    the window starts at the first finite value."""
    n = len(x)
    out = _nan(n)
    if n == 0:
        return out
    xs = x.tolist()
    start = 0
    while start < n and not math.isfinite(xs[start]):
        start += 1
    if n - start < period:
        return out
    k = 2.0 / (period + 1.0)
    seed_end = start + period
    # Sequential-fold seed (not np.mean): numpy's pairwise summation
    # is not reproducible outside numpy, and a left-to-right fold is —
    # the cross-engine EMA oracle replays this exact arithmetic.
    acc = 0.0
    for v in xs[start:seed_end]:
        acc += v
    prev = acc / period
    res = [prev]
    append = res.append
    for v in xs[seed_end:]:
        prev = (v - prev) * k + prev
        append(prev)
    out[seed_end - 1:] = res
    return out


def macd(
    close: np.ndarray, fast: int = 12, slow: int = 26, signal: int = 9
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """TA-Lib MACD(fast, slow, signal): macd line = EMA(fast)-EMA(slow)
    valid from index slow-1; signal = EMA(signal) of the macd line;
    hist = macd - signal. Lookback = slow-1 + signal-1."""
    fast_e = ema(close, fast)
    slow_e = ema(close, slow)
    line = fast_e - slow_e  # NaN until slow-1
    sig = ema(line, signal)
    hist = line - sig
    # TA-Lib emits all three aligned from the histogram's first valid
    # index; earlier macd-line values stay NaN in its output buffers.
    first = slow - 1 + signal - 1
    if len(close) > first:
        line = line.copy()
        line[:first] = np.nan
    return line, sig, hist


def true_range(high: np.ndarray, low: np.ndarray, close: np.ndarray) -> np.ndarray:
    """TR[0] = high-low; TR[i] = max(h-l, |h-prev_close|, |l-prev_close|)."""
    tr = high - low
    if len(tr) > 1:
        pc = close[:-1]
        tr = tr.copy()
        tr[1:] = np.maximum(tr[1:], np.maximum(np.abs(high[1:] - pc), np.abs(low[1:] - pc)))
    return tr


def atr(high: np.ndarray, low: np.ndarray, close: np.ndarray, period: int = 14) -> np.ndarray:
    """Wilder ATR: seed = SMA of TR[0..period-1] at index period-1
    ... TA-Lib seeds at index `period` using TR[1..period] (TR[0]
    excluded because it has no previous close); then
    atr[i] = (atr[i-1]*(period-1) + tr[i]) / period."""
    n = len(high)
    out = _nan(n)
    if n <= period:
        return out
    trs = true_range(high, low, close).tolist()
    # Sequential-fold seed (not np.mean) — reproducible cross-engine;
    # the ATR oracle replays this exact arithmetic (see ta.ema).
    acc = 0.0
    for v in trs[1 : period + 1]:
        acc += v
    prev = acc / period
    pm1 = float(period - 1)
    res = [prev]
    append = res.append
    for v in trs[period + 1:]:
        prev = (prev * pm1 + v) / period
        append(prev)
    out[period:] = res
    return out


def adx_di(
    high: np.ndarray, low: np.ndarray, close: np.ndarray, period: int = 14
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """TA-Lib ADX / PLUS_DI / MINUS_DI (Wilder):

    +DM[i] = up if up > down and up > 0 else 0   (up = h[i]-h[i-1])
    -DM[i] = down likewise                       (down = l[i-1]-l[i])
    Wilder-smoothed sums over `period`; DI = 100*smDM/smTR;
    DX = 100*|+DI - -DI| / (+DI + -DI);
    ADX = Wilder average of DX, first at index 2*period-1... TA-Lib's
    lookback: DI valid from `period`, ADX from 2*period-1 + 1 - 1.
    Returns (adx, plus_di, minus_di).
    """
    n = len(high)
    adx_out, pdi_out, mdi_out = _nan(n), _nan(n), _nan(n)
    if n <= period:
        return adx_out, pdi_out, mdi_out
    up = np.diff(high)
    down = -np.diff(low)
    pdm = np.where((up > down) & (up > 0), up, 0.0).tolist()
    mdm = np.where((down > up) & (down > 0), down, 0.0).tolist()
    trl = true_range(high, low, close)[1:].tolist()  # aligned with dm (index 1..)

    # Wilder accumulation: initial sums over the first `period` diffs.
    # Sequential folds (not ndarray.sum) — reproducible cross-engine;
    # the ADX oracle replays this exact arithmetic (see ta.ema).
    sm_p = sm_m = sm_tr = 0.0
    for d in range(period):
        sm_p += pdm[d]
        sm_m += mdm[d]
        sm_tr += trl[d]

    dx_vals = []
    dx_append = dx_vals.append
    pdi_res = []
    mdi_res = []
    pdi_append = pdi_res.append
    mdi_append = mdi_res.append
    if sm_tr == 0.0:
        pdi = mdi = 0.0
    else:
        pdi = 100.0 * sm_p / sm_tr
        mdi = 100.0 * sm_m / sm_tr
    pdi_append(pdi)
    mdi_append(mdi)
    s = pdi + mdi
    dx_append(100.0 * abs(pdi - mdi) / s if s > 0 else 0.0)
    for i in range(period, n - 1):  # diff index i corresponds to bar i+1
        sm_p = sm_p - sm_p / period + pdm[i]
        sm_m = sm_m - sm_m / period + mdm[i]
        sm_tr = sm_tr - sm_tr / period + trl[i]
        if sm_tr == 0.0:
            pdi = mdi = 0.0
        else:
            pdi = 100.0 * sm_p / sm_tr
            mdi = 100.0 * sm_m / sm_tr
        pdi_append(pdi)
        mdi_append(mdi)
        s = pdi + mdi
        dx_append(100.0 * abs(pdi - mdi) / s if s > 0 else 0.0)
    pdi_out[period:] = pdi_res
    mdi_out[period:] = mdi_res

    # ADX: first value at bar 2*period-1 is the mean of the first
    # `period` DX values; Wilder recursion afterwards.
    if n >= 2 * period:
        acc = 0.0
        for v in dx_vals[:period]:  # sequential-fold seed, as above
            acc += v
        prev = acc / period
        pm1 = float(period - 1)
        adx_res = [prev]
        adx_append = adx_res.append
        for j in range(period, len(dx_vals)):
            prev = (prev * pm1 + dx_vals[j]) / period
            adx_append(prev)
        adx_out[2 * period - 1:] = adx_res
    return adx_out, pdi_out, mdi_out


def psar(
    high: np.ndarray, low: np.ndarray, accel: float = 0.02, maximum: float = 0.2
) -> np.ndarray:
    """TA-Lib Parabolic SAR (Wilder's state machine). Output starts at
    index 1 (index 0 is NaN). Initial direction from one bar of
    -DM (TA-Lib convention): short if l[0]-l[1] > h[1]-h[0] and > 0.
    """
    n = len(high)
    out = _nan(n)
    if n < 2:
        return out
    hs = high.tolist()
    ls = low.tolist()
    down = ls[0] - ls[1]
    up = hs[1] - hs[0]
    is_long = not (down > up and down > 0)
    af = accel
    if is_long:
        ep = hs[1]
        sar = ls[0]
    else:
        ep = ls[1]
        sar = hs[0]

    res = []
    append = res.append
    for i in range(1, n):
        hi = hs[i]
        lo = ls[i]
        hp = hs[i - 1]
        lp = ls[i - 1]
        if is_long:
            if lo < sar:  # reversal to short
                is_long = False
                sar = max(ep, hi, hp)
                append(sar)
                af = accel
                ep = lo
                sar = sar + af * (ep - sar)
                sar = max(sar, hi, hp)
            else:
                append(sar)
                if hi > ep:
                    ep = hi
                    af = min(af + accel, maximum)
                sar = sar + af * (ep - sar)
                sar = min(sar, lo, lp)
        else:
            if hi > sar:  # reversal to long
                is_long = True
                sar = min(ep, lo, lp)
                append(sar)
                af = accel
                ep = hi
                sar = sar + af * (ep - sar)
                sar = min(sar, lo, lp)
            else:
                append(sar)
                if lo < ep:
                    ep = lo
                    af = min(af + accel, maximum)
                sar = sar + af * (ep - sar)
                sar = max(sar, hi, hp)
    out[1:] = res
    return out


def t3(x: np.ndarray, period: int = 60, vfactor: float = 0.7) -> np.ndarray:
    """Tillson T3: six cascaded SMA-seeded EMAs; T3 = c1*e6 + c2*e5 +
    c3*e4 + c4*e3 with the published coefficients. Lookback =
    6*(period-1)."""
    e1 = ema(x, period)
    e2 = ema(e1, period)
    e3 = ema(e2, period)
    e4 = ema(e3, period)
    e5 = ema(e4, period)
    e6 = ema(e5, period)
    v = vfactor
    c1 = -(v**3)
    c2 = 3 * v**2 + 3 * v**3
    c3 = -6 * v**2 - 3 * v - 3 * v**3
    c4 = 1 + 3 * v + v**3 + 3 * v**2
    return c1 * e6 + c2 * e5 + c3 * e4 + c4 * e3


def rolling_mean(x: np.ndarray, window: int, min_periods: int | None = None) -> np.ndarray:
    """pandas-style trailing rolling mean (NaN until min_periods)."""
    if min_periods is None:
        min_periods = window
    n = len(x)
    out = _nan(n)
    c = np.concatenate([[0.0], np.cumsum(x)])
    # Vectorized form of `out[i] = (c[i+1] - c[lo]) / cnt`: the
    # per-element subtract-then-divide is the identical IEEE pair,
    # just evaluated elementwise (cumsum is sequential either way).
    idx = np.arange(n)
    lo = np.maximum(0, idx - window + 1)
    cnt = idx - lo + 1
    valid = cnt >= min_periods
    out[valid] = (c[idx[valid] + 1] - c[lo[valid]]) / cnt[valid]
    return out


# ---------------------------------------------------------------------------
# scipy.signal.find_peaks subset (distance + prominence)
# ---------------------------------------------------------------------------


def _local_maxima(x: np.ndarray) -> np.ndarray:
    """Plateau-aware local maxima (scipy semantics: midpoint of flat
    tops, boundaries never peaks). Vectorized over the sign-change
    points of ``diff(x)``: a plateau [s, e] is a peak iff the change
    entering s is a rise and the change leaving e is a fall (plateaus
    touching either boundary have no such change on that side and are
    correctly excluded). Bit-identical to the scalar scan it replaced
    (tests/test_indicators.py pins equality on adversarial shapes)."""
    n = len(x)
    if n < 3:
        return np.empty(0, dtype=np.intp)
    d = np.sign(np.diff(x))
    nz = np.flatnonzero(d)
    if len(nz) < 2:
        return np.empty(0, dtype=np.intp)
    sv = d[nz]
    up = (sv[:-1] > 0) & (sv[1:] < 0)
    # plateau start = index after the rising change, end = index of
    # the falling change; scipy emits the floor midpoint.
    return ((nz[:-1][up] + 1 + nz[1:][up]) // 2).astype(np.intp)


def _select_by_distance(peaks: np.ndarray, priority: np.ndarray, distance: float) -> np.ndarray:
    """scipy's distance filter: iterate peaks by descending priority,
    suppress any unkept peak within `distance` samples."""
    keep = np.ones(len(peaks), dtype=bool)
    order = np.argsort(priority, kind="stable")[::-1]
    for idx in order:
        if not keep[idx]:
            continue
        j = idx - 1
        while j >= 0 and peaks[idx] - peaks[j] < distance:
            keep[j] = False
            j -= 1
        j = idx + 1
        while j < len(peaks) and peaks[j] - peaks[idx] < distance:
            keep[j] = False
            j += 1
    return keep


def _sparse_table(x: np.ndarray, op) -> list[np.ndarray]:
    """Doubling sparse table: ``levels[k][i] = op-fold of
    x[i : i + 2**k]`` (``op`` = np.maximum for the greater-bound
    descent, np.minimum for range-min queries). O(n log n) build, all
    whole-array numpy. NaN propagates through both ops — the
    greater-bound descent relies on that (NaN blocks are never
    skipped)."""
    levels = [x]
    k = 1
    while (1 << k) <= len(x):
        half = 1 << (k - 1)
        prev = levels[-1]
        levels.append(op(prev[: len(prev) - half], prev[half:]))
        k += 1
    return levels


def _greater_bound_at(
    x: np.ndarray,
    pos: np.ndarray,
    levels: list[np.ndarray],
    side: int,
) -> np.ndarray:
    """Nearest index strictly greater than ``x[pos]`` on one side of
    each query position (``side=-1``: nearest j < pos with x[j] >
    x[pos], else -1; ``side=+1``: nearest j > pos, else n).

    Vectorized binary lifting over the range-max table: from each
    query, greedily skip the largest 2^k block whose max is <= the
    query value; the skip distances decompose like binary digits, so
    every query finishes in exactly one pass over the levels —
    worst-case O(|pos| log n), data-independent. (A pointer-jumping
    formulation tried first degraded to O(n^2) on a monotone run
    followed by a higher plateau: chains through already-resolved
    nodes advance only one ancestor per round. The block-skip descent
    has no such case.)

    NaN samples act as comparison walls on both sides: a block
    containing NaN has a NaN max, NaN <= v is False, so the block is
    never skipped and the descent stops ON the NaN — identical to the
    scalar stacks' accept-on-not-<= rule (pinned in the equality
    test)."""
    n = len(x)
    v = x[pos]
    q = pos + side
    for k in range(len(levels) - 1, -1, -1):
        w = 1 << k
        if side < 0:
            start = q - w + 1
            can = start >= 0
        else:
            start = q
            can = q + w - 1 <= n - 1
        if not can.any():
            continue
        skip = can.copy()
        skip[can] = levels[k][start[can]] <= v[can]
        q[skip] += side * w
    return q


def _strictly_greater_bounds(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """For every index i: nearest j<i with x[j] > x[i] (or -1) and
    nearest j>i with x[j] > x[i] (or n). Vectorized block-skip descent
    (see :func:`_greater_bound_at`); integer-exact, pinned against the
    scalar monotonic-stack reference in tests/test_indicators.py."""
    n = len(x)
    pos = np.arange(n, dtype=np.intp)
    levels = _sparse_table(x, np.maximum)
    return (
        _greater_bound_at(x, pos, levels, -1),
        _greater_bound_at(x, pos, levels, +1),
    )


def _prominences(x: np.ndarray, peaks: np.ndarray) -> np.ndarray:
    """scipy peak prominence: walk left/right from each peak to the
    first strictly higher sample (or boundary), base = min of each
    walk, prominence = height - max(left_min, right_min).

    Computed without per-peak walks (O(n^2) on random walks):
    strictly-greater bounds via the block-skip descent, queried ONLY
    at the peaks, + range-min via a sparse table — O(n log n) total,
    data-independent. Two sparse tables are needed (range-max for the
    bounds, range-min for the RMQ), but never simultaneously: the max
    table is freed before the min table is built, so peak temporary
    memory per task stays one O(n log n) table — the figure the
    giant-single-series note in the kernel docs assumes."""
    if len(peaks) == 0:
        return np.empty(0)
    max_levels = _sparse_table(x, np.maximum)
    left_lo = _greater_bound_at(x, peaks, max_levels, -1) + 1
    right_hi = _greater_bound_at(x, peaks, max_levels, +1) - 1
    del max_levels

    levels = _sparse_table(x, np.minimum)

    def rmq(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
        """Elementwise min over [lo, hi] inclusive (lo <= hi)."""
        span = hi - lo + 1
        ks = np.floor(np.log2(span)).astype(np.intp)
        out = np.empty(len(lo))
        for kk in np.unique(ks):
            m = ks == kk
            w = 1 << int(kk)
            out[m] = np.minimum(levels[kk][lo[m]], levels[kk][hi[m] - w + 1])
        return out

    left_min = rmq(left_lo, peaks)
    right_min = rmq(peaks, right_hi)
    return x[peaks] - np.maximum(left_min, right_min)


def find_peaks(x: np.ndarray, distance: float, prominence: float) -> np.ndarray:
    """scipy.signal.find_peaks(x, distance=d, prominence=p) — the
    subset the reference uses (``src/candle_to_calcs.py:528-558``):
    local maxima -> distance filter (by height priority) -> prominence
    threshold. Returns peak indices."""
    peaks = _local_maxima(np.asarray(x, dtype=float))
    if len(peaks) == 0:
        return peaks
    if distance is not None and distance >= 1:
        keep = _select_by_distance(peaks, x[peaks], distance)
        peaks = peaks[keep]
    proms = _prominences(x, peaks)
    return peaks[proms >= prominence]


def find_peaks_multi(
    x: np.ndarray, specs: list[tuple[float, float]]
) -> list[np.ndarray]:
    """:func:`find_peaks` at several (distance, prominence) scales over
    the SAME series, sharing the scale-independent work: the plateau
    candidates, the sparse tables, and each candidate's prominence
    depend only on ``x``, so they are computed once instead of once per
    scale (the kernel runs three scales on high and three on -low —
    this cuts the peak family's per-task time roughly in half).

    Result equality with per-scale :func:`find_peaks` is exact: a
    peak's prominence is a property of (x, index) alone — computing it
    for every candidate and filtering after the distance selection
    yields the same survivors as computing it on the survivors
    (pinned in tests/test_indicators.py)."""
    x = np.asarray(x, dtype=float)
    cands = _local_maxima(x)
    if len(cands) == 0:
        return [cands.copy() for _ in specs]
    proms = _prominences(x, cands)
    prio = x[cands]
    out = []
    for distance, prominence in specs:
        if distance is not None and distance >= 1:
            keep = _select_by_distance(cands, prio, distance)
        else:
            keep = np.ones(len(cands), dtype=bool)
        out.append(cands[keep & (proms >= prominence)])
    return out


def kalman_filter(z: np.ndarray, q: float, r: float) -> np.ndarray:
    """1-D random-walk Kalman filter over an observation sequence
    (state = level, process noise q, observation noise r): the
    optimal recursive smoother behind adaptive moving averages.
    Seed x = z[0], p = 1; then pp = p + q, k = pp / (pp + r),
    x += k * (z - x), p = (1 - k) * pp — scalar IEEE doubles in a
    fixed order so a DuckDB struct-accumulator list_reduce replays
    the recursion bit-for-bit (the EMA/PSAR oracle pattern)."""
    z = np.asarray(z, dtype=float)
    out = np.empty(len(z))
    if len(z) == 0:
        return out
    zs = z.tolist()
    x = zs[0]
    p = 1.0
    res = [x]
    append = res.append
    for v in zs[1:]:
        pp = p + q
        k = pp / (pp + r)
        x = x + k * (v - x)
        p = (1.0 - k) * pp
        append(x)
    out[:] = res
    return out


def supertrend(
    high: np.ndarray,
    low: np.ndarray,
    close: np.ndarray,
    period: int = 10,
    mult: float = 3.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Supertrend bands: basic bands hl2 +/- mult*ATR(period) pass
    through the band-ratchet recursion (upper band only moves DOWN
    while price stays below it, lower band only UP while price stays
    above), and the trend flips when the close crosses the active
    band. Convention: the first defined index (the ATR seed index,
    i = period) starts in downtrend (dir = -1, line = upper band).
    Returns (line, dir) with NaN/0 before the seed. Scalar IEEE
    doubles in a fixed order — the DuckDB oracle replays the same
    fold (the PSAR/Kalman pattern)."""
    n = len(close)
    line = _nan(n)
    dirn = np.zeros(n)
    a = atr(high, low, close, period)
    if n <= period:
        return line, dirn
    hs = high.tolist()
    ls = low.tolist()
    cs = close.tolist()
    avs = a.tolist()
    fub = flb = 0.0
    d = -1
    line_res = []
    dir_res = []
    lappend = line_res.append
    dappend = dir_res.append
    for i in range(period, n):
        hl2 = (hs[i] + ls[i]) / 2
        bub = hl2 + mult * avs[i]
        blb = hl2 - mult * avs[i]
        if i == period:
            fub, flb, d = bub, blb, -1
        else:
            pc = cs[i - 1]
            fub = bub if (bub < fub or pc > fub) else fub
            flb = blb if (blb > flb or pc < flb) else flb
            if d == -1:
                d = 1 if cs[i] > fub else -1
            else:
                d = -1 if cs[i] < flb else 1
        lappend(flb if d == 1 else fub)
        dappend(d)
    line[period:] = line_res
    dirn[period:] = dir_res
    return line, dirn


def holt_linear(z: np.ndarray, alpha: float, beta: float) -> tuple[np.ndarray, np.ndarray]:
    """Holt's linear (double exponential) smoothing — level + trend,
    NO seasonal term (round-4 advice: the name says what it is; the
    conventional "Holt-Winters" denotes the triple/seasonal method,
    which this is not — ``holt_winters`` remains as a deprecated
    alias): l = alpha*z + (1-alpha)*(l_prev + b), then
    b = beta*(l - l_prev) + (1-beta)*b — scalar IEEE doubles in this
    exact order so a DuckDB struct-accumulator list_reduce replays the
    coupled recursion bit-for-bit (the kalman_filter oracle pattern).
    Seed l = z[0], b = 0. Returns (level, trend) arrays."""
    z = np.asarray(z, dtype=float)
    lvl = np.empty(len(z))
    trd = np.empty(len(z))
    if len(z) == 0:
        return lvl, trd
    zs = z.tolist()
    l = zs[0]  # noqa: E741
    b = 0.0
    one_a = 1.0 - alpha
    one_b = 1.0 - beta
    lres = [l]
    tres = [b]
    lappend = lres.append
    tappend = tres.append
    for v in zs[1:]:
        lp = l
        l = alpha * v + one_a * (lp + b)  # noqa: E741
        b = beta * (l - lp) + one_b * b
        lappend(l)
        tappend(b)
    lvl[:] = lres
    trd[:] = tres
    return lvl, trd


#: Deprecated alias — this is Holt's DOUBLE (linear) smoothing, not
#: the seasonal triple method the Holt-Winters name conventionally
#: means. Kept so existing callers keep working.
holt_winters = holt_linear
