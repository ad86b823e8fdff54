"""Bit-exactness pin for the round-10 TA loop rewrite.

functions/ta.py's sequential recursions now iterate over
``ndarray.tolist()`` Python floats (guide §4.2 per-task work); CPython
float arithmetic and numpy float64 arithmetic are the same C-double
IEEE ops, so results must be IDENTICAL to the prior scalar-indexing
forms. This module keeps the prior forms as executable references and
asserts array_equal (NaN-aware) over adversarial shapes — any drift,
even one ulp, is a failure (the DuckDB oracles replay these exact
folds).
"""

from __future__ import annotations

import numpy as np
import pytest

from auto_trade_data_pipeline_spark.functions import ta


# --- reference (pre-round-10) forms: numpy scalar indexing ----------------


def _nan(n):
    out = np.empty(n)
    out.fill(np.nan)
    return out


def ref_ema(x, period):
    n = len(x)
    out = _nan(n)
    if n == 0:
        return out
    start = 0
    while start < n and not np.isfinite(x[start]):
        start += 1
    if n - start < period:
        return out
    k = 2.0 / (period + 1.0)
    seed_end = start + period
    acc = 0.0
    for v in x[start:seed_end]:
        acc += float(v)
    prev = acc / period
    out[seed_end - 1] = prev
    for i in range(seed_end, n):
        prev = (x[i] - prev) * k + prev
        out[i] = prev
    return out


def ref_atr(high, low, close, period=14):
    n = len(high)
    out = _nan(n)
    if n <= period:
        return out
    tr = ta.true_range(high, low, close)
    acc = 0.0
    for v in tr[1 : period + 1]:
        acc += float(v)
    prev = acc / period
    out[period] = prev
    for i in range(period + 1, n):
        prev = (prev * (period - 1) + tr[i]) / period
        out[i] = prev
    return out


def ref_adx_di(high, low, close, period=14):
    n = len(high)
    adx_out, pdi_out, mdi_out = _nan(n), _nan(n), _nan(n)
    if n <= period:
        return adx_out, pdi_out, mdi_out
    up = np.diff(high)
    down = -np.diff(low)
    plus_dm = np.where((up > down) & (up > 0), up, 0.0)
    minus_dm = np.where((down > up) & (down > 0), down, 0.0)
    tr = ta.true_range(high, low, close)[1:]
    sm_p = sm_m = sm_tr = 0.0
    for d in range(period):
        sm_p += float(plus_dm[d])
        sm_m += float(minus_dm[d])
        sm_tr += float(tr[d])

    def _di(sp, sm, st):
        if st == 0.0:
            return 0.0, 0.0
        return 100.0 * sp / st, 100.0 * sm / st

    dx_vals = []
    pdi, mdi = _di(sm_p, sm_m, sm_tr)
    pdi_out[period], mdi_out[period] = pdi, mdi
    s = pdi + mdi
    dx_vals.append(100.0 * abs(pdi - mdi) / s if s > 0 else 0.0)
    for i in range(period, n - 1):
        sm_p = sm_p - sm_p / period + plus_dm[i]
        sm_m = sm_m - sm_m / period + minus_dm[i]
        sm_tr = sm_tr - sm_tr / period + tr[i]
        pdi, mdi = _di(sm_p, sm_m, sm_tr)
        pdi_out[i + 1], mdi_out[i + 1] = pdi, mdi
        s = pdi + mdi
        dx_vals.append(100.0 * abs(pdi - mdi) / s if s > 0 else 0.0)
    if n >= 2 * period:
        dx = np.asarray(dx_vals)
        acc = 0.0
        for v in dx[:period]:
            acc += float(v)
        prev = acc / period
        adx_out[2 * period - 1] = prev
        for j in range(period, len(dx)):
            prev = (prev * (period - 1) + dx[j]) / period
            adx_out[period + j] = prev
    return adx_out, pdi_out, mdi_out


def ref_psar(high, low, accel=0.02, maximum=0.2):
    n = len(high)
    out = _nan(n)
    if n < 2:
        return out
    down = low[0] - low[1]
    up = high[1] - high[0]
    is_long = not (down > up and down > 0)
    af = accel
    if is_long:
        ep = high[1]
        sar = low[0]
    else:
        ep = low[1]
        sar = high[0]
    for i in range(1, n):
        if is_long:
            if low[i] < sar:
                is_long = False
                sar = max(ep, high[i], high[i - 1])
                out[i] = sar
                af = accel
                ep = low[i]
                sar = sar + af * (ep - sar)
                sar = max(sar, high[i], high[i - 1])
            else:
                out[i] = sar
                if high[i] > ep:
                    ep = high[i]
                    af = min(af + accel, maximum)
                sar = sar + af * (ep - sar)
                sar = min(sar, low[i], low[i - 1])
        else:
            if high[i] > sar:
                is_long = True
                sar = min(ep, low[i], low[i - 1])
                out[i] = sar
                af = accel
                ep = high[i]
                sar = sar + af * (ep - sar)
                sar = min(sar, low[i], low[i - 1])
            else:
                out[i] = sar
                if low[i] < ep:
                    ep = low[i]
                    af = min(af + accel, maximum)
                sar = sar + af * (ep - sar)
                sar = max(sar, high[i], high[i - 1])
    return out


def ref_rolling_mean(x, window, min_periods=None):
    if min_periods is None:
        min_periods = window
    n = len(x)
    out = _nan(n)
    c = np.concatenate([[0.0], np.cumsum(x)])
    for i in range(n):
        lo = max(0, i - window + 1)
        cnt = i - lo + 1
        if cnt >= min_periods:
            out[i] = (c[i + 1] - c[lo]) / cnt
    return out


def ref_kalman(z, q, r):
    z = np.asarray(z, dtype=float)
    out = np.empty(len(z))
    if len(z) == 0:
        return out
    x = float(z[0])
    p = 1.0
    out[0] = x
    for t in range(1, len(z)):
        pp = p + q
        k = pp / (pp + r)
        x = x + k * (float(z[t]) - x)
        p = (1.0 - k) * pp
        out[t] = x
    return out


def ref_heikin_ashi(o, h, l, c):  # noqa: E741
    n = len(o)
    hc = (o + h + l + c) / 4.0
    ho = _nan(n)
    if n == 0:
        return ho, _nan(0), _nan(0), hc
    prev = (o[0] + c[0]) / 2.0
    ho[0] = prev
    for i in range(1, n):
        prev = (prev + hc[i - 1]) / 2.0
        ho[i] = prev
    hh = np.maximum(h, np.maximum(ho, hc))
    hl = np.minimum(l, np.minimum(ho, hc))
    return ho, hh, hl, hc


def ref_supertrend(high, low, close, period=10, mult=3.0):
    n = len(close)
    line = _nan(n)
    dirn = np.zeros(n)
    a = ref_atr(high, low, close, period)
    if n <= period:
        return line, dirn
    fub = flb = 0.0
    d = -1
    for i in range(period, n):
        hl2 = (float(high[i]) + float(low[i])) / 2
        bub = hl2 + mult * float(a[i])
        blb = hl2 - mult * float(a[i])
        if i == period:
            fub, flb, d = bub, blb, -1
        else:
            pc = float(close[i - 1])
            fub = bub if (bub < fub or pc > fub) else fub
            flb = blb if (blb > flb or pc < flb) else flb
            if d == -1:
                d = 1 if float(close[i]) > fub else -1
            else:
                d = -1 if float(close[i]) < flb else 1
        line[i] = flb if d == 1 else fub
        dirn[i] = d
    return line, dirn


def ref_holt(z, alpha, beta):
    z = np.asarray(z, dtype=float)
    lvl = np.empty(len(z))
    trd = np.empty(len(z))
    if len(z) == 0:
        return lvl, trd
    l = float(z[0])  # noqa: E741
    b = 0.0
    lvl[0], trd[0] = l, b
    for t in range(1, len(z)):
        lp = l
        l = alpha * float(z[t]) + (1.0 - alpha) * (lp + b)  # noqa: E741
        b = beta * (l - lp) + (1.0 - beta) * b
        lvl[t], trd[t] = l, b
    return lvl, trd


def ref_cusum(dp, h):
    n = len(dp)
    up = np.zeros(n, dtype=np.int64)
    dn = np.zeros(n, dtype=np.int64)
    sp = 0
    sn = 0
    for i in range(n):
        d = int(dp[i])
        sp = max(0, sp + d)
        if sp > h:
            up[i] = 1
            sp = 0
        sn = min(0, sn + d)
        if sn < -h:
            dn[i] = 1
            sn = 0
    return up, dn


def ref_imbalance(signed, threshold):
    n = len(signed)
    out = np.zeros(n, dtype=np.int64)
    acc = 0
    bar = 0
    for i in range(n):
        out[i] = bar
        acc += int(signed[i])
        if acc > threshold or acc < -threshold:
            bar += 1
            acc = 0
    return out


# --- the pin ---------------------------------------------------------------


def _series(rng, n, kind):
    if n == 0:
        return np.empty(0)
    if kind == "walk":
        return np.cumsum(rng.normal(0, 1, n)) + 100
    if kind == "const":
        return np.full(n, 50.0)
    if kind == "plateau":
        return np.repeat(rng.normal(100, 5, n // 7 + 1), 7)[:n]
    if kind == "spiky":
        return 100 + np.where(
            rng.random(n) < 0.1, rng.normal(0, 50, n), rng.normal(0, 0.01, n)
        )
    raise AssertionError(kind)


def _eq(a, b):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape
    assert np.array_equal(a, b, equal_nan=True)


@pytest.mark.parametrize("n", [0, 1, 2, 13, 14, 15, 27, 28, 29, 60, 200, 3000])
@pytest.mark.parametrize("kind", ["walk", "const", "plateau", "spiky"])
def test_loop_rewrite_bit_exact(n, kind):
    rng = np.random.default_rng(n * 131 + hash(kind) % 1000)
    c = _series(rng, n, kind)
    h = c + np.abs(rng.normal(0, 0.5, n))
    l = c - np.abs(rng.normal(0, 0.5, n))  # noqa: E741
    o = c + rng.normal(0, 0.3, n)

    _eq(ref_ema(c, 12), ta.ema(c, 12))
    _eq(ref_ema(c, 60), ta.ema(c, 60))
    _eq(ref_atr(h, l, c, 14), ta.atr(h, l, c, 14))
    for a, b in zip(ref_adx_di(h, l, c, 14), ta.adx_di(h, l, c, 14)):
        _eq(a, b)
    _eq(ref_psar(h, l), ta.psar(h, l))
    _eq(ref_rolling_mean(c, 14), ta.rolling_mean(c, 14))
    _eq(ref_rolling_mean(c, 14, 3), ta.rolling_mean(c, 14, 3))
    _eq(ref_kalman(c, 1e-5, 1e-2), ta.kalman_filter(c, 1e-5, 1e-2))
    for a, b in zip(ref_heikin_ashi(o, h, l, c), ta.heikin_ashi(o, h, l, c)):
        _eq(a, b)
    for a, b in zip(ref_supertrend(h, l, c), ta.supertrend(h, l, c)):
        _eq(a, b)
    for a, b in zip(ref_holt(c, 0.3, 0.1), ta.holt_linear(c, 0.3, 0.1)):
        _eq(a, b)

    dp = rng.integers(-5, 6, n)
    for a, b in zip(ref_cusum(dp, 7), ta.cusum_events(dp, 7)):
        _eq(a, b)
    _eq(ref_imbalance(dp, 9), ta.imbalance_bar_ids(dp, 9))


def test_nan_leading_ema_cascade():
    """The MACD signal-line shape: input leads with NaN warm-up."""
    rng = np.random.default_rng(5)
    c = np.cumsum(rng.normal(0, 1, 300)) + 100
    c[:37] = np.nan
    _eq(ref_ema(c, 9), ta.ema(c, 9))
    # all-NaN and too-short-after-NaN edges
    allnan = np.full(20, np.nan)
    _eq(ref_ema(allnan, 9), ta.ema(allnan, 9))
    short = np.full(20, np.nan)
    short[15:] = 1.0
    _eq(ref_ema(short, 9), ta.ema(short, 9))
