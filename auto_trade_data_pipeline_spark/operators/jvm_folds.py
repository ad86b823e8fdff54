"""Pure-JVM scan folds for the EMA-class recursive indicators.

The recursive TA kernels (``functions/ta.py``) are left-to-right IEEE
scalar folds — inherently per-symbol sequential. Round-4 shipped them
as interpreted numpy loops inside ``applyInPandas``; this module
re-expresses each recursion as a Catalyst ``aggregate()`` higher-order
expression over a per-key ``collect_list`` array, with an
``array_append`` output accumulator (the scan). Same fold, same
operand order, same doubles — so the existing DuckDB ``list_reduce``
oracles (and the numpy kernels, kept as the documented fallback /
parity reference) stay bit-exact — but the hot loop now runs JVM-side
with zero Python/Arrow transfer (round-4 verdict item 2; the pattern
was first proven for LZ78 in ``sign_lz78_complexity``).

Reference parity: the recursions mirror the TA-Lib definitions the
reference calls through ``talib`` (``src/candle_to_calcs.py:60-120``);
see each ``functions/ta.py`` kernel for the from-spec derivation.

Scale shape: one ``collect_list`` per (key) group — parallelism is
symbol cardinality, state O(tape length) per task. That is the same
shape as the applyInPandas path it replaces (a serial recursion cannot
do better without the chunked approximation in
``operators/blocked.py`` / ``indicators_chunked_pack``); what changes
is the constant factor: no Arrow round trip, no Python interpreter in
the per-element loop.

All constants are embedded via ``repr()`` — the shortest round-trip
decimal parses to the identical double on the JVM, DuckDB, and CPython.
NULL (not NaN) marks warm-up rows: the Arrow path converted numpy NaN
to NULL at the boundary, so NULL is what the oracles and the driver
have always compared against.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _d(x: float) -> str:
    """Exact double literal for SQL embedding."""
    return f"CAST({x!r} AS DOUBLE)"


_NULL_D = "CAST(NULL AS DOUBLE)"
_EMPTY_D = "CAST(array() AS ARRAY<DOUBLE>)"


def ema_scan_sql(arr: str, period: int) -> str:
    """``array<double> -> array<double>`` TA-Lib EMA scan
    (``functions/ta.py:ema``): NULL while warming up, the
    sequential-fold SMA of the first ``period`` finite values at the
    seed index, then ``prev + (x - prev) * k``. Leading NULLs (a
    cascaded EMA's warm-up, e.g. the MACD signal line) are passed
    through without consuming warm-up count."""
    k = _d(2.0 / (period + 1.0))
    p = f"CAST({period} AS DOUBLE)"
    return f"""aggregate(
      {arr},
      named_struct('cnt', 0, 'acc', {_d(0.0)}, 'prev', {_d(0.0)}, 'out', {_EMPTY_D}),
      (st, x) -> CASE
        WHEN x IS NULL AND st.cnt = 0 THEN named_struct(
          'cnt', 0, 'acc', st.acc, 'prev', st.prev,
          'out', array_append(st.out, {_NULL_D}))
        WHEN st.cnt < {period} - 1 THEN named_struct(
          'cnt', st.cnt + 1, 'acc', st.acc + x, 'prev', st.prev,
          'out', array_append(st.out, {_NULL_D}))
        WHEN st.cnt = {period} - 1 THEN named_struct(
          'cnt', st.cnt + 1, 'acc', st.acc + x, 'prev', (st.acc + x) / {p},
          'out', array_append(st.out, (st.acc + x) / {p}))
        ELSE named_struct(
          'cnt', st.cnt + 1, 'acc', st.acc,
          'prev', (x - st.prev) * {k} + st.prev,
          'out', array_append(st.out, (x - st.prev) * {k} + st.prev))
      END,
      st -> st.out
    )"""


def wilder_atr_scan_sql(tr_arr: str, period: int) -> str:
    """``array<double> -> array<double>`` Wilder ATR scan over a
    true-range array (``functions/ta.py:atr``): TR[0] is excluded from
    the seed (it has no previous close), the seed SMA of TR[1..period]
    lands at index ``period``, then
    ``(prev * (period-1) + tr) / period``."""
    p = f"CAST({period} AS DOUBLE)"
    pm1 = f"CAST({period - 1} AS DOUBLE)"
    return f"""aggregate(
      {tr_arr},
      named_struct('i', 0, 'acc', {_d(0.0)}, 'prev', {_d(0.0)}, 'out', {_EMPTY_D}),
      (st, tr) -> CASE
        WHEN st.i = 0 THEN named_struct(
          'i', 1, 'acc', st.acc, 'prev', st.prev,
          'out', array_append(st.out, {_NULL_D}))
        WHEN st.i < {period} THEN named_struct(
          'i', st.i + 1, 'acc', st.acc + tr, 'prev', st.prev,
          'out', array_append(st.out, {_NULL_D}))
        WHEN st.i = {period} THEN named_struct(
          'i', st.i + 1, 'acc', st.acc + tr, 'prev', (st.acc + tr) / {p},
          'out', array_append(st.out, (st.acc + tr) / {p}))
        ELSE named_struct(
          'i', st.i + 1, 'acc', st.acc,
          'prev', (st.prev * {pm1} + tr) / {p},
          'out', array_append(st.out, (st.prev * {pm1} + tr) / {p}))
      END,
      st -> st.out
    )"""


def kalman_scan_sql(arr: str, q: float, r: float) -> str:
    """``array<double> -> array<double>`` 1-D random-walk Kalman scan
    (``functions/ta.py:kalman_filter``): seed x = z[0], p = 1; then
    pp = p + q, k = pp/(pp+r), x += k*(z-x), p = (1-k)*pp. The gain
    subexpression is inlined twice — deterministic IEEE, identical
    value both times (the DuckDB oracle does the same)."""
    qs, rs = _d(q), _d(r)
    gain = f"(st.p + {qs}) / (st.p + {qs} + {rs})"
    return f"""aggregate(
      {arr},
      named_struct('n', 0, 'x', {_d(0.0)}, 'p', {_d(1.0)}, 'out', {_EMPTY_D}),
      (st, z) -> CASE
        WHEN st.n = 0 THEN named_struct(
          'n', 1, 'x', z, 'p', {_d(1.0)}, 'out', array_append(st.out, z))
        ELSE named_struct(
          'n', st.n + 1,
          'x', st.x + ({gain}) * (z - st.x),
          'p', ({_d(1.0)} - {gain}) * (st.p + {qs}),
          'out', array_append(st.out, st.x + ({gain}) * (z - st.x)))
      END,
      st -> st.out
    )"""


def holt_scan_sql(arr: str, alpha: float, beta: float) -> str:
    """``array<double> -> array<struct<l:double, b:double>>`` Holt
    double-exponential (level + trend) scan
    (``functions/ta.py:holt_winters``): seed l = z[0], b = 0; then
    l' = alpha*z + (1-alpha)*(l+b) and b' = beta*(l'-l) + (1-beta)*b.
    The coupled read is safe here: Catalyst evaluates every
    ``named_struct`` field against the OLD accumulator (no DuckDB-style
    in-place update), so l' is inlined into b's expression."""
    a, b_ = _d(alpha), _d(beta)
    one_a, one_b = _d(1.0 - alpha), _d(1.0 - beta)
    lnew = f"({a} * z + {one_a} * (st.l + st.b))"
    empty = "CAST(array() AS ARRAY<STRUCT<l: DOUBLE, b: DOUBLE>>)"
    return f"""aggregate(
      {arr},
      named_struct('n', 0, 'l', {_d(0.0)}, 'b', {_d(0.0)}, 'out', {empty}),
      (st, z) -> CASE
        WHEN st.n = 0 THEN named_struct(
          'n', 1, 'l', z, 'b', {_d(0.0)},
          'out', array_append(st.out, named_struct('l', z, 'b', {_d(0.0)})))
        ELSE named_struct(
          'n', st.n + 1,
          'l', {lnew},
          'b', {b_} * ({lnew} - st.l) + {one_b} * st.b,
          'out', array_append(st.out, named_struct(
            'l', {lnew},
            'b', {b_} * ({lnew} - st.l) + {one_b} * st.b)))
      END,
      st -> st.out
    )"""


def ha_open_scan_sql(bars_arr: str) -> str:
    """``array<struct<o,c,hc>> -> array<double>`` Heikin-Ashi open scan
    (``functions/ta.py:heikin_ashi``): ha_open[0] = (o0+c0)/2, then
    ha_open[i] = (ha_open[i-1] + ha_close[i-1]) / 2. The element struct
    must carry fields named o, c, hc (raw open, raw close, ha_close)."""
    return f"""aggregate(
      {bars_arr},
      named_struct('n', 0, 'prev', {_d(0.0)}, 'last_hc', {_d(0.0)}, 'out', {_EMPTY_D}),
      (st, e) -> CASE
        WHEN st.n = 0 THEN named_struct(
          'n', 1, 'prev', (e.o + e.c) / {_d(2.0)}, 'last_hc', e.hc,
          'out', array_append(st.out, (e.o + e.c) / {_d(2.0)}))
        ELSE named_struct(
          'n', st.n + 1,
          'prev', (st.prev + st.last_hc) / {_d(2.0)},
          'last_hc', e.hc,
          'out', array_append(st.out, (st.prev + st.last_hc) / {_d(2.0)}))
      END,
      st -> st.out
    )"""


def scan_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    payload_cols: list[str],
    scans: dict[str, Column | str],
) -> DataFrame:
    """Collect ``payload_cols`` per key ordered by ``order_col``, apply
    each scan expression (referring to the collected array as ``s``,
    whose elements expose the order + payload fields), and explode back
    to one row per input row carrying every scan output.

    Output columns: ``key_cols`` + ``order_col`` + ``payload_cols`` +
    one column per ``scans`` entry (element type of the scan's output
    array). Scans must return arrays the same length as ``s``.
    """
    lists = df.groupBy(*key_cols).agg(
        F.array_sort(F.collect_list(F.struct(order_col, *payload_cols))).alias("s")
    )
    for name, expr in scans.items():
        lists = lists.withColumn(name, F.expr(expr) if isinstance(expr, str) else expr)
    scan_names = list(scans)
    exploded = lists.select(
        *key_cols, *scan_names, F.posexplode("s").alias("pos", "e")
    )
    return exploded.select(
        *key_cols,
        F.col(f"e.{order_col}").alias(order_col),
        *[F.col(f"e.{c}").alias(c) for c in payload_cols],
        *[F.col(n)[F.col("pos")].alias(n) for n in scan_names],
    )
