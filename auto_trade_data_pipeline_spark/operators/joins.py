"""Join operators beyond Catalyst built-ins — J5 (as-of / range join).

The reference has no relational joins (single-table pipeline), but its
anchored-VWAP semantics ("accumulate from anchor ts to snapshot ts",
``src/candle_to_calcs.py:236-247``) are an as-of/range join in
disguise. We expose both shapes:

- :func:`asof_join` — "latest right row at or before each left row".
  Implemented as the union + last-value-carry-forward window, NOT a
  non-equi join: one shuffle on the key, zero row explosion, linear
  state. A ``left.ts >= right.ts`` theta join materializes
  O(|left|x|right matches|) intermediates and at 100 TB that's the
  whole table per key; the union form scans each input exactly once.

- :func:`range_join` — generic interval join (point-in-range) for
  genuinely overlapping ranges, delegated to Catalyst as a non-equi
  join so broadcast kicks in when the range side is dimension-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "asof_join_forward", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str = "timestamp",
    suffix: str = "",
) -> DataFrame:
    """Backward as-of join: for every ``left`` row, attach the payload
    of the most recent ``right`` row with ``right.ts <= left.ts`` and
    equal keys (``on``). Ties at identical ``ts`` take the right row
    (inclusive bound), matching DuckDB/pandas ``merge_asof`` defaults.

    Scale shape: union both sides with a source marker, one window
    scan per key ordered by (ts, marker), ``last(value, ignorenulls)``
    carries the right payload forward. Single shuffle on ``on``;
    memory per task is O(1) beyond the sort. Right payload columns are
    emitted nullable (no match yet => null), suffixed with ``suffix``.
    """
    payload = [c for c in right.columns if c not in on and c != ts]
    # Marker orders right rows *before* left rows at equal ts so the
    # inclusive bound sees same-instant right payloads.
    lhs = left.withColumn("__src", F.lit(1))
    for c in payload:
        lhs = lhs.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))
    rhs = right.select(
        *on,
        F.col(ts).alias(ts),
        F.lit(0).alias("__src"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
    )
    left_only = [c for c in left.columns if c not in on and c != ts]
    for c in left_only:
        rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = lhs.unionByName(rhs)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col("__src").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in payload:
        unioned = unioned.withColumn(
            f"__r_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w)
        )
    out = unioned.filter(F.col("__src") == 1).drop("__src")
    for c in payload:
        out = out.withColumnRenamed(f"__r_{c}", f"{c}{suffix}")
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str = "timestamp",
    suffix: str = "",
) -> DataFrame:
    """FORWARD as-of join: for every ``left`` row, attach the payload
    of the NEXT ``right`` row with ``right.ts >= left.ts`` and equal
    keys — the lookahead join behind next-quote attribution and
    label-the-future feature engineering. Inclusive at equal ``ts``
    (a same-instant right row matches), mirroring the backward form.

    Same scale shape as `asof_join`: union with a source marker, one
    per-key ordered scan, ``first(value, ignorenulls)`` over the
    FORWARD frame carries the next right payload back. Single shuffle
    on ``on``; zero row explosion."""
    payload = [c for c in right.columns if c not in on and c != ts]
    # Marker orders left rows BEFORE right rows at equal ts so the
    # forward frame (current row onward) sees same-instant payloads.
    lhs = left.withColumn("__src", F.lit(0))
    for c in payload:
        lhs = lhs.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))
    rhs = right.select(
        *on,
        F.col(ts).alias(ts),
        F.lit(1).alias("__src"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
    )
    left_only = [c for c in left.columns if c not in on and c != ts]
    for c in left_only:
        rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = lhs.unionByName(rhs)

    # REVERSED frame, same row picked (round 10): `first(x) over
    # (ORDER BY ts ASC ROWS 0..UNBOUNDED FOLLOWING)` makes Spark
    # re-aggregate the remaining rows for EVERY row
    # (UnboundedFollowingWindowFunctionFrame is O(n^2) per partition —
    # measured 68 s on the sf0.1 tick tape). Descending order turns
    # the same pick — the non-null payload at the smallest
    # (ts, __src) >= current — into `last(x) over (ROWS UNBOUNDED
    # PRECEDING..0)`, the incremental O(n) frame: 68 s -> sub-second.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).desc(), F.col("__src").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in payload:
        unioned = unioned.withColumn(
            f"__r_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w)
        )
    out = unioned.filter(F.col("__src") == 0).drop("__src")
    for c in payload:
        out = out.withColumnRenamed(f"__r_{c}", f"{c}{suffix}")
    return out


def range_join(
    left: DataFrame,
    ranges: DataFrame,
    point: Column,
    lo: Column,
    hi: Column,
    how: str = "inner",
    broadcast_ranges: bool = True,
) -> DataFrame:
    """Point-in-interval join: ``lo <= point < hi``. With a
    dimension-sized ``ranges`` table (price bands, time buckets) the
    broadcast hint turns this into a BroadcastNestedLoopJoin — each
    task streams its partition against the in-memory band table, no
    shuffle. Without broadcast, a non-equi join at 100 TB degenerates
    to a cartesian per overlap; keep the range side small or bucket
    first.
    """
    r = F.broadcast(ranges) if broadcast_ranges else ranges
    return left.join(r, (point >= lo) & (point < hi), how)
