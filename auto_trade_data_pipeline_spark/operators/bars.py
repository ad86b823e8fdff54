"""Information-driven bars (volume / dollar bars) and financial-ML
labeling operators — the sampling and label-engineering layer of a
trading training-data pipeline (Lopez de Prado, *Advances in
Financial Machine Learning*, ch. 2 & 3).

Time bars (``operators.candles``) sample by wall clock; information
bars sample by ACTIVITY: a new bar opens every time the running
per-symbol volume (or dollar value traded) crosses a fixed threshold,
so volatile regimes produce more bars and quiet regimes fewer — the
sampling density a downstream model actually wants.

Scale notes (100 TB):
- The running total is a per-symbol ordered prefix sum — one
  symbol-keyed exchange, incremental window evaluation, no Python.
  All arithmetic is BIGINT on integer-scaled measures, so bar
  assignment is exact and independent of parallelism.
- Bar assignment is ``prev_cum div threshold`` (both operands
  non-negative, so truncating and flooring division agree across
  engines); the grouped OHLC aggregate is the same map-side-combine
  shape as time-bar candles.
- For extreme single-symbol skew the prefix sum admits the same
  blocked treatment as ``operators.blocked`` (block offsets +
  in-block cumsum); symbol-keyed parallelism suffices for realistic
  symbol universes.

Reference parity: the reference pipeline samples time bars only
(``src/aggregator_candles.py``); information bars extend the same
bucket-assign → grouped-OHLC shape to activity clocks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def information_bars(
    ticks: DataFrame,
    threshold: int,
    measure: Column,
    measure_name: str = "measure",
) -> DataFrame:
    """Assign each tick to an activity bar and aggregate OHLC per bar.

    ``measure`` must be a non-negative BIGINT column expression (an
    integer-scaled per-tick increment: share volume, dollar value,
    ...). Bar ``i`` contains the ticks whose RUNNING PRIOR total lies
    in ``[i*threshold, (i+1)*threshold)`` — i.e. a bar closes as soon
    as its accumulated measure reaches the threshold, and the tick
    that crosses the line opens the next bar.

    Returns one row per (symbol, bar_id): open/high/low/close with
    first/last tick timestamps, total measure, and tick count.
    """
    wo = Window.partitionBy("symbol").orderBy("timestamp", "tick_id")
    prev_cum = F.coalesce(
        F.sum(measure).over(wo.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    t = ticks.select(
        "symbol",
        "timestamp",
        "tick_id",
        "price",
        measure.alias("m"),
        prev_cum.alias("prev_cum"),
    ).withColumn("bar_id", F.expr(f"prev_cum div {int(threshold)}"))

    wbar = Window.partitionBy("symbol", "bar_id")
    ra = F.row_number().over(wbar.orderBy("timestamp", "tick_id"))
    rd = F.row_number().over(wbar.orderBy(F.desc("timestamp"), F.desc("tick_id")))
    marked = t.withColumn("ra", ra).withColumn("rd", rd)
    return marked.groupBy("symbol", "bar_id").agg(
        F.min("timestamp").alias("open_ts"),
        F.max("timestamp").alias("close_ts"),
        F.max(F.when(F.col("ra") == 1, F.col("price"))).alias("open"),
        F.max("price").alias("high"),
        F.min("price").alias("low"),
        F.max(F.when(F.col("rd") == 1, F.col("price"))).alias("close"),
        F.sum("m").alias(measure_name),
        F.count(F.lit(1)).alias("n_ticks"),
    )


def triple_barrier_labels(
    entries: DataFrame,
    ticks: DataFrame,
    horizon_sec: int,
) -> DataFrame:
    """Triple-barrier first-touch labeling (de Prado ch. 3).

    ``entries`` carries (symbol, entry_ts, entry_price, up, dn): a
    position opened at ``entry_ts`` is labeled +1 if the price
    touches ``up`` first, -1 if it touches ``dn`` first, 0 if neither
    barrier is hit within ``horizon_sec`` (the vertical barrier).

    Distributed shape: the entry-to-future-tick pairing is a BANDED
    range join — both sides are blocked on ``floor(epoch /
    horizon_sec)`` so an entry meets only the ticks of its own and
    the next block (a tick window of length ``horizon_sec`` spans at
    most two blocks), then the exact interval predicate filters
    inside the block pair. Work is proportional to ticks-per-horizon,
    never |entries| x |ticks|; the first-touch reduction is one
    grouped min per barrier. Same banding recipe as
    ``operators.joins.range_join``.
    """
    h = int(horizon_sec)
    e = entries.select(
        "symbol",
        "entry_ts",
        "entry_price",
        "up",
        "dn",
        F.explode(
            F.array(
                F.expr(f"CAST(unix_timestamp(entry_ts) div {h} AS BIGINT)"),
                F.expr(f"CAST(unix_timestamp(entry_ts) div {h} + 1 AS BIGINT)"),
            )
        ).alias("blk"),
    )
    t = ticks.select(
        "symbol",
        F.col("timestamp").alias("tick_ts"),
        "price",
        F.expr(f"CAST(unix_timestamp(timestamp) div {h} AS BIGINT)").alias("blk"),
    )
    paired = e.join(t, ["symbol", "blk"]).where(
        (F.col("tick_ts") > F.col("entry_ts"))
        & (F.col("tick_ts") <= F.col("entry_ts") + F.expr(f"INTERVAL {h} SECOND"))
    )
    touched = paired.groupBy("symbol", "entry_ts", "entry_price", "up", "dn").agg(
        F.min(F.when(F.col("price") >= F.col("up"), F.col("tick_ts"))).alias("up_ts"),
        F.min(F.when(F.col("price") <= F.col("dn"), F.col("tick_ts"))).alias("dn_ts"),
    )
    base = entries.select("symbol", "entry_ts", "entry_price", "up", "dn").join(
        touched, ["symbol", "entry_ts", "entry_price", "up", "dn"], "left"
    )
    label = (
        F.when(
            F.col("up_ts").isNotNull()
            & (F.col("dn_ts").isNull() | (F.col("up_ts") <= F.col("dn_ts"))),
            F.lit(1),
        )
        .when(F.col("dn_ts").isNotNull(), F.lit(-1))
        .otherwise(F.lit(0))
    )
    return base.select(
        "symbol",
        "entry_ts",
        "entry_price",
        "up_ts",
        "dn_ts",
        label.alias("label"),
    )
