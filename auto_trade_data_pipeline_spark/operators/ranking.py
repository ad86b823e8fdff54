"""Global ranking at scale — `row_number() OVER (ORDER BY ...)` with
NO single-partition exchange.

The naive Spark translation of a global row_number is
``Window.orderBy(...)`` with no partitionBy — Catalyst plans that as
Exchange SinglePartition: every row of a 100 TB table funnels through
ONE task. This module implements the standard distributed recipe
instead (the DataFrame analogue of RDD ``zipWithIndex``):

1. range-partition + sort by the order keys (the same exchange a
   global ``orderBy`` performs — fully parallel);
2. count rows per physical partition (a handful of longs to the
   driver — partition METADATA, not data; exactly what zipWithIndex
   collects internally);
3. broadcast the prefix-sum offsets back and add a within-partition
   running index (Arrow-batched mapInPandas, zero shuffle).

Determinism: with a total order (unique key tiebreaker in
``order_cols``) the global rank of every row is well-defined
regardless of where range boundaries fall, so the output is identical
at any parallelism — and oracle-checkable against a SQL
``row_number()`` window.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from auto_trade_data_pipeline_spark.cache_scope import scoped_persist
from pyspark.sql import functions as F

__all__ = ["global_row_number", "global_running_sum", "global_running_max"]


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "row_num",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a contiguous global 1-based rank over ``order_cols``
    (which must form a total order — include a unique id tiebreaker)
    without ever collapsing the data to one partition.

    Cost at 100 TB: two executions of the range exchange (the count
    job and the emit job) — persist/checkpoint the ranged input to
    pay it once if the downstream reuses it; either way no stage is
    single-partition, unlike the naive global window."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Persist pins the range boundaries: the exchange samples its
    # bounds per execution, so the count job and the emit job MUST
    # read the same materialized partitions or the offsets can be
    # attributed to different buckets. (At 100 TB: DISK_ONLY persist
    # or a checkpoint — the cost a contiguous global rank inherently
    # carries; it replaces the two range exchanges, not adds to them.)
    # pin=True: the collect()ed per-partition counts below are
    # metadata OF THIS materialization — a re-executed range exchange
    # may sample different bounds, so this cache must never be
    # auto-released while the returned plan might still be consumed
    # (cache_scope releases pinned entries only on explicit full
    # release; entries dedup by canonical plan, so loops don't leak).
    ordered = scoped_persist(
        df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols),
        pin=True,
    )

    # Partition metadata: one (pid, count) row per physical partition.
    counts = (
        ordered.groupBy(F.spark_partition_id().alias("__pid"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    sizes = {r["__pid"]: r["__n"] for r in counts}
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    from pyspark.sql.types import LongType, StructField, StructType

    # Copy, don't .add() in place — DataFrame.schema hands back its
    # cached StructType and mutating it corrupts column resolution.
    out_schema = StructType(list(ordered.schema.fields) + [StructField(out_col, LongType())])
    bc = df.sparkSession.sparkContext.broadcast(offsets)

    def attach(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # mapInPandas runs once per partition; the running counter
        # spans the partition's Arrow batches in order.
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pos = bc.value.get(pid, 0)
        for pdf in iterator:
            k = len(pdf)
            pdf = pdf.copy()
            pdf[out_col] = range(pos + 1, pos + k + 1)
            pos += k
            yield pdf

    return ordered.mapInPandas(attach, schema=out_schema)


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global inclusive prefix sum of ``value_col`` over the total
    order ``order_cols`` — the distributed-scan sibling of
    `global_row_number`, with the same no-SinglePartition recipe:
    range-partition + sort, collect per-partition SUMS (partition
    metadata — one long each), broadcast the prefix offsets, add a
    within-partition cumulative sum. Values must be integral (LONG —
    a non-integral float raises loudly in the pandas pass rather than
    silently truncating); NULL values contribute 0, so every output
    row carries the running total of the non-null inputs so far
    (note: plain SQL ``sum() OVER`` instead emits NULL until the
    first non-null value — callers that need that exact shape should
    filter nulls first).

    This is what makes weight-based global layouts (systematic PPS
    sampling, sequence packing across shards, equi-weight file
    splits) scale: the naive ``sum() OVER (ORDER BY ...)`` funnels
    100 TB through one task; this recipe never does."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # pin=True: the collect()ed per-partition counts below are
    # metadata OF THIS materialization — a re-executed range exchange
    # may sample different bounds, so this cache must never be
    # auto-released while the returned plan might still be consumed
    # (cache_scope releases pinned entries only on explicit full
    # release; entries dedup by canonical plan, so loops don't leak).
    ordered = scoped_persist(
        df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols),
        pin=True,
    )
    counts = (
        ordered.groupBy(F.spark_partition_id().alias("__pid"))
        .agg(F.sum(F.col(value_col).cast("long")).alias("__s"))
        .collect()
    )
    sums = {r["__pid"]: r["__s"] for r in counts}
    offsets = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        # F.sum returns NULL (None) for a partition holding only NULL
        # values — it contributes 0 to the running total (round-5
        # advice: the += of None crashed on all-null partitions).
        acc += sums[pid] or 0

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(ordered.schema.fields) + [StructField(out_col, LongType())]
    )
    bc = df.sparkSession.sparkContext.broadcast(offsets)

    def attach(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pos = bc.value.get(pid, 0)
        for pdf in iterator:
            pdf = pdf.copy()
            # Int64 (nullable) cast raises on non-integral floats —
            # the BIGINT contract is enforced, never silently floored;
            # NULLs contribute 0 (matching the F.sum partition pass).
            vals = pdf[value_col].astype("Int64").fillna(0).astype("int64")
            pdf[out_col] = vals.cumsum() + pos
            pos = int(pdf[out_col].iloc[-1]) if len(pdf) else pos
            yield pdf

    return ordered.mapInPandas(attach, schema=out_schema)


def global_running_max(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_max",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global EXCLUSIVE prefix maximum of ``value_col`` over the total
    order ``order_cols`` (each row sees the max over STRICTLY
    preceding rows; the global first row gets NULL) — the third
    sibling of the zipWithIndex recipe: range-partition + sort,
    collect per-partition maxima (partition metadata — one long
    each), broadcast the exclusive prefix maxima, add a
    within-partition shifted cummax. The naive
    ``max() OVER (ORDER BY ... ROWS ... 1 PRECEDING)`` funnels
    everything through one task; this never does.

    The exclusive prefix max is the workhorse of sort-order sweep
    algorithms — 2D skyline/Pareto filtering, envelope detection,
    record-breaking scans.

    Values must be integral (LONG — a non-integral float raises
    loudly in the pandas pass rather than silently flooring); NULLs
    are SKIPPED exactly like ``max() OVER``: a null row still sees
    the max of the strictly-preceding non-null values, and rows
    before the first non-null value get NULL (round-4 advice — both
    passes now agree on window semantics)."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # pin=True: the collect()ed per-partition counts below are
    # metadata OF THIS materialization — a re-executed range exchange
    # may sample different bounds, so this cache must never be
    # auto-released while the returned plan might still be consumed
    # (cache_scope releases pinned entries only on explicit full
    # release; entries dedup by canonical plan, so loops don't leak).
    ordered = scoped_persist(
        df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols),
        pin=True,
    )
    maxima = (
        ordered.groupBy(F.spark_partition_id().alias("__pid"))
        .agg(F.max(F.col(value_col).cast("long")).alias("__m"))
        .collect()
    )
    pmax = {r["__pid"]: r["__m"] for r in maxima}
    offsets: dict[int, object] = {}
    acc = None
    for pid in sorted(pmax):
        offsets[pid] = acc  # exclusive: max of all PRIOR partitions
        if pmax[pid] is not None and (acc is None or pmax[pid] > acc):
            acc = pmax[pid]

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(ordered.schema.fields) + [StructField(out_col, LongType())]
    )
    bc = df.sparkSession.sparkContext.broadcast(offsets)

    def attach(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        prior = bc.value.get(pid, None)
        for pdf in iterator:
            pdf = pdf.copy()
            if not len(pdf):
                pdf[out_col] = pd.array([], dtype="Int64")
                yield pdf
                continue
            # Int64 (nullable) cast raises on non-integral floats —
            # the BIGINT contract is enforced, never silently floored.
            s = pdf[value_col].astype("Int64")
            # inclusive running max skipping NULLs (ffill carries the
            # last valid max through null holes), then the exclusive
            # shift: row i sees max of STRICTLY preceding non-nulls.
            incl = s.cummax().ffill()
            excl = incl.shift(1)
            if prior is not None:
                # NA (no preceding non-null) resolves to the carry
                excl = excl.where(excl >= prior, prior)
            pdf[out_col] = excl.astype("Int64")
            last = incl.iloc[-1]
            if not pd.isna(last):
                prior = int(last) if prior is None else max(prior, int(last))
            yield pdf

    return ordered.mapInPandas(attach, schema=out_schema)
