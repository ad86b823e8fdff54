"""Skew-safe two-phase aggregation (salting).

The trade workload's natural group key is `symbol` — single-digit
cardinality, so a plain groupBy funnels 100 TB into a handful of
reducers. For decomposable aggregates (sum/count/min/max/avg), the
classic fix: phase 1 groups by (key, salt) — `num_salts` uniform
partial groups per hot key — phase 2 combines partials by key. Both
phases keep map-side combine; the second shuffle moves only
|keys| x num_salts rows.

(Spark's AQE skew handling splits skewed JOIN partitions but does not
re-key skewed aggregations; salting is still the engine-level answer.
The reference sidesteps the issue by hand-threading per symbol,
``/root/reference/src/aggregator_candles.py:402-433`` — one thread
per symbol, the same bottleneck.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "split_oversized_blocks"]


def split_oversized_blocks(
    df: DataFrame,
    block_col: str,
    id_col: str,
    max_rows: int,
    out_col: str | None = None,
) -> DataFrame:
    """Guard for blocked pair-generation (exact within-block dedup:
    metadata blocking, IVF cells): any self-join on `block_col` is
    quadratic WITHIN a block, so one pathological block (a boilerplate
    `source`, a dense quantizer cell) turns into one task doing n^2/2
    comparisons. This re-keys blocks larger than `max_rows` into
    ``ceil(n / max_rows)`` deterministic sub-blocks
    (``hash(id) % k``), bounding per-task pair work at roughly
    ``(max_rows)^2 / 2`` regardless of input skew.

    The trade is explicit and bounded: pairs ACROSS sub-blocks of a
    split block are not compared (recall loss confined to oversized
    blocks; small blocks pass through untouched, bit-identical). The
    per-block counts come from one tiny agg broadcast back — no extra
    shuffle of the data itself.
    """
    out_col = out_col or block_col
    fan = (
        df.groupBy(block_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            block_col,
            F.ceil(F.col("__n") / F.lit(max_rows)).cast("int").alias("__k"),
        )
    )
    sub = F.when(
        F.col("__k") > 1, F.pmod(F.xxhash64(F.col(id_col)), F.col("__k"))
    ).otherwise(F.lit(0))
    return (
        df.join(F.broadcast(fan), block_col)
        .withColumn(out_col, F.concat_ws("#", F.col(block_col).cast("string"), sub.cast("string")))
        .drop("__k")
    )

#: (phase-1 aggregate, phase-2 combiner) per decomposable agg type.
_COMBINE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    `aggs`: (agg_type, column, alias) with agg_type in
    sum|count|min|max. The salt is a uniform hash of a high-entropy
    tiebreaker — here `monotonically_increasing_id` via
    ``spark_partition_id``-free modulo on a random-ish column is
    avoided; we hash the full row's physical position proxy: any
    per-row distinct column works, and `F.rand` would break
    determinism, so the salt is `pmod(hash(all columns), num_salts)`
    — deterministic for a given input."""
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(num_salts))
    phase1_exprs = []
    for agg_type, col, alias in aggs:
        fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[agg_type]
        phase1_exprs.append(fn(col).alias(f"__p_{alias}"))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*phase1_exprs)
    )
    phase2_exprs = [
        _COMBINE[agg_type](f"__p_{alias}").alias(alias) for agg_type, _, alias in aggs
    ]
    return partial.groupBy(*keys).agg(*phase2_exprs)
