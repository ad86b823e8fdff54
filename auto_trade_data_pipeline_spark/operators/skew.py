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

__all__ = ["salted_agg"]

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
