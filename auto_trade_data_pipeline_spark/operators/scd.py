"""Slowly-changing-dimension (type 2) history builder.

Turns an append-only change log — one row per observation of a key's
state — into dimension history rows: one row per (key, state island)
with ``valid_from`` / ``valid_to`` / ``is_current``, consecutive
duplicate states collapsed. The batch equivalent of a warehouse
MERGE-based SCD2 load, expressed as two window passes instead of a
per-key loop.

Scale design: one hash exchange on the key columns; the change-flag
lag, the island filter, and the ``valid_to`` lead all run inside that
single partitioning (the filter preserves partitioning, so the second
window needs at most a partition-local sort, never a reshuffle). No
state explosion: output cardinality = number of state CHANGES, which
is <= input rows and typically far smaller. The reference has no SCD
surface; this extends the upsert/dedup family (SURVEY §2.1 S7,
`src/fetch_historical_trades_nvda.py:237-248`) from "latest value
wins" to "full validity history".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["scd2_from_changelog"]


def scd2_from_changelog(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    state_cols: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Build SCD2 history rows from a change log.

    Parameters
    ----------
    df : change log; one row per observation.
    keys : dimension key columns (partitioning key at scale).
    ts_col : event-time column; island boundaries follow this order.
    state_cols : the tracked attributes — a new island starts whenever
        any of them differs (null-safe) from the previous observation.
    tiebreak : extra columns appended to the ordering so duplicate
        timestamps produce a deterministic history.

    Returns the key + state columns plus ``valid_from`` (island start),
    ``valid_to`` (next island's start; null while current) and
    ``is_current`` (int 1/0). Half-open intervals: a row is in effect
    for ``valid_from <= t < valid_to``.
    """
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = Window.partitionBy(*keys).orderBy(*order)

    def differs(c: str) -> Column:
        return ~F.col(c).eqNullSafe(F.lag(c).over(w))

    is_first = F.row_number().over(w) == 1
    changed = is_first
    for c in state_cols:
        changed = changed | differs(c)

    islands = df.withColumn("_chg", changed).filter(F.col("_chg")).drop("_chg")
    valid_to = F.lead(ts_col).over(w)
    return islands.select(
        *keys,
        *state_cols,
        F.col(ts_col).alias("valid_from"),
        valid_to.alias("valid_to"),
        F.when(valid_to.isNull(), 1).otherwise(0).alias("is_current"),
    )
