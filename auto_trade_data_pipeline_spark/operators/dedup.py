"""Keyed dedup keep-last and upsert/merge (A10, J3, S7).

Reference: ``drop_duplicates(subset=keys, keep='last')`` after concat —
ticks ``src/fetch_historical_trades_nvda.py:237-248``, candles
``src/aggregator_candles.py:104-136``, anchors (sorted by snapshot ts
first) ``src/candle_to_calcs.py:183-193``.

pandas ``keep='last'`` is file-POSITIONAL; in a distributed engine
there is no file position, so determinism requires an explicit order
column (ingest batch id / tick id / snapshot timestamp). That is the
one semantic upgrade here (SURVEY §7 hard-part 3).

Scale notes: dedup is one shuffle on the key; the window variant and
the max_by variant both do exactly one exchange. For the upsert, the
anti-join form shuffles only on the key columns and lets AQE pick
broadcast when `updates` is small — at 100 TB the production analogue
is Delta/Iceberg MERGE INTO; this is the engine-level equivalent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_last(
    df: DataFrame, keys: Sequence[str], order_cols: Sequence[str]
) -> DataFrame:
    """Keep, per key, the row with the greatest (order_cols) tuple.

    row_number over a key-partitioned window — one shuffle, no sort of
    the whole relation, skew-safe for realistic key cardinalities.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert(
    existing: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Merge `updates` into `existing` keyed on `keys`, updates win (S7/J3):
    ``new ∪ (old ⟕anti new)``.

    If `updates` itself may carry duplicate keys, pass order_cols to
    pre-dedup it (keep greatest). Column order is normalized to
    `existing`'s.
    """
    if order_cols:
        updates = dedup_keep_last(updates, keys, order_cols)
    keep_old = existing.join(updates.select(*keys).distinct(), on=list(keys), how="left_anti")
    return updates.select(*existing.columns).unionByName(keep_old.select(*existing.columns))
