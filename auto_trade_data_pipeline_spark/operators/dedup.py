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
    assume_unique_updates: bool = False,
) -> DataFrame:
    """Merge `updates` into `existing` keyed on `keys`, updates win (S7/J3):
    ``new ∪ (old ⟕anti new)``.

    Duplicate keys WITHIN `updates` would silently pass through the
    anti-join form (both copies emitted — nondeterministic which one a
    downstream keep-first reads), so the operator refuses ambiguity:
    pass `order_cols` to pre-dedup updates keep-greatest, or
    `assume_unique_updates=True` to assert key-uniqueness at plan
    level (adds one cheap agg over the updates side; raises on the
    first duplicate instead of merging garbage).
    """
    if order_cols:
        updates = dedup_keep_last(updates, keys, order_cols)
    elif assume_unique_updates:
        dup = (
            updates.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                f"upsert: updates carry duplicate keys on {list(keys)}; "
                "pass order_cols to resolve keep-last deterministically"
            )
    else:
        raise ValueError(
            "upsert: pass order_cols (deterministic keep-last within updates) "
            "or assume_unique_updates=True"
        )
    keep_old = existing.join(updates.select(*keys).distinct(), on=list(keys), how="left_anti")
    return updates.select(*existing.columns).unionByName(keep_old.select(*existing.columns))


def cdc_apply(
    snapshot: DataFrame,
    changelog: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC changelog (rows carrying an I/U/D ``op_col``) onto a
    snapshot — the Delta/Hudi MERGE-with-deletes shape that extends
    :func:`upsert` (S7/J3) with tombstones. Per key, the LAST change
    by ``order_cols`` wins: a terminal D removes the key, anything
    else replaces the snapshot row. One key-partitioned window over
    the changelog (dimension of change volume, not table volume) plus
    one anti join against the changed-key set — the snapshot is never
    shuffled, so a nightly 0.1% changelog against a 100 TB table
    moves only the changelog.

    ``changelog`` must carry the snapshot's columns plus ``op_col``.
    """
    last = dedup_keep_last(changelog, keys, order_cols)
    ups = last.filter(F.col(op_col) != "D").select(*snapshot.columns)
    untouched = snapshot.join(
        last.select(*keys).distinct(), on=list(keys), how="left_anti"
    )
    return untouched.select(*snapshot.columns).unionByName(ups)
