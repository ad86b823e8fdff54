"""Exactly-once streaming sink: foreachBatch + keyed upsert + batch
commit markers.

The reference's streaming mode appends each micro-batch to flat CSV
(``src/candle_to_calcs.py:751-829``) — at-least-once: a crash between
write and checkpoint re-appends the batch on restart. The
Spark-idiomatic upgrade is ``foreachBatch`` with TWO independent
idempotence layers:

1. **Transactional skip** — Structured Streaming re-delivers a batch
   with the SAME ``batch_id`` after a restart; a filesystem commit
   marker per batch id (written atomically via tmp+rename) lets the
   sink skip batches it already applied. This is the same txn-id
   protocol Delta's ``txnAppId``/``txnVersion`` implements for managed
   tables.
2. **Idempotence by value** — the write itself is the keyed
   keep-last upsert (S7), so even a replay with FRESH batch ids (a
   deleted checkpoint, a full re-run) converges to the identical
   table instead of duplicating rows.

At 100 TB the snapshot-rewrite upsert becomes a Delta/Iceberg MERGE
keyed on the same columns; the foreachBatch + marker protocol is
unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from auto_trade_data_pipeline_spark.sinks import write_upsert_snapshot

__all__ = ["apply_upsert_batch", "stream_upsert_writer", "committed_batches"]


def _commits_dir(path: str) -> str:
    return f"{path}.__commits"


def committed_batches(path: str) -> set[int]:
    d = _commits_dir(path)
    if not os.path.isdir(d):
        return set()
    return {int(n) for n in os.listdir(d) if n.isdigit()}


def apply_upsert_batch(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    keys: list[str],
    order_col: str,
) -> bool:
    """Apply one micro-batch: skip if ``batch_id`` is already
    committed, else keyed-upsert the rows and write the commit marker.
    Returns True if the batch was applied, False if skipped."""
    d = _commits_dir(path)
    marker = os.path.join(d, str(batch_id))
    if os.path.exists(marker):
        return False
    write_upsert_snapshot(batch_df, path, keys, order_col)
    os.makedirs(d, exist_ok=True)
    tmp = f"{marker}.__tmp{os.getpid()}"
    with open(tmp, "w") as f:
        f.write("committed")
    os.rename(tmp, marker)  # atomic on a POSIX filesystem
    return True


def stream_upsert_writer(path: str, keys: list[str], order_col: str):
    """The function to hand to ``stream.writeStream.foreachBatch``."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        apply_upsert_batch(batch_df, batch_id, path, keys, order_col)

    return _write
