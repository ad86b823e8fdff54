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

__all__ = [
    "apply_upsert_batch",
    "stream_upsert_writer",
    "committed_batches",
    "apply_cdc_batch",
    "stream_cdc_writer",
]


def _commits_dir(path: str) -> str:
    _require_local_path(path)
    return f"{path}.__commits"


def _require_local_path(path: str) -> None:
    """The commit markers use driver-local os.path/os.rename; against
    a remote URI (hdfs://, s3a://, ...) the marker dir would silently
    land on the driver's local disk and the transactional-skip layer
    would degrade to value-idempotence only. Refuse loudly instead —
    a remote deployment should route marker IO through the Hadoop
    FileSystem API (or use a transactional table format)."""
    scheme = path.split("://", 1)[0] if "://" in path else ""
    if scheme not in ("", "file"):
        raise ValueError(
            f"stream upsert sink requires a local filesystem path, got "
            f"{scheme}:// - commit markers are written with driver-local "
            "os.rename and would not be transactional against a remote store"
        )


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
    """The function to hand to ``stream.writeStream.foreachBatch``.

    ``path`` must be on a local (POSIX-rename) filesystem — the
    exactly-once commit markers are driver-local files (see
    ``_require_local_path``)."""
    _require_local_path(path)

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        apply_upsert_batch(batch_df, batch_id, path, keys, order_col)

    return _write


def apply_cdc_batch(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    keys: list[str],
    order_col: str,
    op_col: str = "op",
) -> bool:
    """CDC twin of :func:`apply_upsert_batch`: the micro-batch is an
    I/U/D changelog applied with tombstone semantics
    (sinks.write_cdc_snapshot). Same two idempotence layers: the
    batch-id commit marker skips replays of an applied batch, and the
    apply itself is value-idempotent (re-applying a changelog whose
    per-key last ops already landed is a no-op)."""
    from auto_trade_data_pipeline_spark.sinks import write_cdc_snapshot

    d = _commits_dir(path)
    marker = os.path.join(d, str(batch_id))
    if os.path.exists(marker):
        return False
    write_cdc_snapshot(batch_df, path, keys, order_col, op_col=op_col)
    os.makedirs(d, exist_ok=True)
    tmp = f"{marker}.__tmp{os.getpid()}"
    with open(tmp, "w") as f:
        f.write("committed")
    os.rename(tmp, marker)
    return True


def stream_cdc_writer(path: str, keys: list[str], order_col: str, op_col: str = "op"):
    """foreachBatch writer applying a CDC change stream (with delete
    tombstones) exactly-once onto a local snapshot table."""
    _require_local_path(path)

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        apply_cdc_batch(batch_df, batch_id, path, keys, order_col, op_col=op_col)

    return _write
