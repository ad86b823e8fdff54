"""Spark 4 `transformWithStateInPandas` form of the stateful surface.

`applyInPandasWithState` (streaming/candles.py) is the 3.4+ API; Spark
4 replaces it with the StatefulProcessor family: typed state handles
(ValueState/ListState/MapState), explicit timers, and a RocksDB-backed
state store with changelog checkpointing — operationally the right
shape for 100 TB streams, where the per-key state must live off-heap
and survive executor loss at rocksdb-snapshot cost, not JVM-heap cost.

This module ports the running-VWAP accumulator (reference semantics:
``src/candle_to_calcs.py:42,691`` rolling-buffer state collapsed to
its sufficient statistics) to the new API. The output contract is
IDENTICAL to streaming/candles.streaming_running_vwap — pinned by a
parity test so both stateful APIs stay in lockstep.

Scale notes: state per symbol is one (cpv, cv, n) triple — O(1); the
RocksDB provider keeps the working set on local disk with a block
cache, so millions of keys (symbol x venue x strategy fan-outs) cost
no executor heap. Timers are not used here (VWAP emits per-batch);
the anchor machine's 300 s flush (ST6) maps to
``handle.registerTimer`` in this API when TWS anchors land.

ENVIRONMENT GATE: the TWS state-server protocol speaks protobuf
(``pyspark/sql/streaming/proto``), and ``google.protobuf`` is not
installed in this container — the parity test skips when the import
fails, exactly like the multimodal codec stubs. The module itself
imports and plans fine; only query START needs protobuf. On any
standard Spark 4 deployment (protobuf ships with the distro's Python
env) the parity test runs as written.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

if TYPE_CHECKING:  # TimerValues only exists in pyspark >= 4
    from pyspark.sql.streaming.stateful_processor import TimerValues

__all__ = ["RunningVwapProcessor", "tws_running_vwap", "ensure_rocksdb_state_store"]

_OUT_SCHEMA = "symbol string, batch_rows bigint, total_rows bigint, running_vwap double"


def ensure_rocksdb_state_store(spark) -> None:
    """transformWithStateInPandas requires the RocksDB state store
    provider (the default HDFS-backed one does not implement the
    multi-column-family layout TWS state handles need)."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )


class RunningVwapProcessor(StatefulProcessor):
    """Per-symbol running VWAP on typed ValueState.

    State = the sufficient statistics (Σ price·volume, Σ volume, n);
    one row out per (symbol, micro-batch) carrying the batch row count
    and the running VWAP — bit-for-bit the applyInPandasWithState
    contract."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("vwap_acc", "cpv double, cv double, n bigint")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: "TimerValues"
    ) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        acc = self._state.get() if self._state.exists() else None
        cpv, cv, n = acc if acc is not None else (0.0, 0.0, 0)
        batch_rows = 0
        for pdf in rows:
            batch_rows += len(pdf)
            cpv += float((pdf["price"] * pdf["volume"]).sum())
            cv += float(pdf["volume"].sum())
            n += len(pdf)
        self._state.update((cpv, cv, n))
        yield pd.DataFrame(
            {
                "symbol": [symbol],
                "batch_rows": [batch_rows],
                "total_rows": [n],
                "running_vwap": [cpv / cv if cv > 0 else None],
            }
        )

    def close(self) -> None:
        pass


def tws_running_vwap(ticks: DataFrame) -> DataFrame:
    """ST4 on the Spark-4 stateful API: same output table as
    streaming_running_vwap, state in RocksDB column families."""
    ensure_rocksdb_state_store(ticks.sparkSession)
    return ticks.groupBy("symbol").transformWithStateInPandas(
        statefulProcessor=RunningVwapProcessor(),
        outputStructType=_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
