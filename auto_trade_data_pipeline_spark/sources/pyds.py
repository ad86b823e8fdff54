"""Spark 4 Python DataSource for the paginated REST tick API (S1-S3).

The mapInPandas fetch (`sources/rest.py:fetch_trades`) expresses
ingestion as a transformation over a plan DataFrame; THIS module
exposes the same source as a first-class `spark.read.format(...)`
via the Spark 4 Python DataSource API — the idiomatic end state for
a custom source: partition planning, schema, and options live behind
the reader interface, and the engine schedules one task per
(symbol, trading day) partition exactly like any file source.

    spark.dataSource.register(TickRestDataSource)
    df = (spark.read.format("trade_rest")
          .option("symbols", "NVDA,AAPL")
          .option("start", "2024-01-02").option("end", "2024-01-31")
          .option("fetch_provider", "my_pkg.client:fetch_page")
          .load())

`fetch_provider` is a "module:function" import path resolved ON THE
EXECUTOR (options are strings; callables do not serialize) with the
same page contract as `fetch_trades`: f(symbol, date_iso, limit,
skip) -> {"t": [epoch_ms...], "p": [...], "v": [...]} — empty "t"
ends pagination. No HTTP client ships here (no network in this
build); `synthetic_fetch` is a deterministic in-repo provider that
exercises the full pagination path and makes the source usable
out of the box.

Scale shape: the partition grid is (symbols x weekdays) — thousands
of independent tasks, each rate-limited to its share of the API
budget (`calls_per_min / tasks_sharing_budget`, the same static
split as fetch_trades); retries with exponential backoff per page.
Reference: src/fetch_historical_trades_nvda.py:96-170 (requests
loop), :379-381 (per-day process pool).
"""

from __future__ import annotations

import importlib
from datetime import date as date_t
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

__all__ = ["TickRestDataSource", "synthetic_fetch", "TICK_SCHEMA_DDL"]

TICK_SCHEMA_DDL = (
    "symbol string, timestamp timestamp, price double, volume double, tick_id long"
)


def synthetic_fetch(symbol: str, date_iso: str, limit: int, skip: int):
    """Deterministic offline page provider: 100 ticks per (symbol,
    day) at 1-minute cadence from 14:30 UTC, price seeded by a stable
    hash of (symbol, day) — honors limit/skip so multi-page
    pagination is exercised for limit < 100."""
    import hashlib

    n_total = 100
    if skip >= n_total:
        return {"t": [], "p": [], "v": []}
    seed = int(hashlib.md5(f"{symbol}|{date_iso}".encode()).hexdigest()[:8], 16)
    base_price = 100.0 + (seed % 10_000) / 100.0
    day = datetime.fromisoformat(date_iso).replace(tzinfo=timezone.utc)
    t0 = int(day.timestamp() * 1000) + (14 * 3600 + 1800) * 1000
    end = min(skip + limit, n_total)
    idx = range(skip, end)
    return {
        "t": [t0 + i * 60_000 for i in idx],
        "p": [round(base_price + ((seed >> 4) % 7 + 1) * 0.01 * (i % 13), 4) for i in idx],
        "v": [float(100 + (seed + i) % 900) for i in idx],
    }


class _DayPartition(InputPartition):
    def __init__(self, symbol: str, date_iso: str):
        self.symbol = symbol
        self.date_iso = date_iso


def _resolve_provider(path: str):
    mod, _, fn = path.partition(":")
    if not fn:
        raise ValueError(
            f"fetch_provider must be 'module:function', got {path!r}"
        )
    return getattr(importlib.import_module(mod), fn)


class _TickRestReader(DataSourceReader):
    def __init__(self, options: dict):
        symbols = options.get("symbols", "")
        self.symbols = [s.strip() for s in symbols.split(",") if s.strip()]
        if not self.symbols:
            raise ValueError("trade_rest: 'symbols' option is required (CSV)")
        try:
            self.start = date_t.fromisoformat(options["start"])
            self.end = date_t.fromisoformat(options["end"])
        except KeyError as e:
            raise ValueError(f"trade_rest: missing required option {e}") from None
        self.provider = options.get(
            "fetch_provider",
            "auto_trade_data_pipeline_spark.sources.pyds:synthetic_fetch",
        )
        self.batch_size = int(options.get("batch_size", 24_000))
        self.calls_per_min = int(options.get("calls_per_min", 130))
        self.tasks_sharing_budget = int(options.get("tasks_sharing_budget", 4))
        self.max_attempts = int(options.get("max_attempts", 5))

    def partitions(self):
        # (symbol, weekday) grid — NY weekends dropped, the same plan
        # trading_day_plan builds declaratively (date is the unit of
        # parallelism, as in the reference's process pool).
        out = []
        d = self.start
        while d <= self.end:
            if d.isoweekday() not in (6, 7):
                for s in self.symbols:
                    out.append(_DayPartition(s, d.isoformat()))
            d += timedelta(days=1)
        return out

    def read(self, partition: _DayPartition):
        from auto_trade_data_pipeline_spark.sources.rest import RateLimiter, with_retry

        fetch = _resolve_provider(self.provider)
        limiter = RateLimiter(max(1, self.calls_per_min // self.tasks_sharing_budget))
        symbol, date_iso = partition.symbol, partition.date_iso
        skip = 0
        while True:
            limiter.acquire()
            page = with_retry(
                lambda: fetch(symbol, date_iso, self.batch_size, skip),
                max_attempts=self.max_attempts,
            )
            ts = page.get("t") or []
            if not ts:
                return
            for i, (t, p, v) in enumerate(zip(ts, page["p"], page["v"])):
                yield (
                    symbol,
                    datetime.fromtimestamp(t / 1000.0, tz=timezone.utc).replace(
                        tzinfo=None
                    ),
                    float(p),
                    float(v),
                    skip + i,
                )
            if len(ts) < self.batch_size:
                return
            skip += len(ts)


class TickRestDataSource(DataSource):
    """`spark.read.format("trade_rest")` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "trade_rest"

    def schema(self) -> str:
        return TICK_SCHEMA_DDL

    def reader(self, schema) -> DataSourceReader:
        return _TickRestReader(self.options)
