"""Query corpus — the named, oracle-checked surface of the engine.

Every operator from SURVEY.md §2 that is implemented gets a named
query here; the driver runs each against its DuckDB oracle at sf0.01
(row-count + schema + order-insensitive value hash).

Oracle-parity conventions (applied on BOTH sides so hashes match):
- every computed column is aliased identically in Spark and SQL;
- timestamp outputs are formatted to strings
  (``yyyy-MM-dd HH:mm:ss[.SSSSSS]`` / ``%Y-%m-%d %H:%M:%S[.%f]``) —
  sidesteps tz-localization differences between Spark collect and
  DuckDB;
- floating aggregates over many rows are ``round(x, 4)`` on both
  sides (double summation order differs under parallelism at ~1e-9
  relative; 1e-4 absolute rounding absorbs it — SURVEY §7 hard-part 6);
- deterministic total orderings everywhere a window or first/last is
  involved (unique id tiebreakers).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = ()):
    """Decorator: add a (spark_fn, duckdb_oracle) pair to the corpus."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every corpus module (side effect: fills REGISTRY)."""
    from auto_trade_data_pipeline_spark.corpus import (  # noqa: F401
        anchors,
        enrich,
        ext,
        indicators,
        stream,
        tpch,
        trade,
    )

    return REGISTRY
