"""Query-scoped cache ownership (round-6 verdict item 3).

Corpus query builders — and the library operators they call — persist
shared intermediates whose returned plans still READ those caches
lazily, so the builder cannot unpersist before returning. This module
gives those persists an OWNER (the corpus query being built) and a
release point (the next time a DIFFERENT corpus query is built), so
looping the corpus API accumulates at most one query's caches instead
of one cache entry per call.

Layering: this module knows nothing about the corpus registry; the
registry wrapper (corpus/__init__.py) calls :func:`begin_scope` /
:func:`release_scoped_caches`. Library operators call
:func:`scoped_persist`, which inherits whatever scope is active —
inside a corpus build they are tagged with that query's name; called
directly (tests, library users) with NO scope active they fall back
to a plain ``persist()`` and are NOT tracked, preserving the
caller-managed contract documented on each operator.

Unpersisting a consumed plan is always CORRECT (Spark recomputes) —
but note operators like ranking's distributed zipWithIndex pin
range-exchange boundaries via their persist: their results must be
consumed before the next corpus query is built (the build → collect →
build flow of the driver, bench, and verify harnesses), exactly the
same contract `spark.catalog.clearCache()` between queries imposes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[tuple[str, DataFrame]] = []
_CURRENT: str | None = None


def begin_scope(name: str) -> None:
    """Enter the build scope of corpus query ``name``: release every
    other query's scoped caches, then tag subsequent scoped persists
    with ``name``. Same-name re-entry (bench.py's min-of-N passes of
    one query) keeps the existing caches so pass 2+ reuses pass 1's
    fill. Pair with :func:`end_scope` when the build returns — a
    scope left open would capture (and later release) persists made
    by DIRECT library-operator calls whose caches are the caller's to
    manage."""
    global _CURRENT
    release_scoped_caches(keep=name)
    _CURRENT = name


def end_scope() -> None:
    """Leave the current build scope: subsequent persists are plain
    caller-managed again. Already-tracked caches stay tracked (they
    are released when a different query next begins)."""
    global _CURRENT
    _CURRENT = None


def scoped_persist(df: DataFrame) -> DataFrame:
    """``df.persist()``, owned by the active scope (see module doc).
    With no scope active this is a plain ``persist()`` — untracked,
    caller-managed."""
    df = df.persist()
    if _CURRENT is not None:
        _LIVE.append((_CURRENT, df))
    return df


def release_scoped_caches(keep: str | None = None) -> None:
    """Unpersist every scoped cache except those owned by ``keep``."""
    kept: list[tuple[str, DataFrame]] = []
    while _LIVE:
        owner, df = _LIVE.pop()
        if keep is not None and owner == keep:
            kept.append((owner, df))
            continue
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
    _LIVE.extend(reversed(kept))
