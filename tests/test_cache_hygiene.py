"""Corpus cache hygiene — round-6 verdict item 3 / advice.

Corpus query builders persist shared intermediates (the tape feeding
three branches in ``upsert_merge``, LSH shingle/signature tables, GD
feature tables, ...). The builders return LAZY plans that still read
those caches, so they cannot unpersist before returning; instead
``corpus.scoped_persist`` tags each cache with the owning query and
the registry wrapper releases every OTHER query's caches when a query
is built. These tests pin the two halves of that contract:

1. looping corpus queries in one session does NOT grow the JVM cache
   registry (the round-6 leak: one entry per builder call, until LRU
   eviction pressure);
2. rebuilding the SAME query keeps its caches (bench.py's min-of-N
   passes rely on pass 2+ reusing pass 1's cache fill);
3. no corpus builder uses a bare ``.persist()`` — every corpus-level
   cache must be scoped so the release wrapper sees it.
"""

from __future__ import annotations

import glob
import os

import pytest

from auto_trade_data_pipeline_spark import corpus

pytestmark = pytest.mark.usefixtures("spark")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TINY", "/root/testdata/sf0.001")
CORPUS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "auto_trade_data_pipeline_spark",
    "corpus",
)


def _n_cached(spark) -> int:
    """Entries in the SQL CacheManager — exactly what `persist()` on a
    DataFrame registers and `unpersist()` removes. (NOT SparkContext
    persistent-RDD count: that also sees localCheckpoint RDDs from
    unrelated earlier tests until GC, making full-suite runs flaky.)"""
    return spark._jsparkSession.sharedState().cacheManager().numCachedEntries()


def test_looping_persisted_queries_does_not_grow_cache(spark):
    reg = corpus.load_all()
    spark.catalog.clearCache()
    corpus.release_query_caches()
    # Two persisted queries alternated twice: the wrapper must release
    # the other query's caches at each build, so the cache registry
    # count at the same loop point is IDENTICAL across iterations.
    # upsert_merge persists in its builder; gini_concentration's
    # persist happens INSIDE a library operator (ranking's distributed
    # zipWithIndex) — it inherits the corpus scope via cache_scope as
    # a PINNED entry (range-bounds metadata), which survives scope
    # changes but dedups by canonical plan, so loops still cannot
    # grow the registry. Loop 1 warms the pinned entry; loops 2+ must
    # be in steady state.
    names = ["upsert_merge", "gini_concentration"]
    counts = []
    for _ in range(3):
        for name in names:
            df = reg[name].fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            counts.append(_n_cached(spark))
    assert counts[0] >= 1, "upsert_merge should persist its tape"
    assert counts[2:4] == counts[4:6], f"cache registry grew across loops: {counts}"
    # Explicit full release drops everything, pinned entries included.
    corpus.release_query_caches()
    assert _n_cached(spark) == 0


def test_same_query_rebuild_keeps_cache(spark):
    """bench.py rebuilds a query per timing pass — pass 2 must reuse
    pass 1's cache fill (release only fires on a DIFFERENT query)."""
    reg = corpus.load_all()
    spark.catalog.clearCache()
    corpus.release_query_caches()
    df1 = reg["upsert_merge"].fn(spark, SF_DIR)
    df1.write.mode("overwrite").format("noop").save()
    before = _n_cached(spark)
    assert before >= 1
    # Rebuild: the persisted tape's canonical plan is identical, so
    # the CacheManager must NOT register a second entry, and the
    # existing one must survive the wrapper's release pass.
    df2 = reg["upsert_merge"].fn(spark, SF_DIR)
    df2.write.mode("overwrite").format("noop").save()
    assert _n_cached(spark) == before
    corpus.release_query_caches()
    assert _n_cached(spark) == 0


def test_direct_operator_persist_after_corpus_build_is_caller_managed(spark):
    """Round-7 review: the registry wrapper must CLOSE its scope after
    the build — otherwise a direct library call between corpus builds
    (whose persist is documented caller-managed) would be captured
    under the stale query name and yanked by the next corpus build,
    recomputing ranking's range exchange independently of its pinned
    offsets."""
    from auto_trade_data_pipeline_spark import cache_scope
    from auto_trade_data_pipeline_spark.operators.ranking import global_row_number

    reg = corpus.load_all()
    spark.catalog.clearCache()
    corpus.release_query_caches()
    reg["upsert_merge"].fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
    assert cache_scope._CURRENT is None, "corpus build left its scope open"
    tracked_before = len(cache_scope._LIVE)
    # Direct library call AFTER the corpus build returned: its internal
    # persist must be plain/untracked (caller-managed contract).
    ranked = global_row_number(spark.range(100).selectExpr("id", "id % 3 AS k"), ["id"])
    assert ranked.count() == 100
    assert len(cache_scope._LIVE) == tracked_before, (
        "direct operator persist was captured by a stale corpus scope"
    )
    # Building another corpus query releases the tracked upsert_merge
    # caches but must NOT touch the direct call's untracked cache:
    # afterwards the CacheManager holds exactly the direct cache plus
    # whatever the new query tracked.
    reg["doc_tokens_fingerprint"].fn(spark, SF_DIR).write.mode("overwrite").format(
        "noop"
    ).save()
    assert _n_cached(spark) == 1 + len(cache_scope._LIVE), (
        "direct library persist was released by the corpus build"
    )
    spark.catalog.clearCache()
    corpus.release_query_caches()


def test_no_bare_persist_in_corpus_builders():
    """Every corpus-level cache must go through scoped_persist, or the
    release wrapper cannot see it and the round-6 leak returns."""
    offenders = []
    for path in glob.glob(os.path.join(CORPUS_DIR, "*.py")):
        if os.path.basename(path) == "__init__.py":  # scoped_persist itself
            continue
        src = open(path).read()
        for i, line in enumerate(src.splitlines(), 1):
            if ".persist(" in line and "scoped_persist" not in line:
                offenders.append(f"{os.path.basename(path)}:{i}: {line.strip()}")
    assert not offenders, "\n".join(offenders)
