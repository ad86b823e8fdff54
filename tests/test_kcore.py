"""kcore_prune — peeling semantics against a pure-Python reference,
and the fixed-round contract (rounds vs rounds+1 identical once the
fixpoint is reached)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.operators.graph import kcore_prune


def _py_kcore(edges, k):
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    g = {u: set(vs) for u, vs in adj.items()}
    while True:
        drop = [u for u, vs in g.items() if len(vs) < k]
        if not drop:
            return {u: len(vs) for u, vs in g.items()}
        for u in drop:
            for v in g[u]:
                g[v].discard(u)
            del g[u]


def test_kcore_matches_python_reference(spark):
    """Barbell: a K5 clique, a chain hanging off it, and a K3 triangle
    bridged in — the 3-core must be exactly the K5 (the chain peels,
    the triangle peels because its bridge node loses its chain
    support), with within-core degrees."""
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    chain = [(4, 10), (10, 11), (11, 12)]
    tri = [(12, 20), (20, 21), (21, 12)]
    edges = k5 + chain + tri
    expect = _py_kcore(edges, 3)
    got = {
        r["node"]: r["core_deg"]
        for r in kcore_prune(
            spark.createDataFrame(edges, "id_a long, id_b long"), k=3, rounds=6
        ).collect()
    }
    assert got == expect
    assert set(got) == {0, 1, 2, 3, 4}  # the K5 only
    assert all(d == 4 for d in got.values())


def test_kcore_fixed_rounds_reach_fixpoint(spark, sf_small):
    """The corpus query's contract: KCORE_ROUNDS is PAST the
    fixpoint, so one more round changes nothing — checked on the real
    co-purchase graph at sf0.001 with a k that keeps survivors."""
    from auto_trade_data_pipeline_spark.sources import load_table

    li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_partkey")
    items = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pk")
    ).distinct()
    b = items.select(F.col("okey").alias("okey_b"), F.col("pk").alias("pk_b"))
    pairs = (
        items.join(
            b, (F.col("okey") == F.col("okey_b")) & (F.col("pk") < F.col("pk_b"))
        )
        .select(F.col("pk").alias("id_a"), F.col("pk_b").alias("id_b"))
        .distinct()
        .persist()
    )
    try:
        r4 = sorted(map(tuple, kcore_prune(pairs, k=60, rounds=4).collect()))
        r5 = sorted(map(tuple, kcore_prune(pairs, k=60, rounds=5).collect()))
    finally:
        pairs.unpersist()
    assert r4 == r5 and len(r4) > 0
