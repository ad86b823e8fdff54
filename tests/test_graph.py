"""Connected-components dedup grouping + training-mix operators."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.operators import text as TX
from auto_trade_data_pipeline_spark.operators.graph import (
    component_sizes,
    connected_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_cc_resolves_chain_clique_and_singleton_pair(spark):
    # Components: chain {1,2,3,4}, clique {10,11,12}, pair {20,21}.
    edges = _edges(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
    )
    labels = {r.node: r.component for r in connected_components(edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_cc_long_chain_needs_diameter_rounds(spark):
    # A 12-node path: min label must walk the whole diameter.
    edges = _edges(spark, [(i, i + 1) for i in range(12)])
    labels = connected_components(edges)
    assert {r.component for r in labels.collect()} == {0}
    sizes = component_sizes(labels)
    assert sizes.filter(F.col("group_size") != 13).isEmpty()


def test_cc_edge_direction_is_irrelevant(spark):
    # Same component whether the pair arrives (lo, hi) or (hi, lo).
    a = connected_components(_edges(spark, [(5, 9), (9, 7)])).collect()
    b = connected_components(_edges(spark, [(9, 5), (7, 9)])).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert {r.component for r in a} == {5}


def test_cc_raises_on_max_iters(spark):
    edges = _edges(spark, [(i, i + 1) for i in range(6)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iters=2)


def test_pack_sequences_places_docs_contiguously(spark):
    df = spark.createDataFrame(
        [(1, "a", 300), (2, "a", 300), (3, "a", 300), (4, "b", 700)],
        "doc_id long, shard string, n_tokens long",
    )
    out = {
        r.doc_id: (r.seq_id, r.seq_offset)
        for r in TX.pack_sequences(df, "n_tokens", "doc_id", ["shard"], 512).collect()
    }
    # Shard a stream: doc1 @ 0, doc2 @ 300 (seq 0), doc3 @ 600 -> seq 1 off 88.
    assert out[1] == (0, 0)
    assert out[2] == (0, 300)
    assert out[3] == (1, 88)
    # Shard b independent: starts its own stream at (0, 0).
    assert out[4] == (0, 0)


def test_hash_split_deterministic_and_partitions(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    bucket, split = TX.hash_split(F.col("doc_id"))
    out = df.select("doc_id", bucket.alias("b"), split.alias("s"))
    counts = {r.s: r.cnt for r in out.groupBy("s").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == {"train", "val", "test"}
    # ~80/10/10 with hash noise.
    assert 700 < counts["train"] < 900
    # Re-evaluating yields identical assignments (no sampling state).
    again = df.select("doc_id", split.alias("s2"))
    joined = out.join(again, "doc_id")
    assert joined.filter(F.col("s") != F.col("s2")).isEmpty()


def test_star_cc_matches_propagation_on_mixed_graph(spark):
    edges = _edges(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21), (4, 2)],
    )
    from auto_trade_data_pipeline_spark.operators.graph import connected_components_star

    star = {r.node: r.component for r in connected_components_star(edges).collect()}
    prop = {r.node: r.component for r in connected_components(edges).collect()}
    assert star == prop


def test_star_cc_long_chain_logarithmic_rounds(spark):
    # A 64-node path has diameter 63: propagation needs >60 rounds,
    # star contraction must close it in O(log n) — well under 10.
    from auto_trade_data_pipeline_spark.operators.graph import connected_components_star

    edges = _edges(spark, [(i, i + 1) for i in range(64)])
    labels = connected_components_star(edges, max_iters=10)
    rows = labels.collect()
    assert {r.component for r in rows} == {0}
    assert {r.node for r in rows} == set(range(65))


def test_star_cc_reversed_and_duplicate_edges(spark):
    from auto_trade_data_pipeline_spark.operators.graph import connected_components_star

    a = connected_components_star(_edges(spark, [(9, 5), (5, 9), (7, 9), (7, 9)]))
    assert {r.component for r in a.collect()} == {5}
    assert {r.node for r in a.collect()} == {5, 7, 9}
