"""KMV quantile sketch — the mergeability contract behind its 100 TB
claim (union of per-partition bottom-k == global bottom-k) and the
sample-quantile accuracy band on real data."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from auto_trade_data_pipeline_spark.corpus import load_all
from auto_trade_data_pipeline_spark.corpus.events_analytics import KMVQ_K
from auto_trade_data_pipeline_spark.operators.text import hash64
from auto_trade_data_pipeline_spark.sources import load_table


def _bottom_k(df, k):
    w = Window.partitionBy("event_type").orderBy("hv", "cents")
    return (
        df.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .drop("r")
    )


def test_bottom_k_sample_is_mergeable(spark, sf_small):
    """Merge-order independence — the property KLL/GK lack: computing
    bottom-k on arbitrary disjoint parts and then bottom-k of the
    union yields EXACTLY the single-pass sample."""
    ev = load_table(spark, sf_small, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        hash64(F.col("event_id").cast("string"), salt="kmvq").alias("hv"),
    )
    whole = sorted(map(tuple, _bottom_k(ev, KMVQ_K).collect()))
    parts = [ev.filter(F.pmod("hv", F.lit(3)) == i) for i in range(3)]
    merged = _bottom_k(
        parts[0].unionByName(parts[1]).unionByName(parts[2]), KMVQ_K
    )
    partial_then_merge = _bottom_k(
        _bottom_k(parts[0], KMVQ_K)
        .unionByName(_bottom_k(parts[1], KMVQ_K))
        .unionByName(_bottom_k(parts[2], KMVQ_K)),
        KMVQ_K,
    )
    assert sorted(map(tuple, merged.collect())) == whole
    assert sorted(map(tuple, partial_then_merge.collect())) == whole


def test_estimates_sit_in_the_neighbour_percentile_band(spark, sf_small):
    """Each estimate must land between the exact (q-10)th and (q+10)th
    percentiles of its group — the rank-error band a 128-row uniform
    sample comfortably satisfies on this data (deterministic: the
    hash family is fixed)."""
    rows = load_all()["kmv_quantile_sketch"].fn(spark, sf_small).collect()
    assert len(rows) > 0
    ev = load_table(spark, sf_small, "events").select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("cents")
    ranked = (
        ev.withColumn("rr", F.row_number().over(w))
        .groupBy("event_type")
        .agg(
            F.max("rr").alias("n"),
            F.sort_array(F.collect_list("cents")).alias("vals"),
        )
        .collect()
    )
    exact = {r["event_type"]: r["vals"] for r in ranked}
    for r in rows:
        vals = exact[r["event_type"]]
        n = len(vals)
        for q in (50, 90, 99):
            lo = vals[max(0, -(-n * max(q - 10, 1) // 100) - 1)]
            hi = vals[min(n - 1, -(-n * min(q + 10, 100) // 100) - 1)]
            est = r[f"est_p{q}"]
            assert lo <= est <= hi, (r["event_type"], q, est, lo, hi)
            # And the exact column really is the exact order statistic.
            idx = max(1, -(-n * q // 100)) - 1
            assert r[f"exact_p{q}"] == vals[idx]


def test_streaming_out_schema_follows_qs():
    """A non-default qs must produce correctly-labeled columns (the
    schema is derived from qs, never hardcoded)."""
    from auto_trade_data_pipeline_spark.streaming.sketch import _kmvq_out_schema

    names = [f.name for f in _kmvq_out_schema((25, 75)).fields]
    assert names == ["group_key", "n_rows", "sample_n", "est_p25", "est_p75", "updates"]


def test_streaming_quantile_multibatch_equals_batch(spark, tmp_path):
    """Multi-batch replay parity: the streaming bottom-k sample state
    merged across micro-batches yields EXACTLY the batch estimates —
    mergeability live in Structured Streaming, across a batch
    boundary that splits every group."""
    import uuid as _uuid

    from auto_trade_data_pipeline_spark.streaming.sketch import (
        streaming_kmv_quantile,
    )

    d = str(tmp_path / "ev")
    schema = "group_key string, hv long, cents long"
    # Interleaved a/b so the 250-row file split lands BOTH groups in
    # BOTH micro-batches — every group exercises the state-merge path.
    rows = [
        (g, int(hashlib.md5(f"kmvq|{g}{i}".encode()).hexdigest()[:15], 16), (i * 37) % 1000 + 1)
        for i in range(300)
        for g in ("a", "b")
    ]
    spark.createDataFrame(rows[:250], schema).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(rows[250:], schema).coalesce(1).write.mode("append").parquet(d)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    name = f"t_kmvq_{_uuid.uuid4().hex[:8]}"
    q = (
        streaming_kmv_quantile(stream, k=64)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name).collect()
    assert max(r["updates"] for r in out) >= 2  # genuinely multi-batch
    latest = {}
    for r in out:
        if r["group_key"] not in latest or r["updates"] > latest[r["group_key"]]["updates"]:
            latest[r["group_key"]] = r

    # Batch expectation straight from the definition, in Python.
    for g in ("a", "b"):
        grp = sorted((hv, c) for gg, hv, c in rows if gg == g)[:64]
        sv = sorted(c for _, c in grp)
        m = len(sv)
        r = latest[g]
        assert r["n_rows"] == 300 and r["sample_n"] == m
        for q_ in (50, 90, 99):
            assert r[f"est_p{q_}"] == sv[max(1, (m * q_ + 99) // 100) - 1], (g, q_)
