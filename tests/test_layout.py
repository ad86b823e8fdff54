"""Z-order layout — file-level pruning on BOTH dimensions."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.operators.layout import (
    with_zorder_key,
    write_zordered,
)


def _files_overlapping(path, col, lo, hi):
    """Count parquet files whose footer [min, max] for `col` intersects
    [lo, hi] — the files a stats-pruning scan must actually read."""
    hits = 0
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        fmin = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        fmax = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        if fmax >= lo and fmin <= hi:
            hits += 1
    return hits


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    # 64k uniform 2D grid: x row-major, y column-major — a linear x
    # sort gives perfect x pruning and ZERO y pruning.
    n = 256
    df = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).cast("double").alias("x"),
            (F.col("id") / n).cast("long").cast("double").alias("y"),
        )
    )
    n_files = 16
    linear = str(tmp_path / "linear")
    (
        df.repartitionByRange(n_files, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zordered = str(tmp_path / "zorder")
    write_zordered(df, zordered, ["x", "y"], n_files=n_files)

    # A narrow y-slab (1/16 of the domain).
    lo, hi = 64.0, 79.0
    lin_hits = _files_overlapping(linear, "y", lo, hi)
    z_hits = _files_overlapping(zordered, "y", lo, hi)
    # Linear-by-x layout cannot prune on y at all.
    assert lin_hits == n_files
    # Z-order confines the slab to a minority of files.
    assert z_hits <= n_files // 2, f"z-order read {z_hits}/{n_files} files"
    # ... and still prunes on x (a narrow x-slab also hits few files).
    assert _files_overlapping(zordered, "x", 64.0, 79.0) <= n_files // 2
    # Values survive the rewrite intact.
    assert spark.read.parquet(zordered).count() == n * n


def test_zorder_key_null_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(1.0, None), (2.0, 5.0), (None, 5.0)], "a double, b double"
    )
    out = with_zorder_key(df, ["a", "b"], bits=4).df.collect()
    assert len(out) == 3
    assert all(r["__z"] is not None and r["__z"] >= 0 for r in out)


def test_interleave_rejects_sign_bit_overflow():
    """4 dims x 16 bits = 64 interleaved bits — the top bit would land
    in the signed long's sign bit, producing negative z-keys that sort
    before positive ones. The guard must refuse loudly."""
    import pytest
    from pyspark.sql import functions as F

    from auto_trade_data_pipeline_spark.operators.layout import _interleave

    with pytest.raises(ValueError, match="sign"):
        _interleave([F.col(c) for c in "abcd"], 16)
    # 4 dims x 15 bits = 60 bits fits
    _interleave([F.col(c) for c in "abcd"], 15)


def test_zorder_single_upstream_execution(spark):
    """Round-4 verdict item 6: with_zorder_key persists its input, so
    the bounds aggregate and the keyed output both read the cache —
    the upstream executes once (InMemoryTableScan in the plan), and a
    non-deterministic upstream cannot disagree with its own bounds."""
    from auto_trade_data_pipeline_spark.operators.layout import with_zorder_key

    df = spark.range(1000).selectExpr("id", "id % 37 AS a", "id % 11 AS b")
    z = with_zorder_key(df, ["a", "b"], bits=8)
    plan = z.df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    assert z.df.count() == 1000
    # Round-6 advice: ownership is an explicit handle, not attributes
    # monkeypatched onto the DataFrame (a caller select/filter dropped
    # those silently); release() is idempotent.
    assert z.owns_cache is True
    z.release()
    z.release()


def test_zorder_respects_caller_persist(spark):
    """Round-5 advice: if the CALLER already persisted the input,
    with_zorder_key must not re-persist it, and write_zordered must
    not release the caller's cache as a side effect."""
    from pyspark import StorageLevel

    from auto_trade_data_pipeline_spark.operators.layout import with_zorder_key

    df = spark.range(100).selectExpr("id", "id % 7 AS a", "id % 5 AS b").persist()
    try:
        df.count()
        z = with_zorder_key(df, ["a", "b"], bits=8)
        assert z.owns_cache is False
        assert z.df.count() == 100
        z.release()  # must NOT touch the caller's cache
        assert df.storageLevel != StorageLevel.NONE, "caller's cache was released"
    finally:
        df.unpersist()
