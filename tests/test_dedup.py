"""Dedup / upsert determinism + idempotence (FIXTURES.md §C.4)."""

from __future__ import annotations

from datetime import datetime

from auto_trade_data_pipeline_spark import schemas
from auto_trade_data_pipeline_spark.operators.dedup import dedup_keep_last, upsert


def _df(spark, rows):
    return spark.createDataFrame(
        [(s, datetime(2024, 1, 1, 0, 0, sec), p, v, i) for s, sec, p, v, i in rows],
        schema=schemas.TICKS,
    )


def test_keep_last_by_order_col(spark):
    df = _df(
        spark,
        [
            ("NVDA", 1, 10.0, 1.0, 1),
            ("NVDA", 1, 11.0, 1.0, 3),  # same key, higher id wins
            ("NVDA", 1, 12.0, 1.0, 2),
            ("AAPL", 1, 20.0, 1.0, 4),
        ],
    )
    out = dedup_keep_last(df, ["symbol", "timestamp"], ["tick_id"]).collect()
    got = {(r.symbol): r.price for r in out}
    assert got == {"NVDA": 11.0, "AAPL": 20.0}


def test_upsert_updates_win_and_idempotent(spark):
    old = _df(spark, [("NVDA", 1, 10.0, 1.0, 1), ("NVDA", 2, 20.0, 1.0, 2)])
    new = _df(spark, [("NVDA", 2, 99.0, 9.0, 3), ("NVDA", 3, 30.0, 1.0, 4)])

    once = upsert(old, new, keys=["symbol", "timestamp"], assume_unique_updates=True)
    rows = {r.timestamp.second: (r.price, r.volume) for r in once.collect()}
    assert rows == {1: (10.0, 1.0), 2: (99.0, 9.0), 3: (30.0, 1.0)}

    twice = upsert(once, new, keys=["symbol", "timestamp"], assume_unique_updates=True)
    assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, once.collect()))


def test_upsert_refuses_ambiguous_duplicate_updates(spark):
    """Duplicate keys in updates with no order_cols used to pass both
    copies through the anti-join silently; now the operator refuses."""
    import pytest

    old = _df(spark, [("NVDA", 1, 10.0, 1.0, 1)])
    dup = _df(spark, [("NVDA", 1, 50.0, 1.0, 2), ("NVDA", 1, 60.0, 1.0, 3)])

    with pytest.raises(ValueError, match="order_cols"):
        upsert(old, dup, keys=["symbol", "timestamp"])
    with pytest.raises(ValueError, match="duplicate keys"):
        upsert(old, dup, keys=["symbol", "timestamp"], assume_unique_updates=True)


def test_upsert_dedups_updates_batch(spark):
    old = _df(spark, [("NVDA", 1, 10.0, 1.0, 1)])
    new = _df(spark, [("NVDA", 1, 50.0, 1.0, 2), ("NVDA", 1, 60.0, 1.0, 3)])
    out = upsert(old, new, keys=["symbol", "timestamp"], order_cols=["tick_id"])
    assert [r.price for r in out.collect()] == [60.0]


def test_global_running_sum_matches_sequential_and_is_partition_invariant(spark):
    from auto_trade_data_pipeline_spark.operators.ranking import global_running_sum

    rows = [(i, (i * 37) % 101, (i % 7) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, key long, wt long").repartition(13)
    out = {r.id: r.cum for r in global_running_sum(df, ["key", "id"], "wt", "cum").collect()}
    acc = 0
    for i, _k, w in sorted(rows, key=lambda t: (t[1], t[0])):
        acc += w
        assert out[i] == acc
    out1 = {
        r.id: r.cum
        for r in global_running_sum(
            df.coalesce(1), ["key", "id"], "wt", "cum"
        ).collect()
    }
    assert out == out1


def test_global_running_sum_all_null_partition(spark):
    """Round-5 advice: a range partition holding only NULL values
    makes F.sum return NULL for that partition — the driver offsets
    loop must treat it as 0, not crash on int += None. Keys 0..9 all
    carry NULL weights and many range partitions are requested, so at
    least one partition is all-NULL."""
    from auto_trade_data_pipeline_spark.operators.ranking import global_running_sum

    rows = [(i, i, None if i < 10 else (i % 5) + 1) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, key long, wt long")
    out = {
        r.id: r.cum
        for r in global_running_sum(
            df, ["key", "id"], "wt", "cum", num_partitions=8
        ).collect()
    }
    acc = 0
    for i, _k, w in rows:
        acc += w or 0
        assert out[i] == acc


def test_cdc_apply_tombstones_updates_and_inserts(spark):
    from auto_trade_data_pipeline_spark.operators.dedup import cdc_apply
    from pyspark.sql import functions as F

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, payload string"
    )
    # key 1: updated twice (v2 wins); key 2: updated then deleted;
    # key 4: inserted fresh; key 3: untouched.
    chg = spark.createDataFrame(
        [
            (1, "a1", 1, "U"),
            (1, "a2", 2, "U"),
            (2, "b1", 1, "U"),
            (2, None, 2, "D"),
            (4, "d", 1, "U"),
        ],
        "k long, payload string, v long, op string",
    )
    out = cdc_apply(snap, chg.select("k", "payload", "v", "op"), ["k"], ["v"])
    got = {r.k: r.payload for r in out.collect()}
    assert got == {1: "a2", 3: "c", 4: "d"}
    # Idempotence: applying the same changelog onto the result changes
    # nothing (per-key last ops are the same).
    again = cdc_apply(out, chg.select("k", "payload", "v", "op"), ["k"], ["v"])
    assert {r.k: r.payload for r in again.collect()} == got
    # Batch-split equivalence: applying v=1 then v=2 == applying both.
    step1 = cdc_apply(snap, chg.filter(F.col("v") == 1), ["k"], ["v"])
    step2 = cdc_apply(step1, chg.filter(F.col("v") == 2), ["k"], ["v"])
    assert {r.k: r.payload for r in step2.collect()} == got


def test_global_running_max_exclusive_matches_sequential_and_partition_invariant(spark):
    from auto_trade_data_pipeline_spark.operators.ranking import global_running_max

    rows = [(i, (i * 37) % 101, ((i * 13) % 29) - 5) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, key long, v long").repartition(13)
    out = {
        r.id: r.m
        for r in global_running_max(df, ["key", "id"], "v", "m").collect()
    }
    run = None
    for i, _k, v in sorted(rows, key=lambda t: (t[1], t[0])):
        assert out[i] == run, f"id {i}: {out[i]} != {run}"
        run = v if run is None or v > run else run
    out1 = {
        r.id: r.m
        for r in global_running_max(df.coalesce(1), ["key", "id"], "v", "m").collect()
    }
    assert out == out1


def test_global_running_max_skips_nulls_like_sql_window(spark):
    """Round-4 advice: NULL values must be skipped (max() OVER
    semantics) — a null row still sees the prior running max, rows
    before the first non-null get NULL — and non-integral floats
    raise instead of silently flooring."""
    import pytest

    from auto_trade_data_pipeline_spark.operators.ranking import global_running_max

    rows = [(0, None), (1, 5), (2, None), (3, 3), (4, 9), (5, None)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(3)
    out = {r.id: r.m for r in global_running_max(df, ["id"], "v", "m").collect()}
    assert out == {0: None, 1: None, 2: 5, 3: 5, 4: 5, 5: 9}

    bad = spark.createDataFrame([(0, 1.5), (1, 2.0)], "id long, v double")
    with pytest.raises(Exception, match="(?i)cast|convert"):
        global_running_max(bad, ["id"], "v", "m").collect()
