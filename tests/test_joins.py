"""Join operators — as-of join semantics and broadcast plan shapes."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.operators.joins import asof_join, range_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 1),
            ("A", _ts("2024-01-01 10:00:05"), 2),
            ("A", _ts("2024-01-01 10:00:10"), 3),  # exact tie with right
            ("A", _ts("2024-01-01 09:59:00"), 4),  # before any right row
            ("B", _ts("2024-01-01 10:00:07"), 5),
        ],
        "symbol string, timestamp timestamp, id int",
    )
    right = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0),
            ("A", _ts("2024-01-01 10:00:10"), 110.0),
            ("B", _ts("2024-01-01 10:00:06"), 200.0),
        ],
        "symbol string, timestamp timestamp, px double",
    )
    out = {r["id"]: r["px"] for r in asof_join(left, right, on=["symbol"]).collect()}
    assert out[1] == 100.0  # exact match at ts
    assert out[2] == 100.0  # carried forward
    assert out[3] == 110.0  # tie -> inclusive (right at same instant wins)
    assert out[4] is None  # nothing at-or-before
    assert out[5] == 200.0


def test_asof_join_keeps_all_left_rows(spark):
    left = spark.range(50).select(
        F.lit("S").alias("symbol"),
        F.timestamp_seconds(F.col("id") * 10 + 1_700_000_000).alias("timestamp"),
        F.col("id"),
    )
    right = spark.range(5).select(
        F.lit("S").alias("symbol"),
        F.timestamp_seconds(F.col("id") * 100 + 1_700_000_000).alias("timestamp"),
        (F.col("id") * 1.0).alias("v"),
    )
    assert asof_join(left, right, on=["symbol"]).count() == 50


def test_range_join_broadcasts(spark):
    facts = spark.range(1000).select((F.col("id") % 97 * 1.0).alias("x"))
    bands = spark.createDataFrame(
        [("lo", 0.0, 50.0), ("hi", 50.0, 100.0)], "band string, lo double, hi double"
    )
    joined = range_join(facts, bands, F.col("x"), F.col("lo"), F.col("hi"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    counts = {r["band"]: r["n"] for r in joined.groupBy("band").agg(F.count("*").alias("n")).collect()}
    assert counts["lo"] + counts["hi"] == 1000


def test_dim_join_is_broadcast(spark, sf_med):
    """VERDICT item 5: assert the dimension side of a star join stays
    broadcast (no shuffle of the fact side for dim joins)."""
    from auto_trade_data_pipeline_spark.corpus.tpch import join_broadcast_nation_region

    plan = (
        join_broadcast_nation_region(spark, sf_med)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_asof_forward_picks_next_and_respects_equal_ts(spark):
    from datetime import datetime

    from auto_trade_data_pipeline_spark.operators.joins import asof_join_forward

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [("A", t(1), 1), ("A", t(5), 2), ("A", t(9), 3), ("B", t(2), 4)],
        "symbol string, timestamp timestamp, lid long",
    )
    right = spark.createDataFrame(
        [("A", t(5), 50.0), ("A", t(7), 70.0)],
        "symbol string, timestamp timestamp, px double",
    )
    out = {r.lid: r.px for r in asof_join_forward(left, right, ["symbol"]).collect()}
    # t=1 -> next is t=5; t=5 -> inclusive same-instant match; t=9 ->
    # nothing after -> null; other key -> null.
    assert out == {1: 50.0, 2: 50.0, 3: None, 4: None}


def test_asof_forward_uses_incremental_frame(spark):
    """Round-10: the forward as-of frame must be the incremental
    (UNBOUNDED PRECEDING .. CURRENT ROW over descending ts) form —
    Spark evaluates an UNBOUNDED FOLLOWING frame by re-aggregating
    the partition tail for every row, O(n^2) per partition (measured
    68 s on the sf0.1 tick tape before the rewrite)."""
    from pyspark.sql import functions as F

    from auto_trade_data_pipeline_spark.operators.joins import asof_join_forward

    left = spark.createDataFrame(
        [("S", 1, 10.0), ("S", 3, 11.0)], "symbol string, timestamp long, price double"
    )
    right = spark.createDataFrame(
        [("S", 2, 5.0), ("S", 4, 6.0)], "symbol string, timestamp long, pay double"
    )
    out = asof_join_forward(left, right, on=["symbol"], ts="timestamp")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "unboundedfollowing" not in plan.lower()
    got = {r["timestamp"]: r["pay"] for r in out.collect()}
    assert got == {1: 5.0, 3: 6.0}
