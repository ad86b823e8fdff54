"""Bucketed co-located joins: pre-bucketing both fact tables on the
join key removes the shuffle entirely (SURVEY §4 / 100 TB posture:
bucketing is how repeated fact-fact joins amortize their exchange)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.sources import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_small):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    load_table(spark, sf_small, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("b_orders")
    load_table(spark, sf_small, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("b_lineitem")
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed, sf_small):
    o, li = bucketed
    joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # The join itself reads co-located buckets: no Exchange feeds it.
    join_part = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    # And the answer matches the plain (shuffling) join.
    plain = (
        load_table(spark, sf_small, "orders")
        .join(
            load_table(spark, sf_small, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
