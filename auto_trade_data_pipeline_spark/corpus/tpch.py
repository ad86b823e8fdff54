"""Relational corpus over the driver's TPC-H-ish star schema —
J4 equi joins, J5 as-of/range joins, J6 semi/anti, set ops,
cube/rollup, ranking, top-k (SURVEY §2.3/§2.4/§2.6/§2.7).

The reference pipeline is single-table, but "same query capabilities"
includes the relational surface any Spark user gets for free; these
queries pin that surface against DuckDB oracles and document the
plan shapes we expect at 100 TB (broadcast dims, shuffle-hash facts,
map-side partial aggregation).

Float-hash determinism: every money aggregate is summed as integer
"cent-scale" BIGINTs (`round(x * scale)` cast to long) and divided
back at the end — sums of longs are order-independent, so parallel
execution can never drift a hash, unlike double summation
(SURVEY §7 hard-part 6). Money columns in the testdata are exact
2-decimal values, so the scaling is lossless.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from auto_trade_data_pipeline_spark.corpus import register
from auto_trade_data_pipeline_spark.operators.joins import asof_join, asof_join_forward, range_join
from auto_trade_data_pipeline_spark.sources import load_table, ticks_from_events
from auto_trade_data_pipeline_spark.corpus.trade import TICKS_CTE


def _cents(col: Column, scale: int = 100) -> Column:
    """Exact integer representation of a fixed-decimal double."""
    return F.round(col * scale, 0).cast("long")


# ---------------------------------------------------------------------------
# TPC-H Q1: pricing summary (pure aggregation, the scan+agg benchmark)
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT l_returnflag,
       l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(100 - l_discount * 100) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("tpch_q1_pricing_summary", _Q1_ORACLE, tags=("J4", "A4", "F-math", "bench"))
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan -> pushed-down date filter -> hash agg on a
    2-value key. At 100 TB this is the map-side-combine showcase: the
    shuffle carries |flags|x|statuses| partial rows per task, nothing
    else. Money sums are exact integer cents (no float drift)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    disc_price = _cents(F.col("l_extendedprice")) * _cents(F.lit(100) - F.col("l_discount") * 100, 1)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents(F.col("l_quantity"), 1)).alias("sum_qty"),
            (F.sum(_cents(F.col("l_extendedprice"))) / 100.0).alias("sum_base_price"),
            (F.sum(disc_price) / 10000.0).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# J4: equi joins (inner / left outer / broadcast-dim chain)
# ---------------------------------------------------------------------------

_REVENUE_CENTS = "CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(100 - l_discount * 100) AS BIGINT)"

_ORDER_REVENUE_ORACLE = f"""
SELECT o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
       o.o_orderpriority,
       CAST(sum({_REVENUE_CENTS}) AS BIGINT) / 10000.0 AS revenue,
       count(*) AS line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
"""


@register("join_order_revenue", _ORDER_REVENUE_ORACLE, tags=("J4", "A4", "bench"))
def join_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi join orders |x| lineitem on the natural key, revenue
    per order. Lineitem aggregates BEFORE the join (guide §2.3
    "aggregate before you shuffle"): o_orderkey is unique in orders,
    so grouping the joined fact by (orderkey, date, priority) equals
    grouping lineitem by l_orderkey and attaching the order columns
    after — the aggregation shuffles narrow (key, cents-exact sums)
    rows instead of join output carrying the order payload, and the
    join then probes |orders| aggregated rows, not |lineitem| raw
    ones. Proven row-identical (integer-cent revenue, no FP
    reassociation); interleaved A/B at sf0.1: 1.20s -> 0.66s."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = _cents(F.col("l_extendedprice")) * _cents(F.lit(100) - F.col("l_discount") * 100, 1)
    la = li.groupBy("l_orderkey").agg(
        (F.sum(rev) / 10000.0).alias("revenue"),
        F.count(F.lit(1)).alias("line_count"),
    )
    return (
        la.join(o, la.l_orderkey == o.o_orderkey)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
            "revenue",
            "line_count",
        )
    )


_CUSTOMER_PROFILE_ORACLE = f"""
WITH fact AS (
  SELECT o.o_custkey,
         CAST(sum({_REVENUE_CENTS}) AS BIGINT) / 10000.0 AS revenue,
         count(*) AS line_count,
         count(DISTINCT o.o_orderkey) AS order_count
  FROM orders o
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_custkey
)
SELECT c.c_custkey,
       c.c_mktsegment,
       coalesce(f.revenue, 0.0) AS revenue,
       coalesce(f.line_count, 0) AS line_count,
       coalesce(f.order_count, 0) AS order_count
FROM customer c
LEFT JOIN fact f ON c.c_custkey = f.o_custkey
"""


@register("join_customer_order_profile", _CUSTOMER_PROFILE_ORACLE, tags=("J4", "A9"))
def join_customer_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way customer |x| orders |x| lineitem with LEFT-OUTER
    preservation of order-less customers (revenue/counts coalesced to
    zero), built the 100 TB way: the fact-fact join is aggregated down
    to one row per custkey BEFORE the customer join (aggregate
    pushdown below join), so the outer join moves |customers| rows,
    not |lineitem|."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = _cents(F.col("l_extendedprice")) * _cents(F.lit(100) - F.col("l_discount") * 100, 1)
    fact = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            (F.sum(rev) / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
            F.countDistinct("o_orderkey").alias("order_count"),
        )
    )
    return c.join(fact, c.c_custkey == fact.o_custkey, "left").select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        F.coalesce("line_count", F.lit(0)).alias("line_count"),
        F.coalesce("order_count", F.lit(0)).alias("order_count"),
    )


_BROADCAST_DIM_ORACLE = """
SELECT r.r_name AS region,
       n.n_name AS nation,
       count(*) AS customer_count,
       CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


@register("join_broadcast_nation_region", _BROADCAST_DIM_ORACLE, tags=("J4",))
def join_broadcast_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake dim chain customer -> nation -> region with explicit
    broadcast on both dims: zero shuffles before the final agg — at
    100 TB the fact table never moves for dimension joins."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("customer_count"),
            (F.sum(_cents(F.col("c_acctbal"))) / 100.0).alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# J6: semi / anti joins
# ---------------------------------------------------------------------------

_SEMI_ANTI_ORACLE = """
SELECT c.c_custkey, c.c_mktsegment, 'has_urgent' AS side
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
UNION ALL
SELECT c.c_custkey, c.c_mktsegment, 'no_urgent' AS side
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


@register("semi_anti_join_customers", _SEMI_ANTI_ORACLE, tags=("J1", "J6", "J2"))
def semi_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi (EXISTS) and left-anti (NOT EXISTS) joins against the
    urgent-order set, unioned with a side tag — the two results
    partition customer exactly. Semi/anti joins ship only the join key
    of the probe side: no payload duplication, no row explosion."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .withColumn("side", F.lit("has_urgent"))
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .withColumn("side", F.lit("no_urgent"))
    )
    return semi.unionByName(anti)


# ---------------------------------------------------------------------------
# O2: top-k;  W-: ranking
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT o_orderkey,
       o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@register("top_k_orders", _TOPK_ORACLE, tags=("O1", "O2"))
def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by totalprice (orderkey tiebreak). Spark plans
    orderBy+limit as TakeOrderedAndProject — per-partition top-k then a
    k-row merge at the driver, never a full sort of 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )


_RANK_ORACLE = """
SELECT p_brand, p_partkey, p_retailprice, rn
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
) t
WHERE rn <= 3
"""


@register("rank_parts_in_brand", _RANK_ORACLE, tags=("O2", "W-rank"))
def rank_parts_in_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-3 via row_number window: the scalable grouped-top-k
    idiom (25 brand partitions run in parallel; no global sort)."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        p.select("p_brand", "p_partkey", "p_retailprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# A-: rollup / cube (multi-dimensional aggregates)
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS return_flag,
       coalesce(l_linestatus, 'ALL') AS line_status,
       count(*) AS line_count,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


@register("rollup_lineitem_sales", _ROLLUP_ORACLE, tags=("A-cube",))
def rollup_lineitem_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) — hierarchy totals plus the
    grand total, null groups coalesced to 'ALL'. One shuffle; Spark
    expands grouping sets map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("line_count"),
            F.sum(_cents(F.col("l_quantity"), 1)).alias("total_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("return_flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("line_status"),
            "line_count",
            "total_qty",
        )
    )


_CUBE_ORACLE = """
SELECT coalesce(o_orderstatus, 'ALL') AS order_status,
       coalesce(o_orderpriority, 'ALL') AS order_priority,
       count(*) AS order_count,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_price
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


@register("cube_order_priorities", _CUBE_ORACLE, tags=("A-cube",))
def cube_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (status, priority): all 2^2 grouping sets in one
    pass."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            (F.sum(_cents(F.col("o_totalprice"))) / 100.0).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("order_status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("order_priority"),
            "order_count",
            "total_price",
        )
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7)
# ---------------------------------------------------------------------------

_SET_OPS_ORACLE = """
SELECT 'intersect' AS op, custkey FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  INTERSECT
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
)
UNION ALL
SELECT 'except' AS op, custkey FROM (
  SELECT c_custkey AS custkey FROM customer
  EXCEPT
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
)
"""


@register("set_ops_customers", _SET_OPS_ORACLE, tags=("Set",))
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both distinct set operations in one tagged result: INTERSECT
    (custkeys with an urgent AND a finished order) and EXCEPT
    (customers minus those with an open order). Each arm is a single
    shuffle on the key; the union is plan-level (no extra exchange)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    finished = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    open_orders = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    inter = urgent.intersect(finished).select(F.lit("intersect").alias("op"), "custkey")
    exc = c.subtract(open_orders).select(F.lit("except").alias("op"), "custkey")
    return inter.unionByName(exc)


# ---------------------------------------------------------------------------
# J5: range join (point-in-band) and as-of join
# ---------------------------------------------------------------------------

_PRICE_BANDS = [
    ("budget", 0.0, 925.0),
    ("mid", 925.0, 950.0),
    ("premium", 950.0, 975.0),
    ("luxury", 975.0, 1e9),
]

_RANGE_JOIN_ORACLE = """
WITH bands(band, lo, hi) AS (
  VALUES ('budget', 0.0, 925.0), ('mid', 925.0, 950.0),
         ('premium', 950.0, 975.0), ('luxury', 975.0, 1e9)
)
SELECT b.band, count(*) AS part_count,
       CAST(sum(CAST(round(p.p_retailprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_price
FROM part p
JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
GROUP BY b.band
"""


@register("range_join_price_bands", _RANGE_JOIN_ORACLE, tags=("J5",))
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join part -> price band via the broadcast range_join
    operator: BroadcastNestedLoopJoin against a 4-row band table —
    each task streams its partition, no shuffle before the agg."""
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(_PRICE_BANDS, "band string, lo double, hi double")
    joined = range_join(p, bands, F.col("p_retailprice"), F.col("lo"), F.col("hi"))
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("part_count"),
        (F.sum(_cents(F.col("p_retailprice"))) / 100.0).alias("total_price"),
    )


_ASOF_ORACLE = f"""
WITH {TICKS_CTE},
minute_bars AS (
  SELECT symbol,
         date_trunc('minute', timestamp) AS timestamp,
         CAST(sum(CAST(round(price * 10000) AS BIGINT)) AS BIGINT) / 10000.0 / count(*) AS bar_avg
  FROM ticks
  GROUP BY symbol, date_trunc('minute', timestamp)
)
SELECT t.symbol,
       strftime(t.timestamp, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       t.tick_id,
       t.price,
       round(m.bar_avg, 4) AS last_bar_avg
FROM ticks t
ASOF LEFT JOIN minute_bars m
  ON t.symbol = m.symbol AND t.timestamp >= m.timestamp
"""


@register("asof_join_latest_bar", _ASOF_ORACLE, tags=("J5",))
def asof_join_latest_bar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (J5): each tick picks up the average price
    of the latest minute bar at or before it — the anchored-VWAP join
    shape (``src/candle_to_calcs.py:236-247``). Uses the union +
    last-value window implementation: one shuffle on symbol, zero row
    explosion (operators/joins.py)."""
    ticks = ticks_from_events(spark, sf_dir)
    bars = (
        ticks.groupBy("symbol", F.date_trunc("minute", "timestamp").alias("timestamp"))
        .agg(
            (
                (F.sum(_cents(F.col("price"), 10000)) / 10000.0) / F.count(F.lit(1))
            ).alias("bar_avg")
        )
    )
    joined = asof_join(ticks, bars, on=["symbol"], ts="timestamp")
    return joined.select(
        "symbol",
        F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "tick_id",
        "price",
        F.round("bar_avg", 4).alias("last_bar_avg"),
    )


# ---------------------------------------------------------------------------
# Pivot / unpivot / exact percentiles (corpus completeness)
# ---------------------------------------------------------------------------

_PIVOT_UNPIVOT_ORACLE = """
WITH p AS (
  SELECT o_orderpriority,
         CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) / 100.0 AS open_total,
         CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) / 100.0 AS finished_total,
         CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) / 100.0 AS pending_total
  FROM orders
  GROUP BY o_orderpriority
)
SELECT o_orderpriority, 'open_total' AS metric, open_total AS value FROM p
UNION ALL
SELECT o_orderpriority, 'finished_total' AS metric, finished_total AS value FROM p
UNION ALL
SELECT o_orderpriority, 'pending_total' AS metric, pending_total AS value FROM p
"""


@register("pivot_unpivot_status_metrics", _PIVOT_UNPIVOT_ORACLE, tags=("A-pivot",))
def pivot_unpivot_status_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot then unpivot round-trip: order totals per priority pivoted
    to one column per status (Spark plans the pivot as one pass of
    conditional aggregates — same shuffle as the plain groupBy), then
    melted back to (priority, metric, value) rows via the native
    unpivot — a Generate node, no extra shuffle."""
    o = load_table(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum(_cents(F.col("o_totalprice"))))
        .select(
            "o_orderpriority",
            (F.coalesce("O", F.lit(0)) / 100.0).alias("open_total"),
            (F.coalesce("F", F.lit(0)) / 100.0).alias("finished_total"),
            (F.coalesce("P", F.lit(0)) / 100.0).alias("pending_total"),
        )
    )
    return p.unpivot(
        "o_orderpriority", ["open_total", "finished_total", "pending_total"], "metric", "value"
    )


_PERCENTILE_ORACLE = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders
GROUP BY o_orderpriority
"""


@register("percentiles_order_value", _PERCENTILE_ORACLE, tags=("A-quantile",))
def percentiles_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per priority (Spark
    ``percentile`` == DuckDB ``quantile_cont``, both linear
    interpolation). Production uses ``percentile_approx`` (sketch,
    map-side mergeable) — exact kept for the oracle gate."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.95)), 4).alias("p95"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
    )


_ASOF_FWD_ORACLE = f"""
WITH {TICKS_CTE},
minute_bars AS (
  SELECT symbol,
         date_trunc('minute', timestamp) AS timestamp,
         CAST(sum(CAST(round(price * 10000) AS BIGINT)) AS BIGINT) / 10000.0 / count(*) AS bar_avg
  FROM ticks
  GROUP BY symbol, date_trunc('minute', timestamp)
)
SELECT t.symbol,
       strftime(t.timestamp, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       t.tick_id,
       t.price,
       round(m.bar_avg, 4) AS next_bar_avg
FROM ticks t
ASOF LEFT JOIN minute_bars m
  ON t.symbol = m.symbol AND t.timestamp <= m.timestamp
"""


@register("asof_join_next_bar", _ASOF_FWD_ORACLE, tags=("J5",))
def asof_join_next_bar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (J5): each tick picks up the average price
    of the next minute bar at or after it — the lookahead join behind
    label-the-future feature engineering (predict the next bar) and
    next-quote trade attribution. Union + first-value forward window
    (operators/joins.py:asof_join_forward): one shuffle on symbol,
    zero row explosion; the oracle is DuckDB's native ASOF with the
    inequality reversed."""
    ticks = ticks_from_events(spark, sf_dir)
    bars = (
        ticks.groupBy("symbol", F.date_trunc("minute", "timestamp").alias("timestamp"))
        .agg(
            (
                (F.sum(_cents(F.col("price"), 10000)) / 10000.0) / F.count(F.lit(1))
            ).alias("bar_avg")
        )
    )
    joined = asof_join_forward(ticks, bars, on=["symbol"], ts="timestamp")
    return joined.select(
        "symbol",
        F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "tick_id",
        "price",
        F.round("bar_avg", 4).alias("next_bar_avg"),
    )
