"""Relational corpus, part 3 — the remaining classic TPC-H query
shapes, adapted to this testdata's simplified schema (no ``partsupp``,
no ``l_commitdate``/``l_receiptdate``; SURVEY §1.2):

- Q13 custdist: outer join with an ON-side predicate, then a
  distribution-of-counts double aggregation.
- Q17 small-quantity revenue: correlated per-group scalar average,
  decorrelated into an aggregate + re-join.
- Q19 disjunctive predicate blocks: OR-of-ANDs membership that the
  optimizer must not turn into a cartesian residual.
- Q21 waiting-supplier shape: the double EXISTS / NOT EXISTS
  correlation, decorrelated into one per-order aggregate.
- Q22 idle-customer shape: global scalar subquery + anti join.

Float-hash discipline (same as corpus/tpch.py): any comparison that
gates ROW MEMBERSHIP is carried out in exact integer units on both
engines — quantities are decis (x10), balances are cents (x100), and
"value > avg(values)" is cross-multiplied (``v * n > sum``) so no
division ever decides membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.corpus import register
from auto_trade_data_pipeline_spark.corpus.tpch import _REVENUE_CENTS, _cents
from auto_trade_data_pipeline_spark.sources import load_table

# ---------------------------------------------------------------------------
# TPC-H Q13: customer order-count distribution
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("tpch_q13_custdist", _Q13_ORACLE, tags=("J4", "A4"))
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed 0, 1, 2, ... non-urgent
    orders. The ON-side predicate is applied to `orders` BEFORE the
    outer join (equivalent for a left join, and it prunes the fact
    scan); orders are pre-aggregated to per-customer counts so the
    join carries one row per customer, not one per order — at 100 TB
    that's the difference between shuffling |orders| and |customer|
    rows. The second aggregation (distribution of counts) has
    cardinality ≤ max order count, so it collapses map-side."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    per_cust = (
        c.join(per_cust_orders, c.c_custkey == per_cust_orders.o_custkey, "left")
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# TPC-H Q17: small-quantity-order revenue (correlated per-part average)
# ---------------------------------------------------------------------------

# Membership test l_quantity < 0.2 * avg(l_quantity) cross-multiplied
# into integers: 5 * qty_deci * n  <  sum_deci * 1  (qty is stored in
# integral units; x10 keeps it exact in BIGINT with headroom).
_Q17_ORACLE = """
WITH brand_li AS (
  SELECT l.l_partkey,
         CAST(round(l.l_quantity * 10) AS BIGINT) AS qty_d,
         l.l_extendedprice
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#17'
),
per_part AS (
  SELECT l_partkey,
         sum(qty_d) AS sum_d,
         count(*) AS n
  FROM brand_li
  GROUP BY l_partkey
)
SELECT CAST(sum(CAST(round(b.l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 / 7.0
         AS avg_yearly
FROM brand_li b
JOIN per_part a ON b.l_partkey = a.l_partkey
WHERE 5 * b.qty_d * a.n < a.sum_d
"""


@register("tpch_q17_small_quantity_revenue", _Q17_ORACLE, tags=("J4", "A4"))
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost if small-quantity orders (below 20% of
    the part's average order quantity) went unfilled. The correlated
    scalar subquery decorrelates into a per-part aggregate joined back
    to the same filtered fact. 100 TB plan: the brand filter reaches
    the part scan and part is broadcast, so lineitem is touched once;
    the per-part aggregate and the re-join share the l_partkey
    shuffle key (one exchange, reused), and the aggregate side is
    tiny (one row per qualifying part) so AQE turns the re-join into
    a broadcast. Membership is exact-integer cross-multiplied — a
    1e-12 divergence in a float average can never flip a row."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#17")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        _cents(F.col("l_quantity"), 10).alias("qty_d"),
        "l_extendedprice",
    )
    brand_li = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).drop("p_partkey")
    per_part = brand_li.groupBy("l_partkey").agg(
        F.sum("qty_d").alias("sum_d"), F.count("*").alias("n")
    )
    joined = brand_li.join(per_part, "l_partkey").filter(
        F.lit(5) * F.col("qty_d") * F.col("n") < F.col("sum_d")
    )
    return joined.agg(
        (F.sum(_cents(F.col("l_extendedprice"))) / 100.0 / 7.0).alias("avg_yearly")
    )


# ---------------------------------------------------------------------------
# TPC-H Q19: disjunctive predicate blocks
# ---------------------------------------------------------------------------

_Q19_ORACLE = f"""
SELECT CAST(sum({_REVENUE_CENTS}) AS BIGINT) / 10000.0 AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
"""


@register("tpch_q19_disjunctive_revenue", _Q19_ORACLE, tags=("J4", "P6", "F-math"))
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue from three OR-ed (brand, size, quantity)
    blocks. The single-table conjuncts are factored out and pushed to
    each side BEFORE the join — part keeps only rows matching any
    brand+size block (a dimension-sized broadcast), lineitem keeps
    only the quantity envelope [1, 30] (reaches the parquet scan as a
    PushedFilter) — and the full disjunction is re-applied as the
    join residual. Quantity comparisons are against stored values
    (no arithmetic), so membership is engine-exact."""
    p = load_table(spark, sf_dir, "part").filter(
        ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 25))
        | ((F.col("p_brand") == "Brand#21") & F.col("p_size").between(1, 35))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity").between(1, 30))
    block = (
        ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#21") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    rev = _cents(F.col("l_extendedprice")) * _cents(F.lit(100) - F.col("l_discount") * 100, 1)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(block)
        .agg((F.sum(rev) / 10000.0).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: suppliers who alone held up a multi-supplier order
# ---------------------------------------------------------------------------

# "Late" (no l_receiptdate in this schema): shipped > 60 days after
# the order date. The classic double correlation —
#   EXISTS   (another supplier in the same order)
#   NOT EXISTS (another supplier ALSO late in the same order)
# — is decorrelated into one per-order aggregate: the order qualifies
# for supplier s iff it has >= 2 distinct suppliers and its late-
# supplier set is exactly {s}.
_Q21_ORACLE = """
WITH flagged AS (
  SELECT l.l_orderkey,
         l.l_suppkey,
         max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey, l.l_suppkey
),
per_order AS (
  SELECT l_orderkey,
         count(*) AS n_supp,
         sum(is_late) AS n_late,
         max(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_supp
  FROM flagged
  GROUP BY l_orderkey
)
SELECT s.s_name, count(*) AS numwait
FROM per_order q
JOIN supplier s ON s.s_suppkey = q.late_supp
WHERE q.n_supp >= 2 AND q.n_late = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 10
"""


@register("tpch_q21_waiting_supplier", _Q21_ORACLE, tags=("J1", "J6", "A4", "O2", "bench"))
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    finished multi-supplier order. The EXISTS / NOT EXISTS pair
    decorrelates into two cascaded aggregates on the same l_orderkey
    shuffle key — (order, supplier) late flags, then per-order
    supplier/late counts — so lineitem is scanned once and never
    self-joined (the naive correlated plan re-reads the fact table
    twice per correlation; at 100 TB that's 3 extra fact shuffles).
    `n_late = 1` makes `max(late_supp)` the unique late supplier, so
    no tie-break ambiguity enters the hash."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    flagged = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("is_late").alias("n_late"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(s), per_order.late_supp == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: well-funded customers who never ordered
# ---------------------------------------------------------------------------

# Membership "c_acctbal > avg(positive acctbals)" cross-multiplied:
# bal_c * n > sum_c, all BIGINT cents. "Idle" = no order since the
# cutoff (the spec's "in the last 7 years" — an unconditional
# no-orders-ever test matches zero customers at these SFs).
_Q22_CUTOFF = "2000-01-01"

_Q22_ORACLE = f"""
WITH pos AS (
  SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS sum_c,
         count(*) AS n
  FROM customer
  WHERE c_acctbal > 0.0
),
idle AS (
  SELECT c.c_nationkey,
         CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer c
  CROSS JOIN pos
  WHERE bal_c * pos.n > pos.sum_c
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}')
)
SELECT c_nationkey, count(*) AS numcust,
       CAST(sum(bal_c) AS BIGINT) / 100.0 AS totacctbal
FROM idle
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@register("tpch_q22_idle_customers", _Q22_ORACLE, tags=("J6", "A4", "F-null"))
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per-nation count and balance of above-average-
    balance customers with no recent orders. The global scalar
    subquery (average positive balance) is a one-row aggregate
    broadcast as a literal-free cross join — no driver round-trip, no
    collect; the NOT EXISTS is a left-anti join against the
    o_custkey projection of orders. 100 TB: the anti join shuffles
    only (custkey) pairs, the scalar side is one row, and membership
    is integer cross-multiplied on both engines."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", _cents(F.col("c_acctbal")).alias("bal_c")
    )
    pos = c.filter(F.col("bal_c") > 0).agg(
        F.sum("bal_c").alias("sum_c"), F.count("*").alias("n")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_Q22_CUTOFF))
        .select("o_custkey")
    )
    idle = (
        c.join(F.broadcast(pos))
        .filter(F.col("bal_c") * F.col("n") > F.col("sum_c"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
    )
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum("bal_c") / 100.0).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
