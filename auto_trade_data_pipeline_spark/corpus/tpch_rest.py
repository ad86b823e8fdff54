"""Relational corpus, part 4 — the last nine classic TPC-H shapes
(Q2, Q7, Q8, Q9, Q11, Q15, Q16, Q18, Q20), completing all 22 query
shapes over the driver's simplified star schema.

The driver testdata has no ``partsupp`` table, so the five shapes
that need one (Q2/Q9/Q11/Q16/Q20) run over a DERIVED part-supplier
relation, built identically (and exactly, in integer units) on both
engines from lineitem:

    ps_partkey, ps_suppkey,
    ps_supplycost_cents = min(extendedprice_cents div quantity)
    ps_availqty         = sum(quantity)

i.e. the cheapest observed unit price and the lifetime shipped
quantity per (part, supplier). One uniform-key groupBy shuffle; the
result is dimension-x-dimension sized (|part| x avg suppliers per
part), broadcastable at any corpus scale.

Float-hash discipline (same as corpus/tpch.py): every comparison that
gates ROW MEMBERSHIP happens in exact integer units — prices and
balances in cents, quantities as bigints, "value > fraction * total"
cross-multiplied — so Spark and DuckDB agree row-for-row and the
only floating math is a final display division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.corpus import register, scoped_persist
from auto_trade_data_pipeline_spark.corpus.tpch import _cents
from auto_trade_data_pipeline_spark.sources import load_table

#: Exact integer revenue per line: cents x (100 - discount%), unit 1e-4 $.
_REV_E4 = "CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(100 - l_discount * 100) AS BIGINT)"

_PARTSUPP_CTE = """
partsupp AS (
  SELECT l_partkey AS ps_partkey,
         l_suppkey AS ps_suppkey,
         min(CAST(round(l_extendedprice * 100) AS BIGINT) // CAST(l_quantity AS BIGINT))
           AS ps_supplycost_cents,
         CAST(sum(l_quantity) AS BIGINT) AS ps_availqty
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
)
"""


def _rev_e4() -> F.Column:
    return _cents(F.col("l_extendedprice")) * _cents(
        F.lit(100) - F.col("l_discount") * 100, 1
    )


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    unit_cost = F.expr(
        "CAST(round(l_extendedprice * 100) AS BIGINT) div CAST(l_quantity AS BIGINT)"
    )
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.min(unit_cost).alias("ps_supplycost_cents"),
        F.sum("l_quantity").cast("long").alias("ps_availqty"),
    )


def _supplier_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)


# ---------------------------------------------------------------------------
# Q2: minimum-cost supplier per part within a region
# ---------------------------------------------------------------------------

_Q2_ORACLE = f"""
WITH {_PARTSUPP_CTE},
rs AS (
  SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost_cents,
         s.s_name, CAST(round(s.s_acctbal * 100) AS BIGINT) AS acctbal_cents,
         n.n_name
  FROM partsupp ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  JOIN region r   ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'ASIA'
),
mn AS (
  SELECT ps_partkey, min(ps_supplycost_cents) AS min_cost
  FROM rs GROUP BY ps_partkey
)
SELECT rs.ps_partkey AS p_partkey, p.p_name, rs.s_name, rs.n_name,
       rs.acctbal_cents / 100.0 AS s_acctbal,
       rs.ps_supplycost_cents / 100.0 AS supplycost
FROM rs
JOIN mn ON mn.ps_partkey = rs.ps_partkey AND rs.ps_supplycost_cents = mn.min_cost
JOIN part p ON p.p_partkey = rs.ps_partkey
WHERE p.p_size = 15
ORDER BY acctbal_cents DESC, rs.n_name, rs.s_name, rs.ps_partkey, rs.ps_suppkey
LIMIT 100
"""


@register("tpch_q2_min_cost_supplier", _Q2_ORACLE, tags=("J4", "A-sub"))
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each size-15 part, the ASIA-region
    supplier(s) achieving the minimum supply cost — a decorrelated
    per-group min re-joined on exact integer equality, over the
    derived partsupp. The region/nation/supplier dimension chain is
    broadcast; the LIMIT membership is deterministic (full integer
    tiebreak including both keys)."""
    ps = _partsupp(spark, sf_dir)
    sn = _supplier_nation(spark, sf_dir)
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sn = sn.join(F.broadcast(r), sn.n_regionkey == r.r_regionkey).select(
        "s_suppkey",
        "s_name",
        _cents(F.col("s_acctbal")).alias("acctbal_cents"),
        "n_name",
    )
    rs = ps.join(F.broadcast(sn), ps.ps_suppkey == sn.s_suppkey)
    mn = rs.groupBy("ps_partkey").agg(F.min("ps_supplycost_cents").alias("min_cost"))
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    out = (
        rs.join(mn, "ps_partkey")
        .filter(F.col("ps_supplycost_cents") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
    )
    return (
        out.orderBy(
            F.col("acctbal_cents").desc(), "n_name", "s_name", "ps_partkey", "ps_suppkey"
        )
        .limit(100)
        .select(
            F.col("ps_partkey").alias("p_partkey"),
            "p_name",
            "s_name",
            "n_name",
            (F.col("acctbal_cents") / 100.0).alias("s_acctbal"),
            (F.col("ps_supplycost_cents") / 100.0).alias("supplycost"),
        )
    )


# ---------------------------------------------------------------------------
# Q7: volume shipping between two nations
# ---------------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(sum({_REV_E4}) AS BIGINT) / 10000.0 AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
  AND l.l_shipdate >= DATE '1995-01-01' AND l.l_shipdate < DATE '1997-01-01'
GROUP BY 1, 2, 3
"""


@register("tpch_q7_nation_volume", _Q7_ORACLE, tags=("J4", "A4"))
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: revenue flow between a nation pair by ship year. Both
    nation filters fold into their broadcast dimension chains BEFORE
    touching the facts, the lineitem date filter pushes to the scan,
    and the OR-of-pairs predicate is applied after the two cheap
    dimension joins (never as a join condition residual)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    nations = ("NATION_3", "NATION_7")
    sn = _supplier_nation(spark, sf_dir).filter(F.col("n_name").isin(*nations)).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*nations))
    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cn, o.o_custkey == cn.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg((F.sum(_rev_e4()).cast("long") / 10000.0).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8: national market share within a region
# ---------------------------------------------------------------------------

_Q8_ORACLE = f"""
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum(CASE WHEN n1.n_name = 'NATION_7' THEN {_REV_E4} ELSE 0 END) AS BIGINT)
             / CAST(sum({_REV_E4}) AS BIGINT), 4) AS mkt_share
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n2.n_regionkey AND r.r_name = 'ASIA'
WHERE o.o_orderdate >= DATE '1995-01-01' AND o.o_orderdate < DATE '1997-01-01'
GROUP BY 1
"""


@register("tpch_q8_market_share", _Q8_ORACLE, tags=("J4", "F-math"))
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of ECONOMY-part revenue sold into
    ASIA, by order year. Numerator and denominator are exact integer
    sums accumulated in ONE aggregation pass (conditional sum, not two
    scans); the division happens once per year row."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    sn = _supplier_nation(spark, sf_dir).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    n2 = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = (
        c.join(F.broadcast(n2), c.c_nationkey == n2.n_nationkey)
        .join(F.broadcast(r), n2.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    rev = _rev_e4()
    nat = F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(F.lit(0).cast("long"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cn, o.o_custkey == cn.c_custkey, "left_semi")
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(nat).cast("long") / F.sum(rev).cast("long"), 4
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9: product-type profit by nation and year
# ---------------------------------------------------------------------------

_Q9_ORACLE = f"""
WITH {_PARTSUPP_CTE}
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum({_REV_E4}
                - ps.ps_supplycost_cents * CAST(l.l_quantity AS BIGINT) * 100) AS BIGINT)
         / 10000.0 AS sum_profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
JOIN partsupp ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
"""


@register("tpch_q9_product_profit", _Q9_ORACLE, tags=("J4", "A4", "bench"))
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit (revenue minus supply cost) on 'red' parts by
    supplier nation and order year. The derived partsupp joins on its
    natural (part, supplier) key; profit stays in exact 1e-4-dollar
    integers until the final display division. partsupp and the
    filtered part dim are broadcast — the fact table never
    reshuffles for them.

    ONE lineitem scan (round-10; the r9 plan scanned it twice): the
    red-part membership is applied once as a broadcast semi join and
    the surviving ~10% of lineitem persists at its fan-out into (a)
    the fact side and (b) the derived-partsupp aggregation. Provably
    identity-preserving: ``p_partkey`` is unique, so the r9 inner
    join against the red part dim kept exactly the semi join's rows
    and added no columns; and partsupp's group key (l_partkey,
    l_suppkey) determines the part, so building it from the
    red-filtered rows yields exactly the partsupp groups the fact
    join retains, from exactly their full row sets (hash-exact vs the
    unchanged oracle, which still derives partsupp from ALL of
    lineitem)."""
    li = load_table(spark, sf_dir, "lineitem")
    pk = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    li_red = scoped_persist(
        li.join(F.broadcast(pk), li.l_partkey == pk.p_partkey, "left_semi").select(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        )
    )
    unit_cost = F.expr(
        "CAST(round(l_extendedprice * 100) AS BIGINT) div CAST(l_quantity AS BIGINT)"
    )
    ps = li_red.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.min(unit_cost).alias("ps_supplycost_cents"))
    sn = _supplier_nation(spark, sf_dir).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _rev_e4() - F.col("ps_supplycost_cents") * F.col("l_quantity").cast(
        "long"
    ) * F.lit(100).cast("long")
    return (
        li_red.join(
            F.broadcast(ps),
            (li_red.l_partkey == ps.ps_partkey) & (li_red.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(sn), li_red.l_suppkey == sn.s_suppkey)
        .join(o, li_red.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg((F.sum(profit).cast("long") / 10000.0).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11: important stock identification (global-fraction membership)
# ---------------------------------------------------------------------------

_Q11_ORACLE = f"""
WITH {_PARTSUPP_CTE},
nps AS (
  SELECT ps.ps_partkey, ps.ps_supplycost_cents * ps.ps_availqty AS value_cents
  FROM partsupp ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_3'
),
pv AS (
  SELECT ps_partkey, CAST(sum(value_cents) AS BIGINT) AS value_cents
  FROM nps GROUP BY ps_partkey
),
tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents FROM pv)
SELECT pv.ps_partkey, pv.value_cents / 100.0 AS stock_value
FROM pv, tot
WHERE pv.value_cents * 500 > tot.total_cents
"""


@register("tpch_q11_important_stock", _Q11_ORACLE, tags=("A-sub", "J4"))
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose stock value at NATION_3 suppliers
    exceeds 0.2% of that nation's total. The global total is a one-row
    broadcast; the fraction test is cross-multiplied
    (value * 500 > total) so membership is exact integer math on both
    engines."""
    ps = _partsupp(spark, sf_dir)
    sn = _supplier_nation(spark, sf_dir).filter(F.col("n_name") == "NATION_3").select(
        "s_suppkey"
    )
    pv = (
        ps.join(F.broadcast(sn), ps.ps_suppkey == sn.s_suppkey, "left_semi")
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_supplycost_cents") * F.col("ps_availqty"))
            .cast("long")
            .alias("value_cents")
        )
    )
    tot = pv.agg(F.sum("value_cents").cast("long").alias("total_cents"))
    return (
        pv.join(F.broadcast(tot))
        .filter(F.col("value_cents") * 500 > F.col("total_cents"))
        .select("ps_partkey", (F.col("value_cents") / 100.0).alias("stock_value"))
    )


# ---------------------------------------------------------------------------
# Q15: top supplier(s) by quarterly revenue (scalar max + equality)
# ---------------------------------------------------------------------------

_Q15_ORACLE = f"""
WITH srev AS (
  SELECT l_suppkey, CAST(sum({_REV_E4}) AS BIGINT) AS rev_e4
  FROM lineitem
  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
  GROUP BY l_suppkey
),
mx AS (SELECT max(rev_e4) AS max_rev FROM srev)
SELECT s.s_suppkey, s.s_name, srev.rev_e4 / 10000.0 AS total_revenue
FROM srev, mx
JOIN supplier s ON s.s_suppkey = srev.l_suppkey
WHERE srev.rev_e4 = mx.max_rev
"""


@register("tpch_q15_top_supplier", _Q15_ORACLE, tags=("A-sub", "O2"))
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum revenue in 1997 Q1 —
    the view-plus-scalar-subquery shape, decorrelated into a one-row
    broadcast max compared by exact integer equality (ties kept, as
    the spec requires)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    srev = li.groupBy("l_suppkey").agg(F.sum(_rev_e4()).cast("long").alias("rev_e4"))
    mx = srev.agg(F.max("rev_e4").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        srev.join(F.broadcast(mx))
        .filter(F.col("rev_e4") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", (F.col("rev_e4") / 10000.0).alias("total_revenue"))
    )


# ---------------------------------------------------------------------------
# Q16: supplier count by part attributes, excluding flagged suppliers
# ---------------------------------------------------------------------------

_Q16_ORACLE = f"""
WITH {_PARTSUPP_CTE}
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       count(DISTINCT ps.ps_suppkey) AS supplier_cnt
FROM partsupp ps
JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#11'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 7, 10, 14, 15, 19, 23)
  AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


@register("tpch_q16_supplier_count", _Q16_ORACLE, tags=("J6", "A9"))
def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part attribute
    triple, excluding negative-balance suppliers (the testdata's
    stand-in for the spec's complaint-comment filter — it has no
    comment columns). The exclusion is a broadcast anti join; the
    distinct count shuffles (attrs, suppkey) once before counting."""
    ps = _partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 14, 15, 19, 23))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q18: large-volume customers (IN over a grouped HAVING)
# ---------------------------------------------------------------------------

_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING CAST(sum(l_quantity) AS BIGINT) > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
       o.o_totalprice, big.total_qty
FROM big
JOIN orders o   ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@register("tpch_q18_large_volume_customers", _Q18_ORACLE, tags=("A-sub", "J1"))
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers behind orders totalling > 300 units — the
    IN-over-grouped-HAVING shape. The heavy per-order quantity
    aggregate runs FIRST and survives as a tiny broadcastable set of
    qualifying orders; quantities are exact integers so the HAVING
    boundary cannot drift between engines."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        F.broadcast(big)
        .join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            "total_qty",
        )
    )


# ---------------------------------------------------------------------------
# Q20: suppliers with 1997-concentrated part demand
# ---------------------------------------------------------------------------

_Q20_ORACLE = f"""
WITH {_PARTSUPP_CTE},
q97 AS (
  SELECT l_partkey, l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS qty97
  FROM lineitem
  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
  GROUP BY l_partkey, l_suppkey
),
hot AS (
  SELECT ps.ps_suppkey
  FROM partsupp ps
  JOIN q97 ON q97.l_partkey = ps.ps_partkey AND q97.l_suppkey = ps.ps_suppkey
  JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE '%bolt%'
  WHERE q97.qty97 * 2 > ps.ps_availqty
)
SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_1'
  AND s.s_suppkey IN (SELECT ps_suppkey FROM hot)
"""


@register("tpch_q20_concentrated_demand", _Q20_ORACLE, tags=("J1", "A-sub"))
def tpch_q20_concentrated_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_1 suppliers of 'bolt' parts whose 1997
    shipments exceed half their lifetime volume (the spec compares
    availqty against half a year's movement; with availqty DERIVED
    from lifetime shipments the meaningful direction is
    concentration — documented adaptation). Correlated per-(part,
    supplier) aggregate decorrelated onto the partsupp key, integer
    cross-multiplied threshold, then a semi-join chain up to the
    supplier dimension."""
    ps = _partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    q97 = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").cast("long").alias("qty97")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%")).select(
        "p_partkey"
    )
    hot = (
        ps.join(
            q97,
            (ps.ps_partkey == q97.l_partkey) & (ps.ps_suppkey == q97.l_suppkey),
        )
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey, "left_semi")
        .filter(F.col("qty97") * 2 > F.col("ps_availqty"))
        .select("ps_suppkey")
    )
    sn = _supplier_nation(spark, sf_dir).filter(F.col("n_name") == "NATION_1")
    return (
        sn.join(F.broadcast(hot), sn.s_suppkey == hot.ps_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )
