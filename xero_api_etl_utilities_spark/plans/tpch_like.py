"""TPC-H-shaped analytical queries over the full star schema —
exercising the remaining dimension tables (part, supplier) with the
classic scan→join→agg→top-k shapes a reference user would expect from
a general query engine. Same money/ratio oracle conventions as the
rest of the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xero_api_etl_utilities_spark.plans.catalog import register
from xero_api_etl_utilities_spark.plans.flagship import DEC, _money, _out
from xero_api_etl_utilities_spark.sources.parquet import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: pricing summary by returnflag/linestatus with
    shipped-before cutoff. Single scan, one groupBy, all decimal."""
    li = load_table(spark, sf_dir, "lineitem")
    price = _money(F.col("l_extendedprice"))
    disc = _money(F.col("l_discount"))
    tax = _money(F.col("l_tax"))
    one = F.lit(1).cast(DEC)
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
            _out(F.sum(price)).alias("sum_base_price"),
            _out(F.sum(price * (one - disc))).alias("sum_disc_price"),
            _out(F.sum(price * (one - disc) * (one + tax))).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


register(
    "q1_pricing_summary",
    q1_pricing_summary,
    """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * (1 - CAST(l_discount AS DECIMAL(12,2)))
              * (1 + CAST(l_tax AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_charge,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 open orders by revenue for one segment —
    selective dim filter broadcast against two facts, then top-k."""
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > F.lit("1997-01-01")
    )
    revenue = _money(F.col("l_extendedprice")) * (
        F.lit(1).cast(DEC) - _money(F.col("l_discount"))
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .agg(_out(F.sum(revenue)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


register(
    "q3_shipping_priority",
    q3_shipping_priority,
    """
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_orderpriority,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
  AND CAST(l_shipdate AS DATE) > DATE '1997-01-01'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
""",
)


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where supplier and customer
    share the nation — the 6-table star join (lineitem ⋈ orders ⋈
    customer ⋈ supplier ⋈ nation ⋈ region), dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    revenue = _money(F.col("l_extendedprice")) * (
        F.lit(1).cast(DEC) - _money(F.col("l_discount"))
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(na), F.col("s_nationkey") == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            _out(F.sum(revenue)).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


register(
    "q5_local_supplier_volume",
    q5_local_supplier_volume,
    """
SELECT n_name AS nation,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
GROUP BY n_name
""",
)


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filtered-scan aggregate — every predicate
    pushes to parquet, zero joins, one partial+final sum."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate").cast("date") < F.lit("1996-01-01"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _out(F.sum(_money(F.col("l_extendedprice")) * _money(F.col("l_discount")))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


register(
    "q6_forecast_revenue",
    q6_forecast_revenue,
    """
SELECT
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1996-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.04
  AND l_quantity < 24
""",
)


def parts_brand_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-dimension rollup: per-brand volume, revenue and
    retail-vs-sale delta (exercises the part table; broadcast dim)."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    revenue = _money(F.col("l_extendedprice"))
    retail = _money(F.col("p_retailprice")) * _money(F.col("l_quantity"))
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum("l_quantity").cast("bigint").alias("total_qty"),
            _out(F.sum(revenue)).alias("total_revenue"),
            _out(F.sum(retail - revenue)).alias("retail_delta"),
            F.count_distinct("p_partkey").alias("n_parts"),
        )
    )


register(
    "parts_brand_margin",
    parts_brand_margin,
    """
SELECT p_brand,
  CAST(SUM(l_quantity) AS BIGINT) AS total_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_revenue,
  CAST(ROUND(SUM(CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))
              - CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS retail_delta,
  CAST(COUNT(DISTINCT p_partkey) AS BIGINT) AS n_parts
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
)


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    one quarter — selective fact filters, broadcast customer dim,
    top-k with deterministic (revenue DESC, custkey) tie-break."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1995-10-01"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = _money(F.col("l_extendedprice")) * (
        F.lit(1).cast(DEC) - _money(F.col("l_discount"))
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            _out(F.sum(revenue)).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


register(
    "q10_returned_items",
    q10_returned_items,
    """
SELECT c_custkey, c_name, c_mktsegment,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
  AND CAST(o_orderdate AS DATE) >= DATE '1995-10-01'
  AND CAST(o_orderdate AS DATE) < DATE '1996-01-01'
GROUP BY c_custkey, c_name, c_mktsegment
ORDER BY revenue DESC, c_custkey ASC LIMIT 20
""",
)


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-type revenue share for one ship month.
    The ratio is published in integer BASIS POINTS via the catalog's
    exact-cents convention ((2·num·10⁴ + den) div (2·den) on cent
    values — half-up, no float division in the hashed output)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1995-09-01"))
        & (F.col("l_shipdate").cast("date") < F.lit("1995-10-01"))
    )
    pa = load_table(spark, sf_dir, "part")
    revenue = _money(F.col("l_extendedprice")) * (
        F.lit(1).cast(DEC) - _money(F.col("l_discount"))
    )
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0).cast(DEC))
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .agg(F.sum(promo).alias("_promo"), F.sum(revenue).alias("_total"))
        .select(
            _out(F.col("_promo")).alias("promo_revenue"),
            _out(F.col("_total")).alias("total_revenue"),
            F.expr(
                "(2 * cast(_promo * 100 as bigint) * 10000 + cast(_total * 100 as bigint))"
                " div (2 * cast(_total * 100 as bigint))"
            ).alias("promo_bp"),
        )
    )


register(
    "q14_promo_revenue",
    q14_promo_revenue,
    """
WITH s AS (
  SELECT
    SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
             ELSE 0 END) AS promo,
    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE CAST(l_shipdate AS DATE) >= DATE '1995-09-01'
    AND CAST(l_shipdate AS DATE) < DATE '1995-10-01'
)
SELECT
  CAST(ROUND(promo, 2) AS DOUBLE) AS promo_revenue,
  CAST(ROUND(total, 2) AS DOUBLE) AS total_revenue,
  (2 * CAST(promo * 100 AS BIGINT) * 10000 + CAST(total * 100 AS BIGINT))
    // (2 * CAST(total * 100 AS BIGINT)) AS promo_bp
FROM s
""",
)


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity clears a threshold
    — pre-aggregate lineitem per order (map-side combinable, the same
    two-stage discipline as the flagship), then join orders + customer
    and take the top 100 by total price."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
        .filter(F.col("total_qty") >= 250)
    )
    return (
        big.join(od, big.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            _out(_money(F.col("o_totalprice"))).alias("total_price"),
            "total_qty",
        )
        .orderBy(F.desc("total_price"), F.asc("orderkey"))
        .limit(100)
    )


register(
    "q18_large_orders",
    q18_large_orders,
    """
WITH big AS (
  SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) >= 250
)
SELECT c_custkey, c_name, o_orderkey AS orderkey,
  CAST(o_orderdate AS DATE) AS order_date,
  CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,2)), 2) AS DOUBLE) AS total_price,
  total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_price DESC, orderkey ASC LIMIT 100
""",
)


def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive bracket predicates spanning both
    sides of a join (brand/size on part, quantity on lineitem) — the
    classic optimizer test for OR-of-ANDs pushdown; broadcast dim keeps
    it one fact scan."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    revenue = _money(F.col("l_extendedprice")) * (
        F.lit(1).cast(DEC) - _money(F.col("l_discount"))
    )
    brackets = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .filter(brackets)
        .agg(
            _out(F.sum(revenue)).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )


register(
    "q19_bracketed_revenue",
    q19_bracketed_revenue,
    """
SELECT
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
""",
)


def q4_priority_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order counts by priority for orders having AT
    LEAST ONE qualifying lineitem — the canonical EXISTS, expressed as
    a LEFT SEMI join (each order emitted at most once, no post-join
    dedup; the fact side never multiplies)."""
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-07-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        od.join(li, od.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


register(
    "q4_priority_returns",
    q4_priority_returns,
    """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
