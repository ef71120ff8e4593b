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


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations per
    ship-year. The nation dimension joins TWICE (supplier side and
    customer side) — both copies filtered to the two-nation universe
    BEFORE the join so the inner joins prune 23/25 of the fact rows,
    then the cross-pair filter removes same-nation flows."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = na.select(
        F.col("n_nationkey").alias("_s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = na.select(
        F.col("n_nationkey").alias("_c_nk"), F.col("n_name").alias("cust_nation")
    )
    revenue = _money(F.col("l_extendedprice")) * (
        F.lit(1).cast(DEC) - _money(F.col("l_discount"))
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("date")).alias("l_year"),
        )
        .agg(_out(F.sum(revenue)).alias("revenue"))
    )


register(
    "q7_volume_shipping",
    q7_volume_shipping,
    """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS l_year,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_1', 'NATION_2')
  AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name, year(CAST(l_shipdate AS DATE))
""",
)


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue into
    one region, per order-year. The share is published in integer
    basis points via the catalog's exact-cents half-up convention
    (same as q14) — no float division in the hashed output."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    pa = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    cna = na.join(F.broadcast(re), na.n_regionkey == re.r_regionkey).select(
        F.col("n_nationkey").alias("_c_nk")
    )
    revenue = _money(F.col("l_extendedprice")) * (
        F.lit(1).cast(DEC) - _money(F.col("l_discount"))
    )
    sna = na.select(
        F.col("n_nationkey").alias("_s_nk"), F.col("n_name").alias("_s_nation")
    )
    nation_rev = F.when(F.col("_s_nation") == "NATION_5", revenue).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(cna), F.col("c_nationkey") == F.col("_c_nk"))
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(sna), F.col("s_nationkey") == F.col("_s_nk"))
        .groupBy(F.year(F.col("o_orderdate").cast("date")).alias("o_year"))
        .agg(F.sum(nation_rev).alias("_nat"), F.sum(revenue).alias("_tot"))
        .select(
            "o_year",
            _out(F.col("_nat")).alias("nation_revenue"),
            _out(F.col("_tot")).alias("total_revenue"),
            F.expr(
                "(2 * cast(_nat * 100 as bigint) * 10000 + cast(_tot * 100 as bigint))"
                " div (2 * cast(_tot * 100 as bigint))"
            ).alias("share_bp"),
        )
    )


register(
    "q8_market_share",
    q8_market_share,
    """
WITH s AS (
  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
    SUM(CASE WHEN sn.n_name = 'NATION_5'
             THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
             ELSE 0 END) AS nat,
    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS tot
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
  GROUP BY year(CAST(o_orderdate AS DATE))
)
SELECT o_year,
  CAST(ROUND(nat, 2) AS DOUBLE) AS nation_revenue,
  CAST(ROUND(tot, 2) AS DOUBLE) AS total_revenue,
  (2 * CAST(nat * 100 AS BIGINT) * 10000 + CAST(tot * 100 AS BIGINT))
    // (2 * CAST(tot * 100 AS BIGINT)) AS share_bp
FROM s
""",
)


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order-year over a
    part-name substring universe. The testdata part table has no
    partsupp/ps_supplycost, so cost is proxied as 80% of
    p_retailprice — held in DECIMAL end-to-end (0.8 is a
    DECIMAL(2,1) literal, never a float) so profit is exact cents in
    both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    pa = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    cost = _money(F.col("p_retailprice")) * F.expr("CAST(0.8 AS DECIMAL(2,1))")
    profit = _money(F.col("l_extendedprice")) * (
        F.lit(1).cast(DEC) - _money(F.col("l_discount"))
    ) - _money(F.col("l_quantity")) * cost
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), F.col("s_nationkey") == na.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
        )
        .agg(_out(F.sum(profit)).alias("sum_profit"))
    )


register(
    "q9_product_profit",
    q9_product_profit,
    """
SELECT n_name AS nation,
  CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
  CAST(ROUND(SUM(
    CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
    - CAST(l_quantity AS DECIMAL(12,2))
      * (CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.8 AS DECIMAL(2,1)))
  ), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(CAST(o_orderdate AS DATE))
""",
)


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer INCLUDING
    zero-order customers — the left-outer-join + two-level aggregation
    shape (count per customer, then histogram of counts). The filter
    excludes urgent orders so some customers really do land at 0."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


register(
    "q13_order_count_distribution",
    q13_order_count_distribution,
    """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals
    the global max. The max is a 1-row aggregate broadcast back
    against the per-supplier revenue frame (no global window sort —
    the decorrelated form that survives a wide supplier dimension).
    Equality compares EXACT decimal sums; rounding happens only in
    the published column."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-04-01"))
    )
    su = load_table(spark, sf_dir, "supplier")
    revenue = _money(F.col("l_extendedprice")) * (
        F.lit(1).cast(DEC) - _money(F.col("l_discount"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(revenue).alias("_total"))
    mx = rev.agg(F.max("_total").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), rev._total == mx._mx)
        .join(F.broadcast(su), rev.l_suppkey == su.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            _out(F.col("_total")).alias("total_revenue"),
        )
    )


register(
    "q15_top_supplier",
    q15_top_supplier,
    """
WITH r AS (
  SELECT l_suppkey,
    SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(ROUND(total, 2) AS DOUBLE) AS total_revenue
FROM r JOIN supplier ON s_suppkey = l_suppkey
WHERE total = (SELECT MAX(total) FROM r)
""",
)


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from line items whose quantity sits
    below 20% of the part's average — the correlated-average
    decorrelated into a per-part aggregate joined back. The 20%-of-
    average comparison is INTEGER-EXACT: qty < 0.2·(sum/cnt) ⟺
    5·qty·cnt < sum on bigint cents of quantity (quantities are
    integral in the testdata), so no float threshold can disagree
    between engines. Part stats aggregate only the brand-filtered
    universe (semi-join prune before the stats pass)."""
    su_brand = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    li = load_table(spark, sf_dir, "lineitem")
    branded = li.join(
        F.broadcast(su_brand.select("p_partkey")), li.l_partkey == F.col("p_partkey")
    )
    stats = branded.groupBy(F.col("l_partkey").alias("_sp")).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("_sq"),
    )
    return (
        branded.join(F.broadcast(stats), branded.l_partkey == F.col("_sp"))
        .filter(
            F.lit(5) * F.col("l_quantity").cast("bigint") * F.col("_cnt")
            < F.col("_sq")
        )
        .agg(
            _out(F.sum(_money(F.col("l_extendedprice")))).alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


register(
    "q17_small_qty_revenue",
    q17_small_qty_revenue,
    """
WITH b AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'),
s AS (
  SELECT l_partkey, COUNT(*) AS cnt, CAST(SUM(l_quantity) AS BIGINT) AS sq
  FROM lineitem JOIN b ON l_partkey = p_partkey
  GROUP BY l_partkey
)
SELECT
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS small_qty_revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN s ON lineitem.l_partkey = s.l_partkey
WHERE 5 * CAST(l_quantity AS BIGINT) * cnt < sq
""",
)


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no RECENT
    orders (every testdata customer has SOME order, so dormancy is
    "no order on/after 2000-01-01"), grouped by nation. Two
    decorrelations in one query: the global scalar average becomes a
    1-row broadcast (compared EXACTLY as balance·n > sum on cents —
    no float average), and NOT EXISTS becomes a left-anti join
    against the distinct recent-order customer set."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    stats = cu.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_money(F.col("c_acctbal"))).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    recent = od.filter(F.col("o_orderdate").cast("date") >= F.lit("2000-01-01")).select(
        "o_custkey"
    )
    return (
        cu.crossJoin(F.broadcast(stats))
        .filter(_money(F.col("c_acctbal")) * F.col("_n") > F.col("_s"))
        .join(recent, cu.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _out(F.sum(_money(F.col("c_acctbal")))).alias("totacctbal"),
        )
    )


register(
    "q22_dormant_customers",
    q22_dormant_customers,
    """
WITH st AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS s, COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0
),
recent AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE CAST(o_orderdate AS DATE) >= DATE '2000-01-01'
)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
FROM customer, st
WHERE CAST(c_acctbal AS DECIMAL(12,2)) * n > s
  AND c_custkey NOT IN (SELECT o_custkey FROM recent)
GROUP BY c_nationkey
""",
)


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (ref src/queries.ts has no analytic tier; this
    rounds out the decorrelation wave): late-shipment counts split by
    order-priority class, grouped over the line's status — the
    two-class conditional-count-after-join pattern. The testdata
    schema has no l_shipmode/l_commitdate/l_receiptdate, so the
    two-mode filter becomes the two-valued l_linestatus and "late" is
    ship-lag > 60 days against the order date. The ship-year window
    filters lineitem BEFORE the join (pushed to the scan); the
    orderkey equi-join shuffles both fact tables on the same key —
    no broadcast, both sides are fact-sized at 100 TB."""
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01"))
        )
        .select("l_orderkey", "l_linestatus", "l_shipdate")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .filter(
            F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
            > 60
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


register(
    "q12_shipmode_priority",
    q12_shipmode_priority,
    """
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
  AND datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
)


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier on a
    finished multi-supplier order — the classic correlated
    EXISTS + NOT-EXISTS pair over the same fact table. Decorrelated
    the scale way: ONE per-order aggregate (distinct suppliers,
    distinct LATE suppliers) replaces both self-join subqueries, and
    the whole chain — orderkey join, groupBy orderkey, stats
    join-back — stays on one hash partitioning, so Spark plans a
    single Exchange for all three steps instead of the oracle's two
    correlated re-scans. "Late" is ship-lag > 90 days (schema has no
    l_commitdate/l_receiptdate). The supplier→nation probe side is a
    broadcast dim chain, as in q7."""
    # r16 negative result (guide §1): an explicit orderkey exchange at
    # compute width ahead of this chain measured SLOWER (warm A/B at
    # sf0.1: 1.34 → 1.7 s) — the two countDistinct aggregates already
    # exchange on the orderkey, and the extra stage outweighs the wide
    # scan-side work here.  Left on the scan partitioning.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    od = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lines = li.join(od, li.l_orderkey == od.o_orderkey).withColumn(
        "late",
        F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
        > 90,
    )
    stats = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    dim = su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    return (
        lines.filter(F.col("late"))
        .join(stats, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(dim), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


register(
    "q21_suppliers_kept_waiting",
    q21_suppliers_kept_waiting,
    """
WITH l AS (
  SELECT l_orderkey, l_suppkey,
    datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90 AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM l l1
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = 'NATION_9'
  AND l1.late
  AND EXISTS (SELECT 1 FROM l l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM l l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
""",
)


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s)
    offering the minimum cost in one region — the classic correlated
    scalar-MIN subquery, decorrelated the scale way. The testdata has
    no partsupp table, so the part↔supplier offer relation is DERIVED
    from lineitem: offer cost = MIN(l_extendedprice) per
    (l_partkey, l_suppkey) — one fact-table aggregate partitioned on
    l_partkey. The per-part minimum is a second aggregate on the SAME
    key followed by a join-back on (partkey, cost), so the whole
    min+argmin chain rides one hash partitioning of the offers frame;
    the eligible-supplier probe (supplier⋈nation⋈region) and the
    filtered part dim are broadcast. The offers frame feeds BOTH the
    per-part min and the join-back; Spark plans no ReusedExchange for
    that diamond (measured — see q11), so offers is materialized once
    ((part,supp)-cardinality, tiny next to the fact) and the min +
    join-back chain reads the checkpoint. Ties on the minimum survive
    (TPC-H semantics) and the sort is total, so output is
    deterministic. Oracle keeps the CORRELATED form, proving the
    decorrelation equivalent. Ref provenance: src/queries.ts has no
    analytic tier; this completes the 22-shape TPC-H sweep."""
    from xero_api_etl_utilities_spark.operators.materialize import materialize
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re_ = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    dim = (
        su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re_), na.n_regionkey == re_.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pa = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & F.col("p_size").isin(5, 15, 25, 35, 45)
    )
    offers = materialize(
        li.join(F.broadcast(pa.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
        .groupBy("l_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(_money(F.col("l_extendedprice"))).alias("cost"))
    )
    best = (
        offers.groupBy("l_partkey")
        .agg(F.min("cost").alias("min_cost"))
        .withColumnRenamed("l_partkey", "b_partkey")
    )
    return (
        offers.join(
            F.broadcast(best),
            (offers.l_partkey == F.col("b_partkey"))
            & (offers.cost == F.col("min_cost")),
        )
        .select(
            F.round(F.col("s_acctbal"), 2).cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            offers.l_partkey.alias("p_partkey"),
            _out(F.col("cost")).alias("min_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


register(
    "q2_min_cost_supplier",
    q2_min_cost_supplier,
    """
WITH dim AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
),
offers AS (
  SELECT l_partkey, s_suppkey, s_name, s_acctbal, n_name,
    MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN dim ON s_suppkey = l_suppkey
  WHERE p_type = 'SMALL' AND p_size IN (5, 15, 25, 35, 45)
  GROUP BY 1, 2, 3, 4, 5
)
SELECT CAST(ROUND(s_acctbal, 2) AS DOUBLE) AS s_acctbal, s_name, n_name,
  l_partkey AS p_partkey, CAST(ROUND(cost, 2) AS DOUBLE) AS min_cost
FROM offers o1
WHERE cost = (SELECT MIN(cost) FROM offers o2 WHERE o2.l_partkey = o1.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value for one nation's
    suppliers, kept only where the part's value exceeds a fixed
    fraction of the nation's TOTAL value — the HAVING-against-scalar-
    subquery pattern. Value is derived from lineitem (no partsupp):
    SUM(l_extendedprice) per l_partkey over NATION_3 suppliers. The
    scalar total is a second-stage re-aggregate of the per-part sums
    broadcast back as a 1-row frame; the threshold compare is decimal
    cross-multiplied (value * 1000 > total) so no division ever runs.

    Two scale decisions this query pins down (measured, PLANS.md):
    Spark does NOT reuse the per-part aggregate exchange between the
    total branch and the output branch (no ReusedExchange even
    pre-AQE), so the naive lazy form scans the 100 TB fact TWICE —
    the per-part frame is therefore materialized (part-cardinality
    rows, tiny next to the fact) and both branches read the
    checkpoint. The total itself becomes a 1-row driver scalar
    embedded as a filter literal — the same documented pattern as the
    quality gates and convergence checks (a join attach either
    nested-loops a conditionless 1-row build or constant-folds an
    equi-key away back to the nested loop; the literal keeps the
    output branch a pure zero-shuffle filter over the checkpoint).
    Oracle uses the scalar subquery form."""
    from xero_api_etl_utilities_spark.operators.materialize import materialize

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    su = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)
    per_part = materialize(
        li.join(F.broadcast(su.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_money(F.col("l_extendedprice"))).alias("val"))
    )
    # 1-row driver-side scalar over the ALREADY-materialized aggregate
    # (exact Decimal survives the round-trip into the literal)
    total = per_part.agg(F.sum("val").alias("total")).collect()[0]["total"]
    return (
        per_part.filter(F.col("val") * 1000 > F.lit(total))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            _out(F.col("val")).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


register(
    "q11_important_stock",
    q11_important_stock,
    """
WITH v AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS val
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  WHERE s_nationkey = 3
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(ROUND(val, 2) AS DOUBLE) AS part_value
FROM v
WHERE val * 1000 > (SELECT SUM(val) FROM v)
ORDER BY part_value DESC, p_partkey
""",
)


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can furnish parts
    of each (brand, type, size) combo, excluding a complaints-flagged
    supplier set — the NOT-IN-subquery + COUNT-DISTINCT-after-join
    pattern. The part↔supplier relation is the distinct
    (l_partkey, l_suppkey) projection of lineitem; NOT IN lowers to a
    broadcast LEFT ANTI join (the exclusion list is provably
    null-free, so anti-join semantics match NOT IN exactly); the part
    attribute filter is a broadcast dim. The only fact-sized shuffle
    is the final count-distinct aggregate, keyed on the 3-part group —
    distinct (part,supp) pairs are first collapsed map-side."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    pa = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 14, 19, 23, 36)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7"))
        .select("s_suppkey")
    )
    return (
        li.join(
            F.broadcast(pa.select("p_partkey", "p_brand", "p_type", "p_size")),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


register(
    "q16_supplier_part_counts",
    q16_supplier_part_counts,
    """
SELECT p_brand, p_type, p_size,
  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 14, 19, 23, 36)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)


def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: name the suppliers in one nation whose
    shipments of a part family concentrate in the target year — the
    nested semi-join chain (supplier IN … partkey IN … correlated
    quantity threshold). Without partsupp, "excess stock" is re-read
    off lineitem itself: a (l_partkey, l_suppkey) pair qualifies when
    its 1997-shipped quantity exceeds half its all-time quantity.
    Both quantities come from ONE conditional aggregate over a single
    fact scan (never two correlated re-scans, which is how the oracle
    states it); the compare is integer cross-multiplied (2*q97 >
    total). Qualifying pairs collapse to distinct suppkeys (tiny) and
    semi-join the broadcast nation-filtered supplier dim."""
    pa = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    q97 = F.when(
        F.year(F.col("l_shipdate").cast("date")) == 1997, F.col("l_quantity")
    ).otherwise(F.lit(0.0))
    qualifying = (
        li.join(F.broadcast(pa.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(q97).cast("bigint").alias("q_1997"),
            F.sum("l_quantity").cast("bigint").alias("q_total"),
        )
        .filter(F.lit(2) * F.col("q_1997") > F.col("q_total"))
        .select("l_suppkey")
        .distinct()
    )
    su = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 7)
    return (
        su.join(qualifying, su.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_name", F.round(F.col("s_acctbal"), 2).cast("double").alias("s_acctbal"))
        .orderBy("s_name")
    )


register(
    "q20_excess_stock_suppliers",
    q20_excess_stock_suppliers,
    """
SELECT s_name, CAST(ROUND(s_acctbal, 2) AS DOUBLE) AS s_acctbal
FROM supplier
WHERE s_nationkey = 7
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'small%'
    GROUP BY l_partkey, l_suppkey
    HAVING 2 * CAST(SUM(CASE WHEN year(CAST(l_shipdate AS DATE)) = 1997
                             THEN l_quantity ELSE 0 END) AS BIGINT)
           > CAST(SUM(l_quantity) AS BIGINT)
  )
ORDER BY s_name
""",
)
