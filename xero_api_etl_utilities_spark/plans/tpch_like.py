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
