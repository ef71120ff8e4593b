"""CDC merge catalog queries: latest-wins snapshot assembly over a
base table plus deterministic synthetic change batches derived from
the same parquet (so the oracle sees identical inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xero_api_etl_utilities_spark.operators.merge import merge_latest
from xero_api_etl_utilities_spark.plans.catalog import register
from xero_api_etl_utilities_spark.plans.flagship import _money, _out
from xero_api_etl_utilities_spark.sources.parquet import load_table


def merge_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as one aggregation: base orders (v1) +
    an update batch re-prioritizing every 7th order (v2) + a delete
    batch tombstoning every 13th (v2; wins over the update where both
    apply since deletes carry the same version and the update batch
    excludes them). Snapshot = max_by(payload, version) per key, then
    drop tombstone winners — shuffles the KEY once with map-side
    partial collapse, no window sort (operators/merge.py)."""
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    base = od.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.lit(1).alias("_v"),
        F.lit(False).alias("_del"),
    )
    updates = (
        od.filter((F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 13 != 0))
        .withColumn("o_orderpriority", F.lit("0-REVISED"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.lit(2).alias("_v"),
            F.lit(False).alias("_del"),
        )
    )
    deletes = od.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.lit(2).alias("_v"),
        F.lit(True).alias("_del"),
    )
    snapshot = merge_latest(
        base.unionByName(updates).unionByName(deletes),
        key_cols=["o_orderkey"],
        version_col="_v",
        delete_col="_del",
    )
    # summarize so the hashed result is small and stable: per surviving
    # priority, how many orders and how much money
    return snapshot.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _out(F.sum(_money(F.col("o_totalprice")))).alias("total_price"),
    )


register(
    "merge_cdc_snapshot",
    merge_cdc_snapshot,
    """
WITH changes AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice, 1 AS v, FALSE AS del
  FROM orders
  UNION ALL
  SELECT o_orderkey, '0-REVISED', o_totalprice, 2 AS v, FALSE AS del
  FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0
  UNION ALL
  SELECT o_orderkey, o_orderpriority, o_totalprice, 2 AS v, TRUE AS del
  FROM orders WHERE o_orderkey % 13 = 0
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY v DESC) AS rn
  FROM changes
),
snapshot AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice
  FROM ranked WHERE rn = 1 AND NOT del
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_price
FROM snapshot
GROUP BY o_orderpriority
""",
)
