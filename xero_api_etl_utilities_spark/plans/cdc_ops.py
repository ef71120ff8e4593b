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


def snapshot_diff_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse CDC: diff two synthetic snapshot versions of orders —
    v2 revises every 7th order's priority, drops every 13th, and adds
    a shifted-key batch — then summarize the derived change set per
    change_type (operators/merge.snapshot_diff: one full-outer join,
    null-safe struct compare). The key checksum pins WHICH keys
    changed, not just how many."""
    from xero_api_etl_utilities_spark.operators.merge import snapshot_diff

    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    new = (
        od.filter(F.col("o_orderkey") % 13 != 0)
        .withColumn(
            "o_orderpriority",
            F.when(F.col("o_orderkey") % 7 == 0, F.lit("0-REVISED")).otherwise(
                F.col("o_orderpriority")
            ),
        )
        .unionByName(
            od.filter(F.col("o_orderkey") % 11 == 0).select(
                (F.col("o_orderkey") + F.lit(10_000_000)).alias("o_orderkey"),
                "o_orderpriority",
                "o_totalprice",
            )
        )
    )
    diff = snapshot_diff(od, new, key_cols=["o_orderkey"])
    return diff.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("o_orderkey").cast("bigint").alias("key_checksum"),
    )


register(
    "snapshot_diff_summary",
    snapshot_diff_summary,
    """
WITH old AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
),
new AS (
  SELECT o_orderkey,
    CASE WHEN o_orderkey % 7 = 0 THEN '0-REVISED' ELSE o_orderpriority END AS o_orderpriority,
    o_totalprice
  FROM orders WHERE o_orderkey % 13 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_orderpriority, o_totalprice
  FROM orders WHERE o_orderkey % 11 = 0
),
diff AS (
  SELECT COALESCE(new.o_orderkey, old.o_orderkey) AS k,
    CASE WHEN old.o_orderkey IS NULL THEN 'added'
         WHEN new.o_orderkey IS NULL THEN 'removed'
         WHEN new.o_orderpriority IS DISTINCT FROM old.o_orderpriority
           OR new.o_totalprice IS DISTINCT FROM old.o_totalprice THEN 'changed'
    END AS change_type
  FROM new FULL OUTER JOIN old ON new.o_orderkey = old.o_orderkey
)
SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n_keys,
  CAST(SUM(k) AS BIGINT) AS key_checksum
FROM diff WHERE change_type IS NOT NULL
GROUP BY change_type
""",
)
