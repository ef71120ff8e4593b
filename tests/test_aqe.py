"""AQE behaviors the engine's 100 TB posture relies on, PROVEN at
runtime rather than asserted in comments: the skew-join split and
shuffle-partition coalescing must actually fire in the final adaptive
plan. (The write path clones the plan, so assertions read the
DataFrame's own query execution after a collect.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_TUNABLES = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def aqe_tuned(spark):
    saved = {}
    for k, v in _TUNABLES.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_skew_join_splits_the_hot_key(aqe_tuned):
    spark = aqe_tuned
    # 90% of the left side lands on key 0 — one partition dwarfs the
    # rest, the situation AQE's OptimizeSkewedJoin exists for
    left = spark.range(0, 300_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(0, 1_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    agg = left.join(right, "k").groupBy().count()
    plan = _final_plan(agg)
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, "AQE did not split the skewed join"


def test_small_shuffle_partitions_coalesce(aqe_tuned):
    spark = aqe_tuned
    # a tiny aggregate shuffled across the configured partitions must
    # coalesce at runtime (AQEShuffleRead coalesced)
    df = (
        spark.range(0, 10_000)
        .select((F.col("id") % 50).alias("k"))
        .groupBy("k")
        .count()
    )
    plan = _final_plan(df)
    assert "isFinalPlan=true" in plan
    assert "AQEShuffleRead" in plan and "coalesced" in plan


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Dynamic partition pruning on the date-partitioned fact layout
    (sources/writer.py's design): a selective dim predicate must
    surface as a dynamicpruning# filter on the fact's PARTITION
    column — at 100 TB this is the difference between scanning the
    partitions a dim filter selects and scanning the table. Shape
    note (cost the prototype paid): pre-projecting the fact to the
    partition column alone defeats the benefit heuristic; the
    canonical fact-join-dim-with-attribute-filter form triggers it."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").withColumn(
        "day", F.col("ts").cast("date")
    )
    fact_path, dim_path = str(tmp_path / "fact"), str(tmp_path / "dim")
    ev.write.partitionBy("day").mode("overwrite").parquet(fact_path)
    ev.select("day").distinct().withColumn("dow", F.dayofweek("day")).write.mode(
        "overwrite"
    ).parquet(dim_path)
    spark.read.parquet(fact_path).createOrReplaceTempView("dpp_fact")
    spark.read.parquet(dim_path).createOrReplaceTempView("dpp_dim")
    j = spark.sql(
        "SELECT count(*) FROM dpp_fact JOIN dpp_dim"
        " ON dpp_fact.day = dpp_dim.day WHERE dpp_dim.dow = 2"
    )
    opt = j._jdf.queryExecution().optimizedPlan().toString()
    assert "dynamicpruning" in opt.lower(), "DPP filter missing on the fact scan"
