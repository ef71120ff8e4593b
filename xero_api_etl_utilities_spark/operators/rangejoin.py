"""Range join (point-in-interval), bucketed for scale.

Spark has no native interval-join operator; the naive formulation
``points.join(intervals, (s <= p) & (p <= e))`` is a broadcast
nested-loop — O(P×I), a scale-killer. The standard fix (the same
trick behind Databricks' range-join hint) makes it an equi-join:

1. pick a bucket width W in the point's units;
2. each point lands in bucket ``p div W``;
3. each interval explodes to every bucket it overlaps
   (``s div W .. e div W`` — cost O(I × span/W));
4. equi-join on bucket (plus any caller keys), then apply the exact
   ``s <= p <= e`` residual filter.

Each matching (point, interval) pair meets in EXACTLY ONE bucket (the
point's), so no distinct pass is needed. Shuffle cost is
O(P + I×span/W) rows on integer keys — pick W near the typical
interval span so the explode factor stays ~2 and buckets stay small.
Skewed buckets (many intervals covering one hot bucket) are the same
problem as any skewed join key: AQE skew handling or salting applies
unchanged.

Columns are NUMERIC (caller converts dates/timestamps to days/epoch
units first) — keeps the operator engine-agnostic and the bucket math
exact integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= point <= end`` (and equal ``keys``, if given), without
    a nested-loop join. Output: all point columns + all interval
    columns (keys deduplicated)."""
    if bucket <= 0:
        raise ValueError("bucket width must be a positive integer")
    keys = keys or []
    p = points.withColumn("_bkt", F.expr(f"{point_col} div {bucket}"))
    i = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {bucket}"),
                F.expr(f"{end_col} div {bucket}"),
            )
        ),
    )
    joined = p.join(i, on=["_bkt", *keys], how="inner").filter(
        (F.col(start_col) <= F.col(point_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("_bkt")
