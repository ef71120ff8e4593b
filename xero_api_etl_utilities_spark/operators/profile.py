"""Single-pass table profiling: per-column null count, distinct
count, min/max — the data-quality survey a pipeline runs before
trusting a new 100 TB drop (the engine-side generalization of the
reference's ad-hoc per-field guards, e.g. the customerId/amount
checks in src/parse.ts:86-95).

Scale design: ONE aggregation over ONE scan computes every column's
metrics simultaneously (each metric is an independent aggregate
expression, all map-side combinable), then the 1×(4·n_cols) row is
UNPIVOTed driver-side into tidy (column, metric) rows — the reshape
happens on a single row, so the fan-out costs nothing. The
alternative — one pass per column — scans the table n_cols times;
at 100 TB that is the difference between one job and thirty.

Distinct counts are EXACT here (count_distinct shuffles per column);
profiling at full scale should swap in approx_count_distinct — the
signature keeps that a one-line change and `agg_approx_distinct_ok`
already pins the sketch's honesty against exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled column: (column, n_nulls, n_distinct,
    min_value, max_value) with min/max rendered as strings so mixed
    column types share one output schema."""
    aggs = []
    for c in cols:
        aggs += [
            F.count_if(F.col(c).isNull()).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")
