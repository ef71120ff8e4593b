"""As-of join — point-in-time lookup Spark has no native operator for.

For each left row, attach the most recent right row with the same key
whose timestamp is <= (backward) the left timestamp. The classic
implementations are a range join (quadratic blowup per key) or a
per-key loop; the scale-correct Spark expression is the
union-sort-window trick:

    union both sides tagged → one window per key ordered by
    (ts, side) → last_value(right attrs, ignorenulls) over rows
    unbounded preceding → keep left rows

One shuffle on the key, sequential scan per key group, no range
explosion — the same shape a 100 TB backfill join wants. DuckDB ships
a native ASOF JOIN, which serves as the oracle for this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join (latest right row at-or-before each left row).

    ``right_cols`` are the right-side attributes to attach (default:
    everything except key and timestamp). Right rows ordered before
    left rows at equal timestamps (a right row AT the left timestamp
    matches, mirroring DuckDB ASOF `>=` semantics).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    # The fill must carry ALL right attributes as ONE struct: filling
    # each column independently with last(ignorenulls) would stitch
    # together values from DIFFERENT right rows whenever a newer right
    # row has a legitimately-NULL attribute (an older row's value would
    # bleed through for that column only).
    lrow_type = T.StructType(
        [T.StructField(c, left.schema[c].dataType, True) for c in left.columns]
    )
    rrow_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType, True) for c in right_cols]
        + [T.StructField("_r_ts", right.schema[right_ts].dataType, True)]
    )
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(rrow_type).alias("_rrow"),
    )
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lrow_type).alias("_lrow"),
        F.struct(
            *[F.col(c) for c in right_cols],
            F.col(right_ts).alias("_r_ts"),
        ).alias("_rrow"),
    )
    merged = lt.unionByName(rt)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "_side",
        "_lrow",
        F.last(F.col("_rrow"), ignorenulls=True).over(w).alias("_rrow"),
    ).filter(F.col("_side") == 1)
    return filled.select(
        F.col("_lrow.*"),
        *[
            F.col(f"_rrow.{c}").alias(f"{c}{suffix}" if c in left.columns else c)
            for c in right_cols
        ],
        F.col("_rrow._r_ts").alias(f"{right_ts}{suffix}"),
    )
