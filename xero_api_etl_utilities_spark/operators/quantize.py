"""X2 adjunct — embedding scalar quantization (int8 codes).

An ANN index over a 100 TB corpus does not store float32 vectors: the
standard first compression step (FAISS ``SQ8``; the same recipe behind
most vector stores' "scalar quantization") maps each dimension to an
8-bit code against per-dimension min/max trained ON the corpus:

    code_d(x) = floor((x - mn_d) * 255 / (mx_d - mn_d) + 0.5)

4× smaller than float32, decoded on the fly during scan. The whole
thing is column math:

- the stats pass is ONE map-side-combinable aggregation (min/max per
  dimension — no sums, so results are exact and engine-identical);
- the stats frame is dimensions-sized (tiny) and broadcast back, so
  encoding is a corpus-scan projection — no corpus-sized shuffle,
  embarrassingly parallel at any scale.

Float discipline for the oracle: float32 → float64 widening is exact,
min/max involve no arithmetic, and the code formula is written with
ONE association — ``((x - mn) * 255.0) / span + 0.5`` — in both
engines, so every intermediate double is bit-identical and the floor
is deterministic cross-engine (no round-to-nearest-ties to argue
about).

Constant dimensions (span 0) code to 0 by definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sq8_codes(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, dim, code) int8 scalar-quantization codes, one row per
    vector dimension; ``dim`` is 0-based. Stats (per-dim min/max) are
    trained on ``df`` itself in the same lazy plan."""
    dims = df.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col)).alias("dim", "_x"),
    ).select(id_col, "dim", F.col("_x").cast("double").alias("x"))
    stats = dims.groupBy("dim").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    code = F.when(
        F.col("mx") - F.col("mn") > 0,
        F.floor(
            ((F.col("x") - F.col("mn")) * F.lit(255.0)) / (F.col("mx") - F.col("mn"))
            + F.lit(0.5)
        ),
    ).otherwise(F.lit(0))
    return dims.join(F.broadcast(stats), "dim").select(
        F.col(id_col),
        F.col("dim").cast("int").alias("dim"),
        code.cast("int").alias("code"),
    )
