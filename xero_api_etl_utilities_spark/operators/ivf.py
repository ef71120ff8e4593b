"""X2 — IVF (inverted-file) approximate nearest neighbor search.

The second scale path next to hyperplane LSH (operators/similarity.py):
partition the corpus into k centroid cells, search only the query's
``nprobe`` nearest cells.

Division of labor at 100 TB:
- centroid TRAINING is a driver-side k-means over a bounded sample
  (centroids are tiny — k×dim floats — and k-means over a sample is
  the standard IVF recipe; a full-corpus refinement pass could use
  pyspark.ml KMeans, but the sample is what FAISS-style IVF does too);
- cell ASSIGNMENT is pure column math (dot products against inlined
  centroid literals — JVM-side, codegen'd, no Python);
- SEARCH is an equi-join on cell id: corpus cells are the shuffle
  unit, the probe set broadcasts, candidates shrink ~k/nprobe-fold.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xero_api_etl_utilities_spark.operators.similarity import _dot, cosine


def train_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 5,
    sample: int = 2000,
    seed: int = 11,
) -> list[list[float]]:
    """Driver-side k-means (cosine space: vectors L2-normalized) over a
    deterministic bounded sample. Returns k unit centroids."""
    rows = (
        df.select(vec_col).limit(sample).collect()
    )
    vecs = []
    for r in rows:
        v = [float(x) for x in r[0]]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        vecs.append([x / n for x in v])
    rng = random.Random(seed)
    centroids = [list(v) for v in rng.sample(vecs, min(k, len(vecs)))]

    for _ in range(iters):
        sums = [[0.0] * len(centroids[0]) for _ in centroids]
        counts = [0] * len(centroids)
        for v in vecs:
            best, best_d = 0, -2.0
            for ci, c in enumerate(centroids):
                d = sum(a * b for a, b in zip(v, c))
                if d > best_d:
                    best, best_d = ci, d
            counts[best] += 1
            s = sums[best]
            for j, x in enumerate(v):
                s[j] += x
        for ci, (s, n) in enumerate(zip(sums, counts)):
            if n:
                norm = math.sqrt(sum(x * x for x in s)) or 1.0
                centroids[ci] = [x / norm for x in s]
    return centroids


def _centroid_scores(vec_col, centroids: list[list[float]]):
    """Array of (dot, cell_id) structs against each inlined centroid."""
    return F.array(
        *[
            F.struct(
                _dot(vec_col, F.array(*[F.lit(x) for x in c])).alias("d"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """Attach the vector's ``nprobe`` nearest cell ids (exploded) —
    nprobe=1 for corpus indexing, >1 for query probing."""
    scored = F.reverse(F.array_sort(_centroid_scores(F.col(vec_col), centroids)))
    cells = F.slice(scored, 1, nprobe)
    return df.withColumn("cell", F.explode(F.transform(cells, lambda s: s["cell"])))


def topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF search: candidates from the query's nprobe cells, exact
    cosine rank within candidates."""
    cq = assign_cells(queries, centroids, vec_col, nprobe).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "cell"
    )
    cc = assign_cells(corpus, centroids, vec_col, 1).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cell"
    )
    scored = (
        F.broadcast(cq)
        .join(cc, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )
