"""Connected components over candidate-pair graphs — the clustering
step a dedup pipeline runs AFTER pair generation (MinHash-LSH /
SimHash emit near-dup PAIRS; keeping one survivor per duplicate
GROUP requires the transitive closure).

No reference counterpart; north-star training-data-pipeline surface.

Algorithm: min-label propagation to fixpoint — every vertex starts
labeled with its own id; each round takes the min over neighbors'
labels; at fixpoint every vertex carries the min id of its component
(a deterministic, engine-independent cluster id, so the result is
DuckDB-oracle-checkable via a recursive CTE running the same
propagation).

Scale design:
- each round is one equi-join (edges × labels on src) plus one
  groupBy-min — partial aggregation absorbs high-degree hub skew
  map-side before the shuffle;
- rounds needed = graph diameter, which for near-dup graphs is tiny
  (duplicate clusters are near-cliques); ``max_iters`` bounds the
  pathological chain case;
- ``localCheckpoint`` truncates lineage every round — iterative
  self-joins otherwise grow the plan exponentially and overwhelm the
  optimizer long before data size matters;
- convergence is detected by the label-sum invariant: labels only
  ever decrease, so an unchanged sum ⇔ fixpoint. The sum runs in
  DECIMAL(38,0) — a corpus of 10¹² documents with 64-bit ids would
  overflow a BIGINT sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """(doc, cluster_id) for every vertex appearing in ``edges``;
    cluster_id = min vertex id of the connected component.

    Vertices not mentioned in any edge are absent — callers wanting
    singleton rows left-join this result against their corpus and
    coalesce to the vertex's own id.

    Raises RuntimeError if ``max_iters`` rounds pass without reaching
    the fixpoint (component diameter > max_iters): returning a
    half-propagated labeling would silently split clusters.
    """
    # Materialize the symmetric edge list ONCE: it is joined every
    # round, and without this the whole upstream pipeline (e.g. the
    # MinHash+LSH candidate generation feeding a dedup clustering)
    # would re-execute per round.
    sym = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("src").alias("doc"))
        .distinct()
        .select("doc", F.col("doc").alias("lbl"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))).collect()[0][0]
    for _ in range(max_iters):
        nbr = (
            sym.join(labels.select(F.col("doc").alias("src"), "lbl"), "src")
            .groupBy("dst")
            .agg(F.min("lbl").alias("nbr_lbl"))
            .select(F.col("dst").alias("doc"), "nbr_lbl")
        )
        labels = (
            labels.join(nbr, "doc", "left")
            .select(
                "doc",
                F.least(F.col("lbl"), F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))).collect()[0][0]
        if cur_sum == prev_sum:
            return labels.select("doc", F.col("lbl").alias("cluster_id"))
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds —"
        " component diameter exceeds max_iters; raise it for chain-shaped graphs."
    )
