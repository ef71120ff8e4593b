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
- lineage is truncated every round (iterative self-joins otherwise
  grow the plan exponentially and overwhelm the optimizer long before
  data size matters) via :func:`materialize` — executor-local by
  default, reliable DFS checkpointing when ``checkpoint_dir`` is set;
- convergence is detected by the label-sum invariant: labels only
  ever decrease, so an unchanged sum ⇔ fixpoint. The sum runs in
  DECIMAL(38,0) — a corpus of 10¹² documents with 64-bit ids would
  overflow a BIGINT sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xero_api_etl_utilities_spark.operators.materialize import materialize


def connected_components(
    edges: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(doc, cluster_id) for every vertex appearing in ``edges``;
    cluster_id = min vertex id of the connected component.

    Vertices not mentioned in any edge are absent — callers wanting
    singleton rows left-join this result against their corpus and
    coalesce to the vertex's own id.

    Raises RuntimeError if ``max_iters`` rounds pass without reaching
    the fixpoint (component diameter > max_iters): returning a
    half-propagated labeling would silently split clusters.

    ``checkpoint_dir``: per-round materialization is executor-local by
    default (fast, single-JVM-safe); pass a reliable-storage path for
    long cluster runs — see :mod:`materialize` for the trade.
    """
    # Materialize the symmetric edge list ONCE: it is joined every
    # round, and without this the whole upstream pipeline (e.g. the
    # MinHash+LSH candidate generation feeding a dedup clustering)
    # would re-execute per round.
    sym = materialize(
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct(),
        checkpoint_dir,
    )
    labels = materialize(
        sym.select(F.col("src").alias("doc"))
        .distinct()
        .select("doc", F.col("doc").alias("lbl")),
        checkpoint_dir,
    )
    prev_sum = labels.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))).collect()[0][0]
    for _ in range(max_iters):
        nbr = (
            sym.join(labels.select(F.col("doc").alias("src"), "lbl"), "src")
            .groupBy("dst")
            .agg(F.min("lbl").alias("nbr_lbl"))
            .select(F.col("dst").alias("doc"), "nbr_lbl")
        )
        labels = materialize(
            labels.join(nbr, "doc", "left").select(
                "doc",
                F.least(F.col("lbl"), F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
            ),
            checkpoint_dir,
        )
        cur_sum = labels.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))).collect()[0][0]
        if cur_sum == prev_sum:
            return labels.select("doc", F.col("lbl").alias("cluster_id"))
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds —"
        " component diameter exceeds max_iters; raise it for chain-shaped graphs."
    )
