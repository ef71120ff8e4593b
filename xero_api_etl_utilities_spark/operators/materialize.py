"""Lineage truncation with a fault-tolerance knob.

Iterative operators (connected components) and multiply-consumed
frames (candidate pairs feeding three joins) must be materialized or
their upstream plan re-executes per round/consumer and the lineage
grows without bound. Two ways to do that, with different failure
semantics:

- ``localCheckpoint`` (default): blocks live in executor storage.
  Fast — no DFS round-trip — and exactly right on local[n], but an
  executor loss discards the block and Spark CANNOT recompute it
  (lineage was truncated), killing the job. Acceptable when the
  cluster is one JVM; not for a 100 TB run on 1000 preemptible
  executors.
- ``checkpoint`` with a ``checkpoint_dir`` on reliable storage
  (HDFS/S3): blocks are written to the DFS, so any executor can die
  and the frame re-loads. The cost is one DFS write + read per
  materialization — the price of surviving a multi-hour iterative
  job. (VERDICT r2 flagged exactly this: a 100 TB connected-components
  run must not lose 20 rounds of work to one preemption.)

Every operator that truncates lineage routes through
:func:`materialize` and exposes ``checkpoint_dir``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def compute_width(df: DataFrame, *keys: str) -> DataFrame:
    """Explicit exchange to the cluster compute width
    (``sc.defaultParallelism``) — the r15/r16 lever for CPU-bound
    per-row chains (tokenize / shingle / hash / explode) that sit
    between a scan and the first shuffle (guide §2.5).

    On this engine's bench inputs every parquet table is a single row
    group, so every scan is ONE task and the whole pre-exchange chain
    runs single-threaded; AQE then coalesces the small downstream
    shuffles, so nothing ever widens the plan.  An explicit keyed
    repartition is immune to AQE coalescing and, when ``keys`` is a
    subset of a downstream clustering requirement (groupBy /
    dropDuplicates / join key), the downstream operator reuses the
    partitioning — one exchange, full width.  On a 100 TB layout the
    scan itself is already wide and this exchange is one narrow
    balanced pass; keys should be high-cardinality (doc_id, orderkey).

    ONLY for paths whose hashed outputs are partitioning-independent:
    integer/decimal aggregates, hashes, exact counts.  Float sums are
    NOT order-safe — leave those paths on their natural partitioning.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par, *keys) if keys else df.repartition(par)


def materialize(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """Materialize ``df`` and truncate its lineage.

    ``checkpoint_dir=None`` → ``localCheckpoint()`` (executor-local,
    fast, not fault-tolerant). A path → reliable ``checkpoint()``
    into that directory (Spark creates a per-set UUID subdirectory
    under it).  The dir is (re-)pointed on every call: the previous
    set-once-if-unset rule meant that once ANY caller had set a
    checkpoint dir on the shared SparkContext, a later caller asking
    for a DIFFERENT dir silently checkpointed into the first one
    (r16: surfaced by the lazy-rounds guard test).  One extra mkdir
    per materialize call is noise next to the checkpoint write.
    """
    if checkpoint_dir is None:
        return df.localCheckpoint()
    sc = df.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint()
