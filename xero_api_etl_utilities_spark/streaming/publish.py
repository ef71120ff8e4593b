"""Incremental curated-corpus PUBLISH (VERDICT r10 item 7): the
``foreachBatch`` twin of the batch capstone
(``plans/wave10.publish_corpus``) — each micro-batch of emitted
documents is appended to the training-pack artifact EXACTLY ONCE
across crash/replay, with pack ids that continue the sharded
fixed-boundary layout (``operators/packing.pack_fixed_budget``)
instead of restarting at 0 per batch.

Pack-id continuity without a sequential bottleneck: the batch
operator assigns ``pack_id = floor(prev_running_tokens / budget)``
within a shard.  Incrementally, the only cross-batch state that
formula needs is ONE integer per shard — the cumulative token mass
already published (the "pack high-water").  Each batch stores the
token mass it ADDED per shard in a per-batch state subdirectory;
the carry for batch N is the SUM over prior batches — associative,
so replay order cannot corrupt it, and a shard's carry is exact even
when a pack straddles a batch boundary (the straddling pack simply
receives rows from two batch dirs, exactly as the one-shot layout
would place them).

Ordering contract (documented, asserted by the parity test): the
incremental layout equals the one-shot batch layout iff documents
arrive in the layout order per shard (batch k's ids precede batch
k+1's).  That is the normal shape for a publish stream — an upstream
curation pipeline appends in ingest order — and when ingest is NOT
ordered the artifact is still a valid fixed-budget packing, just a
different one than a global re-sort would produce.

Exactly-once machinery is the house pattern (``cdc_sink``): per-batch
subdirectories ``batch=<run_id>-<batch_id>`` published by tmp-dir +
atomic rename, replayed batches skipped wholesale when both dirs
exist, the artifact/state pair pinned with ``localCheckpoint`` before
either write so they cannot diverge, and prior state read EXCLUDING
the current batch's own subdirectory.  Readers see the batch dirs as
a harmless ``batch`` lineage partition column.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xero_api_etl_utilities_spark.streaming.cdc_sink import _query_run_id


def _sweep_inprogress(d: str) -> None:
    """Remove orphaned ``*.inprogress`` dirs left by a crash between
    tmp-write and rename.  The state dir always got this sweep; the
    OUT dir needs it too — after checkpoint recreation the old run's
    tag never replays, and parquet partition discovery would otherwise
    pick the half-written ``batch=<old>-N.inprogress`` dir up as a
    partition value (ADVICE r11)."""
    if not os.path.isdir(d):
        return
    for e in os.listdir(d):
        if e.endswith(".inprogress"):
            shutil.rmtree(os.path.join(d, e))


def _published_batches(state_dir: str, own_tag: str) -> list[str]:
    if not os.path.isdir(state_dir):
        return []
    _sweep_inprogress(state_dir)
    return [
        os.path.join(state_dir, d)
        for d in os.listdir(state_dir)
        if d.startswith("batch=")
        and not d.endswith(".inprogress")
        and d != f"batch={own_tag}"
    ]


def _publish(df: DataFrame, final_dir: str) -> None:
    if os.path.isdir(final_dir):
        return
    tmp = f"{final_dir}.inprogress"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    df.write.mode("overwrite").parquet(tmp)
    os.rename(tmp, final_dir)


def apply_pack_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    tokens_col: str = "kept_tokens",
    shard_col: str = "source",
    budget: int = 4096,
) -> None:
    """The per-batch body (module-level so a crash replay is directly
    drivable in tests): pack the batch with the carried per-shard token
    high-water, then publish artifact + state atomically."""
    from xero_api_etl_utilities_spark.operators.packing import pack_fixed_budget

    spark = batch_df.sparkSession
    tag = f"{_query_run_id(checkpoint_dir)}-{batch_id}"
    out_b = os.path.join(out_dir, f"batch={tag}")
    state_b = os.path.join(state_dir, f"batch={tag}")
    if os.path.isdir(out_b) and os.path.isdir(state_b):
        return  # fully applied; replay is a no-op
    _sweep_inprogress(out_dir)

    packed = pack_fixed_budget(
        batch_df, id_col, tokens_col, budget, shard_col=shard_col
    ).withColumnRenamed("shard", shard_col)

    prior = _published_batches(state_dir, tag)
    if prior:
        carry = (
            spark.read.parquet(*prior)
            .groupBy(shard_col)
            .agg(F.sum("added_tokens").alias("_carry"))
        )
        packed = packed.join(F.broadcast(carry), shard_col, "left")
    else:
        packed = packed.withColumn("_carry", F.lit(None).cast("bigint"))
    packed = packed.select(
        id_col,
        shard_col,
        "n_tokens",
        (F.col("prev_tokens") + F.coalesce(F.col("_carry"), F.lit(0))).alias(
            "prev_tokens"
        ),
    ).withColumn("pack_id", F.expr(f"prev_tokens div {budget}"))

    artifact = batch_df.join(
        packed.select(id_col, "prev_tokens", "pack_id"), id_col
    ).localCheckpoint()
    new_state = (
        artifact.groupBy(shard_col)
        .agg(F.sum(F.col(tokens_col).cast("bigint")).alias("added_tokens"))
        .localCheckpoint()
    )

    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(state_dir, exist_ok=True)
    _publish(artifact, out_b)
    _publish(new_state, state_b)


def stream_pack_publish_sink(
    docs: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    tokens_col: str = "kept_tokens",
    shard_col: str = "source",
    budget: int = 4096,
):
    """Append each micro-batch of emitted documents to the pack
    artifact with shard-continuous pack ids.  ``docs`` is the emitted
    stream (post span-dedup, ``tokens_col > 0`` upstream); the sink
    adds ``pack_id``/``prev_tokens`` and publishes every payload
    column.

    100 TB shape: one window per batch partitioned by the shard key
    (never global), a shard-cardinality carry join (broadcastable),
    and a shard-cardinality state row per batch — state is O(shards),
    not O(docs)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_pack_batch(
            batch_df,
            batch_id,
            out_dir=out_dir,
            state_dir=state_dir,
            checkpoint_dir=checkpoint_dir,
            id_col=id_col,
            tokens_col=tokens_col,
            shard_col=shard_col,
            budget=budget,
        )

    return (
        docs.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
