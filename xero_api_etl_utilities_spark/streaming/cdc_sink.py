"""Streaming CDC apply: maintain a latest-wins snapshot table from a
stream of upsert/delete change rows — the MERGE-sink pattern (what a
table format's streaming MERGE INTO does), built from primitives:
``foreachBatch`` + the batch merge collapse (operators/merge.py) + an
atomic directory swap.

Why foreachBatch: a parquet streaming sink is append-only; MERGE
needs to READ the current snapshot, collapse it with the new batch,
and REPLACE it. ``foreachBatch`` hands each micro-batch to batch-mode
code where that read-merge-swap is expressible. foreachBatch itself is
AT-LEAST-ONCE: a crash between snapshot publish and checkpoint commit
replays the batch. The CDC merge sink tolerates that for free (max_by
re-merge over the same inputs is deterministic, so the re-published
snapshot is value-identical); the additive rollup sink does NOT
(sum-folding the same delta twice double-counts), so it records the
last-applied batch_id in a ``_last_batch_id`` marker inside the
snapshot directory — published atomically with the data by the same
rename — and skips any batch it has already folded. Underscore-prefixed
files are invisible to Spark's parquet reader, so the marker rides the
snapshot without affecting readers.

Why a directory SWAP (write new → atomic rename) instead of
overwrite-in-place: a reader that lists the snapshot dir mid-overwrite
sees missing or duplicated parts; rename is atomic on a POSIX dir and
on HDFS, so readers see the old or the new snapshot, never a mix.
(On object stores rename is copy+delete — there, a table-format
transaction log is the real answer; the swap keeps the same contract
locally. The reference's analog is the versioned upload filename
probe — collision-free publish via name arbitration, the S12 sink.)

Scale: each micro-batch costs one snapshot scan + one key shuffle
(the merge collapse is a single map-side-combinable aggregation).
For a 100 TB snapshot with small deltas that scan dominates, so when
``partition_col`` is given the snapshot is laid out partitioned by it
and each batch (a) READS only partitions the delta touches — the
``isin`` filter prunes at the directory level — and (b) WRITES only
those partitions back via dynamic partition overwrite; untouched
partition directories are never opened. That is the partitioned-table
MERGE optimization. The merged frame is localCheckpoint-materialized
first because Spark (correctly) refuses a same-path read→overwrite
in one plan; the checkpoint cuts the file lineage so the overwrite
sees no self-read.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xero_api_etl_utilities_spark.operators.merge import merge_latest

# snapshot rows rank below every change row: a change carries a real
# version, the applied snapshot is by definition older than all of them
_BASE_VERSION = -(2**62)

# last-applied batch marker: lives inside the snapshot dir so the
# atomic dir rename publishes data + marker together; the leading
# underscore hides it from Spark's parquet file listing.  The marker
# records (run_id, batch_id) — batch ids restart at 0 under a FRESH
# checkpoint, so a bare batch_id would wrongly skip the first batches
# of a legitimate new run; the run_id (derived from the checkpoint
# location, which is 1:1 with a batch-id sequence) scopes the
# comparison to replays of the same query lineage.
_BATCH_MARKER = "_last_batch_id"


def _query_run_id(checkpoint_dir: str | None) -> str:
    """Identity of the batch-id sequence: the streaming query id from
    the checkpoint's ``metadata`` file. Stable across restarts of the
    same checkpoint (replays keep their batch ids), regenerated when
    the checkpoint is recreated (fresh id ⇒ fresh batch-id sequence,
    so old markers can never suppress the new run's batches). Read
    lazily at batch time — the metadata file is written at query start,
    before any batch runs."""
    if checkpoint_dir is None:
        return "adhoc"
    try:
        import json

        with open(os.path.join(checkpoint_dir, "metadata")) as f:
            return str(json.load(f)["id"])
    except (OSError, ValueError, KeyError):
        return checkpoint_dir


def _last_applied_batch(snapshot_dir: str, run_id: str) -> int | None:
    try:
        with open(os.path.join(snapshot_dir, _BATCH_MARKER)) as f:
            stored_run, _, stored_batch = f.read().strip().partition("\n")
            return int(stored_batch) if stored_run == run_id else None
    except (OSError, ValueError):
        return None


def _write_batch_marker(dir_path: str, run_id: str, batch_id: int) -> None:
    with open(os.path.join(dir_path, _BATCH_MARKER), "w") as f:
        f.write(f"{run_id}\n{batch_id}")


def apply_cdc_stream(
    changes: DataFrame,
    snapshot_dir: str,
    key_cols: list[str],
    version_col: str,
    delete_col: str | None = None,
    checkpoint_dir: str | None = None,
    partition_col: str | None = None,
):
    """Start an availableNow query that folds the change stream into
    the parquet snapshot at ``snapshot_dir`` via read-merge-swap.
    Returns the started StreamingQuery (caller awaits termination).

    ``partition_col`` must be COARSE-grained (a date / region / tenant
    style column, at most a few thousand distinct values per batch):
    the touched-partition set is collected to the driver to drive
    directory pruning and stale-partition cleanup. A high-cardinality
    partition column would both bloat that collect and produce a
    pathological small-files layout — repartition the table design,
    not this sink.
    """
    spark = changes.sparkSession

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        exists = os.path.isdir(snapshot_dir)
        if partition_col is not None:
            touched = [
                r[0] for r in batch_df.select(partition_col).distinct().collect()
            ]
            if exists:
                # directory-level pruning: only touched partitions read
                base = (
                    spark.read.parquet(snapshot_dir)
                    .filter(F.col(partition_col).isin(touched))
                    .withColumn(version_col, F.lit(_BASE_VERSION))
                )
                if delete_col is not None:
                    base = base.withColumn(delete_col, F.lit(False))
                changes_in = base.unionByName(batch_df)
            else:
                changes_in = batch_df
            merged = merge_latest(
                changes_in, key_cols, version_col, delete_col
            ).localCheckpoint()
            # dynamic overwrite replaces ONLY the touched partition dirs
            (
                merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(partition_col)
                .parquet(snapshot_dir)
            )
            # a partition whose every row was deleted produces no
            # output partition, so dynamic overwrite leaves its stale
            # directory — remove touched-but-now-empty partitions
            present = {r[0] for r in merged.select(partition_col).distinct().collect()}
            for v in set(touched) - present:
                stale = os.path.join(snapshot_dir, f"{partition_col}={v}")
                if os.path.isdir(stale):
                    shutil.rmtree(stale)
            return
        tmp = f"{snapshot_dir}.inprogress-{batch_id}"
        old = f"{snapshot_dir}.replaced-{batch_id}"
        if exists:
            snap = spark.read.parquet(snapshot_dir)  # payload columns only
            base = snap.withColumn(version_col, F.lit(_BASE_VERSION))
            if delete_col is not None:
                base = base.withColumn(delete_col, F.lit(False))
            merged = merge_latest(
                base.unionByName(batch_df), key_cols, version_col, delete_col
            )
        else:
            merged = merge_latest(batch_df, key_cols, version_col, delete_col)
        merged.write.mode("overwrite").parquet(tmp)
        # atomic publish: old snapshot aside, new one in
        if exists:
            os.rename(snapshot_dir, old)
        os.rename(tmp, snapshot_dir)
        if os.path.isdir(old):
            shutil.rmtree(old)

    writer = changes.writeStream.foreachBatch(_merge_batch).trigger(availableNow=True)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def apply_rollup_stream(
    events: DataFrame,
    snapshot_dir: str,
    group_cols: list[str],
    agg_exprs: dict[str, str],
    checkpoint_dir: str | None = None,
):
    """Incremental view maintenance for ADDITIVE aggregates: maintain
    a per-key rollup (sums/counts) over an unbounded event stream
    without the state store — each micro-batch is pre-aggregated, then
    SUMMED with the existing snapshot (sum-of-sums = sum, the
    additivity that makes IVM exact), and the snapshot swapped in
    atomically.

    Contrast with the watermarked streaming aggregations in
    filestream.py: those hold per-window state and must bound it with
    a watermark; an all-time per-key rollup has no window to expire,
    so its natural home is a materialized table of dimension-bounded
    cardinality, not executor state. The per-batch cost is one
    map-side-combinable aggregation of the DELTA plus a snapshot-size
    merge — independent of total events ever seen.

    ``agg_exprs`` maps output column → SQL aggregate over the input
    (e.g. {"n": "count(*)", "total": "sum(value)"}); only additive
    aggregates (sum/count) fold correctly across batches.

    Replay safety: foreachBatch is at-least-once, and sum-folding is
    not naturally idempotent — a batch replayed after a crash between
    snapshot publish and checkpoint commit would be counted twice. The
    sink therefore persists the last-applied (run, batch_id) in the
    snapshot directory (same atomic rename as the data) and skips any
    batch_id ≤ the marker within the same run, making the fold
    effectively exactly-once.
    """
    spark = events.sparkSession

    def _fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        run_id = _query_run_id(checkpoint_dir)
        last = _last_applied_batch(snapshot_dir, run_id)
        if last is not None and batch_id <= last:
            return  # already folded into the published snapshot — replay
        delta = batch_df.groupBy(*group_cols).agg(
            *[F.expr(e).alias(c) for c, e in agg_exprs.items()]
        )
        if os.path.isdir(snapshot_dir):
            current = spark.read.parquet(snapshot_dir)
            merged = (
                current.unionByName(delta)
                .groupBy(*group_cols)
                .agg(*[F.sum(c).alias(c) for c in agg_exprs])
            )
        else:
            merged = delta
        tmp = f"{snapshot_dir}.inprogress-{batch_id}"
        old = f"{snapshot_dir}.replaced-{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        _write_batch_marker(tmp, run_id, batch_id)  # publishes WITH the data
        if os.path.isdir(snapshot_dir):
            os.rename(snapshot_dir, old)
        os.rename(tmp, snapshot_dir)
        if os.path.isdir(old):
            shutil.rmtree(old)

    writer = events.writeStream.foreachBatch(_fold_batch).trigger(availableNow=True)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def stream_exact_dedup_sink(
    docs: DataFrame,
    out_dir: str,
    seen_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """UNBOUNDED cross-batch exact dedup sink — the companion to
    ``filestream.stream_exact_text_dedup`` for the case the watermark
    form cannot serve: ``dropDuplicatesWithinWatermark`` FORGETS a
    digest once the horizon passes, so a duplicate arriving a week
    later sails through.  This sink accumulates the digest set in a
    parquet side table (``seen_dir``) and anti-joins each micro-batch
    against it — state bounded by DISTINCT content ever accepted (32
    bytes/doc), not by a time horizon, and resident on storage rather
    than in the state store.

    Exactly-once across crash/replay without a transaction log:

    * each batch publishes BOTH outputs into per-batch subdirectories
      ``batch=<run_id>-<batch_id>`` via tmp-dir + atomic rename —
      a replayed batch whose dirs exist is skipped wholesale;
    * the survivor frame is ``localCheckpoint``-pinned BEFORE either
      write, so the accepted rows and their digests cannot diverge;
    * recomputation on partial replay reads the seen set EXCLUDING
      the current batch's own subdirectory, so a crash between the
      two renames reproduces the identical survivor set and only the
      missing rename is redone.

    The anti-join is digest-keyed (sha2-256) — Spark shuffles 32-byte
    keys, never text; at 100 TB the seen table is bucketed by digest
    (write_bucketed_table) to make the anti-join co-located.  Within
    a batch, min-id-per-digest survives (the batch dedup_exact
    rule).  Directory listing/rename use the driver's filesystem API
    (the module's POSIX/HDFS scope note applies; on an object store
    swap them for the Hadoop FileSystem calls).  Readers of ``out_dir`` see the per-batch dirs as a
    ``batch`` partition column — harmless lineage metadata."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        rid = _query_run_id(checkpoint_dir)
        tag = f"{rid}-{batch_id}"
        out_b = os.path.join(out_dir, f"batch={tag}")
        seen_b = os.path.join(seen_dir, f"batch={tag}")
        if os.path.isdir(out_b) and os.path.isdir(seen_b):
            return  # fully applied; replay is a no-op
        hashed = batch_df.withColumn("_h", F.sha2(F.col(text_col), 256))
        keep = hashed.groupBy("_h").agg(F.min(F.col(id_col)).alias(id_col))
        batch1 = hashed.join(keep, ["_h", id_col], "left_semi")
        # Prior-seen listing must see only PUBLISHED batch dirs: a
        # crash-leftover ``batch=<x>.inprogress`` matches the prefix
        # test but holds a partial write — reading it as prior state
        # would anti-join a replayed batch against its own partial
        # digests and diverge from the already-published output.
        # Remove stale temp dirs first (any .inprogress that survived
        # to the next _apply call is by definition a crash leftover —
        # _publish always renames before returning).
        if os.path.isdir(seen_dir):
            for d in os.listdir(seen_dir):
                if d.endswith(".inprogress"):
                    shutil.rmtree(os.path.join(seen_dir, d))
        prior = (
            [
                os.path.join(seen_dir, d)
                for d in os.listdir(seen_dir)
                if d.startswith("batch=")
                and not d.endswith(".inprogress")
                and d != f"batch={tag}"
            ]
            if os.path.isdir(seen_dir)
            else []
        )
        if prior:
            seen = spark.read.parquet(*prior)
            batch1 = batch1.join(seen, "_h", "left_anti")
        surv = batch1.localCheckpoint()

        def _publish(df: DataFrame, final_dir: str) -> None:
            if os.path.isdir(final_dir):
                return
            tmp = f"{final_dir}.inprogress"
            if os.path.isdir(tmp):
                shutil.rmtree(tmp)
            df.write.mode("overwrite").parquet(tmp)
            os.rename(tmp, final_dir)

        os.makedirs(out_dir, exist_ok=True)
        os.makedirs(seen_dir, exist_ok=True)
        _publish(surv.drop("_h"), out_b)
        _publish(surv.select("_h"), seen_b)

    return (
        docs.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_quality_metrics_sink(
    docs: DataFrame,
    metrics_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
):
    """Ingest OBSERVABILITY sink — per micro-batch, append one metrics
    row (batch id, rows, quality-gate failure counts by rule, failure
    rate in bp) to a parquet metrics table: the feed a curation
    dashboard tails to see a bad crawl the moment it lands, without
    materializing the documents twice (the quality census rides the
    same batch frame the real sink consumes).

    Rules are the production quality gate (``textstats.quality_flags``
    — length / punctuation / stopword), counted as conditional sums in
    ONE aggregate; the 1-row result is appended with the batch id.
    Idempotent under replay via the per-batch-file publish rule (a
    batch's metrics file is written once; a replayed batch that finds
    its file skips)."""
    from xero_api_etl_utilities_spark.operators.textstats import quality_flags

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        rid = _query_run_id(checkpoint_dir)
        final_dir = os.path.join(metrics_dir, f"batch={rid}-{batch_id}")
        if os.path.isdir(final_dir):
            return
        flags = quality_flags(F.col(text_col))
        row = batch_df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(~flags["len_ok"], 1).otherwise(0)).alias("n_len_fail"),
            F.sum(F.when(~flags["punct_ok"], 1).otherwise(0)).alias(
                "n_punct_fail"
            ),
            F.sum(F.when(~flags["stopword_ok"], 1).otherwise(0)).alias(
                "n_stopword_fail"
            ),
            F.sum(
                F.when(
                    ~(flags["len_ok"] & flags["punct_ok"] & flags["stopword_ok"]),
                    1,
                ).otherwise(0)
            ).alias("n_any_fail"),
        ).collect()[0]
        spark = batch_df.sparkSession
        n = int(row["n_rows"])
        out = spark.createDataFrame(
            [
                (
                    batch_id,
                    n,
                    int(row["n_len_fail"] or 0),
                    int(row["n_punct_fail"] or 0),
                    int(row["n_stopword_fail"] or 0),
                    int(row["n_any_fail"] or 0),
                    (int(row["n_any_fail"] or 0) * 10000 // n) if n else 0,
                )
            ],
            "batch_id long, n_rows long, n_len_fail long, n_punct_fail long,"
            " n_stopword_fail long, n_any_fail long, fail_bp long",
        )
        tmp = f"{final_dir}.inprogress"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        out.coalesce(1).write.mode("overwrite").parquet(tmp)
        os.rename(tmp, final_dir)

    return (
        docs.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_seen_table(spark: SparkSession, seen_dir: str) -> int:
    """Maintenance companion to :func:`stream_exact_dedup_sink`: fold
    the accumulated per-batch digest dirs into ONE compacted dir (the
    small-files problem — a year of micro-batches is ~10^5 tiny
    parquet files whose listing dominates the anti-join's planning
    time).  Returns the number of batch dirs folded.

    Safe against a concurrent/crashed drain: only the batch dirs
    PRESENT AT LIST TIME are folded and removed — a batch published
    mid-compaction keeps its own dir and is simply not compacted this
    round; the compacted digests publish atomically (tmp + rename)
    into a dir named like a batch dir (``batch=compact-<n>``), so the
    sink's reader picks it up with no special casing.  Digests are
    distinct-ed during the fold, so repeated compaction is
    idempotent in content."""
    if not os.path.isdir(seen_dir):
        return 0
    dirs = sorted(
        d
        for d in os.listdir(seen_dir)
        if d.startswith("batch=") and not d.endswith(".inprogress")
    )
    if len(dirs) <= 1:
        return 0
    paths = [os.path.join(seen_dir, d) for d in dirs]
    merged = spark.read.parquet(*paths).distinct()
    gen = sum(1 for d in dirs if d.startswith("batch=compact-"))
    final_dir = os.path.join(seen_dir, f"batch=compact-{gen}-{len(dirs)}")
    tmp = f"{final_dir}.inprogress"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    merged.write.mode("overwrite").parquet(tmp)
    os.rename(tmp, final_dir)
    for p in paths:
        shutil.rmtree(p)
    return len(dirs)
