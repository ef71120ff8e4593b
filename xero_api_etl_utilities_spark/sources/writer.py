"""Sinks: partitioned/bucketed fact layout + JSON audit writer.

The storage half of the 100 TB design: facts written
date-partitioned (dynamic partition pruning reaches the §2 scans) and
optionally bucketed by join key (elides the shuffle in orderkey-shaped
joins like the flagship's). The JSON audit writer is the S11 log sink
with proper write modes instead of the reference's versioned-filename
probing (S12, src/helpers.ts:55-66).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
) -> None:
    """Date/key-partitioned parquet: partition pruning makes the §2.1
    filtered scans touch only matching directories."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int = 64,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggregations on the bucket key
    skip their shuffle (the orderkey co-location the flagship plan
    notes). Requires saveAsTable (bucketing metadata lives in the
    catalog, not the files)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def write_json_audit(df: DataFrame, path: str, mode: str = "errorifexists") -> None:
    """S11: JSON audit sink; `errorifexists` replaces the reference's
    a/b/c suffix collision probing with an atomic write-mode contract."""
    df.write.mode(mode).json(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_versioned_run(
    df: DataFrame,
    base_path: str,
    fmt: str = "json",
    max_versions: int = 100,
) -> str:
    """S12 parity (src/helpers.ts:55-66): the reference probes
    ``log.json``, ``log-a.json``, ``log-b.json``… until a free name
    appears — a read-then-write race under concurrency. The
    Spark-shaped equivalent versions RUN DIRECTORIES
    (``base``, ``base_v2``, …) and lets ``errorifexists`` + the task
    commit protocol arbitrate collisions atomically: two concurrent
    writers can both probe, but only one commit wins a given version;
    the loser just advances to the next. Returns the path written."""
    from pyspark.errors import AnalysisException

    last_exc: Exception | None = None
    for v in range(1, max_versions + 1):
        path = base_path if v == 1 else f"{base_path}_v{v}"
        try:
            df.write.mode("errorifexists").format(fmt).save(path)
            return path
        except AnalysisException as exc:
            # Only a genuine path collision advances the probe; any other
            # analysis failure (bad schema, unsupported type for the
            # format) would otherwise burn all max_versions probes and
            # surface as a misleading "no free version" error.
            err_class = getattr(exc, "getErrorClass", lambda: None)()
            if err_class != "PATH_ALREADY_EXISTS" and "already exists" not in str(exc):
                raise
            last_exc = exc
    raise RuntimeError(
        f"write_versioned_run: no free version under {base_path!r} after"
        f" {max_versions} probes"
    ) from last_exc


def compact_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files and atomically swap it in.
    Returns the new file count.

    The 100 TB housekeeping op: streaming sinks and per-batch MERGE
    rewrites accrete kilobyte-scale files whose per-file open/footer
    cost eventually dominates scans (and whose row groups are too
    small for predicate skipping to bite). Repartition count comes
    from the CURRENT on-disk bytes, so compaction is idempotent —
    re-running on a compacted dir is a no-op rewrite to the same
    count. coalesce() is deliberately NOT used: it would also narrow
    the parallelism of the read stage to the target count; a real
    shuffle keeps the read wide and only the write narrow.

    Atomic publish mirrors streaming/cdc_sink.py: write to a sibling
    tmp dir, rename away the old dir, rename the new one in — readers
    see the old or new layout, never a partial MIX of files. The swap
    is two renames, so there IS a sub-millisecond window where the
    directory does not exist: a concurrent reader's listing can get
    ENOENT and must treat it as transient (retry-on-missing is the
    reader contract; each individual state is consistent). A crash
    between the renames strands the data in ``.precompact`` — the
    recovery preamble below restores it on the next invocation, so
    compact_dir is also the repair tool for its own interrupted runs.
    """
    import math
    import os
    import shutil

    tmp, old = f"{path}.compacting", f"{path}.precompact"
    # startup recovery for a previous interrupted swap:
    #  - .compacting left over → incomplete write, discard it
    #  - .precompact present with path missing → crashed between the
    #    two renames: restore the original directory
    #  - .precompact present alongside path → crashed after publish,
    #    before cleanup: the old copy is dead weight
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    if os.path.isdir(old):
        if not os.path.isdir(path):
            os.rename(old, path)
        else:
            shutil.rmtree(old)

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(path).repartition(n_files).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files


def write_zorder_table(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` Z-ORDER clustered on two integer dimension columns
    (functions/zorder.py) — the OPTIMIZE ZORDER layout: rows land in
    files by Morton-key range, so every file covers a narrow rectangle
    in BOTH dimensions and engine min/max skipping prunes on either
    predicate column (a plain sort gives pruning on the leading column
    only). Lowering: repartitionByRange(z) assigns contiguous z-ranges
    to files (one skew-aware range exchange — Spark samples the key),
    sortWithinPartitions(z) makes each file internally ordered for
    row-group stats. Dimensions are masked to 16 bits; callers bucket
    wider domains first. The locality guarantee is pinned by
    tests/test_bloom_zorder.py against the per-file min/max spans the
    skipping engine would read."""
    from pyspark.sql import functions as F

    from xero_api_etl_utilities_spark.functions.zorder import z_interleave16

    z = z_interleave16(
        F.col(x_col).bitwiseAND(F.lit(65535)),
        F.col(y_col).bitwiseAND(F.lit(65535)),
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
