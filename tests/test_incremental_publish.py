"""Incremental pack publish (streaming/publish.py — VERDICT r10 item
7): pack ids must continue across micro-batches and checkpoint
restarts with no overlap/gap, the artifact must equal the one-shot
batch packing when ingest is layout-ordered, and replay must be a
no-op."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from xero_api_etl_utilities_spark.operators.packing import pack_fixed_budget
from xero_api_etl_utilities_spark.streaming.publish import stream_pack_publish_sink

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("kept_tokens", T.LongType()),
        T.StructField("kept_text", T.StringType()),
    ]
)

_BUDGET = 100


def _rows(lo: int, hi: int) -> list[tuple]:
    out = []
    for i in range(lo, hi):
        src = "web" if i % 2 == 0 else "books"
        # varied token masses so packs straddle batch boundaries
        out.append((i, src, 17 + (i * 13) % 41, f"text-{i}"))
    return out


def _dirs(tmp_path):
    return (
        str(tmp_path / "out"),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "drop"),
    )


def _drain(spark, drop, out_dir, state_dir, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(drop)
    q = stream_pack_publish_sink(
        stream, out_dir, state_dir, ckpt, budget=_BUDGET
    )
    q.awaitTermination()


def test_restart_continuity_and_batch_parity(spark, tmp_path):
    out_dir, state_dir, ckpt, drop = _dirs(tmp_path)

    # drop 1 (ids 0..59), drain, stop; drop 2 (ids 60..149), restart
    spark.createDataFrame(_rows(0, 60), SCHEMA).write.mode("append").parquet(drop)
    _drain(spark, drop, out_dir, state_dir, ckpt)
    spark.createDataFrame(_rows(60, 150), SCHEMA).write.mode("append").parquet(drop)
    _drain(spark, drop, out_dir, state_dir, ckpt)

    got = spark.read.parquet(out_dir)
    batch_dirs = {r["batch"] for r in got.select("batch").distinct().collect()}
    assert len(batch_dirs) == 2  # one per drop

    # the one-shot batch layout over the same total input
    full = spark.createDataFrame(_rows(0, 150), SCHEMA)
    want = {
        (r["doc_id"]): (r["pack_id"], r["prev_tokens"])
        for r in pack_fixed_budget(
            full, "doc_id", "kept_tokens", _BUDGET, shard_col="source"
        ).collect()
    }
    got_map = {
        r["doc_id"]: (r["pack_id"], r["prev_tokens"]) for r in got.collect()
    }
    assert got_map == want  # pack ids AND running totals identical

    # no overlap/gap: per shard, pack ids are contiguous from 0, and
    # every (shard, pack) has one owner batch unless it straddles
    per_shard = (
        got.groupBy("source")
        .agg(
            F.min("pack_id").alias("lo"),
            F.max("pack_id").alias("hi"),
            F.countDistinct("pack_id").alias("n"),
        )
        .collect()
    )
    for r in per_shard:
        assert r["lo"] == 0
        assert r["n"] == r["hi"] + 1, f"gap in {r['source']} pack ids"

    # at least one pack straddles the two batch dirs (the continuity
    # case worth having: same pack id, rows in both dirs)
    straddle = (
        got.groupBy("source", "pack_id")
        .agg(F.countDistinct("batch").alias("nb"))
        .filter(F.col("nb") > 1)
        .count()
    )
    assert straddle >= 1


def test_replay_is_noop(spark, tmp_path):
    out_dir, state_dir, ckpt, drop = _dirs(tmp_path)
    spark.createDataFrame(_rows(0, 40), SCHEMA).write.mode("append").parquet(drop)
    _drain(spark, drop, out_dir, state_dir, ckpt)
    n1 = spark.read.parquet(out_dir).count()
    # re-drain with the same checkpoint and no new files: no new rows
    _drain(spark, drop, out_dir, state_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == n1 == 40


def test_crash_between_publishes_recovers(spark, tmp_path):
    """Crash simulation: the artifact dir published but the state dir
    lost (the gap between the two renames) — replaying the SAME
    (run_id, batch_id) must reproduce the identical state rows without
    duplicating artifact rows."""
    import shutil

    from xero_api_etl_utilities_spark.streaming.publish import apply_pack_batch

    out_dir, state_dir, ckpt, drop = _dirs(tmp_path)
    spark.createDataFrame(_rows(0, 40), SCHEMA).write.mode("append").parquet(drop)
    _drain(spark, drop, out_dir, state_dir, ckpt)
    state_batches = [d for d in os.listdir(state_dir) if d.startswith("batch=")]
    assert len(state_batches) == 1
    before = {
        (r["source"], r["added_tokens"])
        for r in spark.read.parquet(state_dir).drop("batch").collect()
    }
    shutil.rmtree(os.path.join(state_dir, state_batches[0]))

    # drive the foreachBatch body directly with the original
    # checkpoint (same run_id) and the committed batch id — exactly
    # what a post-crash replay of that batch does
    apply_pack_batch(
        spark.createDataFrame(_rows(0, 40), SCHEMA),
        0,
        out_dir=out_dir,
        state_dir=state_dir,
        checkpoint_dir=ckpt,
        budget=_BUDGET,
    )

    after = {
        (r["source"], r["added_tokens"])
        for r in spark.read.parquet(state_dir).drop("batch").collect()
    }
    assert after == before  # state reproduced exactly
    got = spark.read.parquet(out_dir)
    assert got.count() == 40  # artifact not duplicated (dir skipped)
    assert len([d for d in os.listdir(out_dir) if d.startswith("batch=")]) == 1


def test_orphaned_inprogress_in_out_dir_is_swept(spark, tmp_path):
    """A crash between tmp-write and rename in a PRIOR run (whose
    checkpoint is gone, so its tag never replays) leaves a
    ``batch=<old>.inprogress`` dir in out_dir; the next batch apply
    must sweep it — parquet partition discovery would otherwise pick
    it up as a partition value over half-written files (ADVICE r11)."""
    out_dir, state_dir, ckpt, drop = _dirs(tmp_path)
    orphan = os.path.join(out_dir, "batch=deadrun-0.inprogress")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-00000.parquet"), "wb") as f:
        f.write(b"half-written junk")

    spark.createDataFrame(_rows(0, 40), SCHEMA).write.mode("append").parquet(drop)
    _drain(spark, drop, out_dir, state_dir, ckpt)

    assert not os.path.isdir(orphan)
    assert spark.read.parquet(out_dir).count() == 40
