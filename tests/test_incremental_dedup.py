"""Streaming incremental near-dedup (streaming/incremental_dedup.py,
X173): per-batch verified (new × corpus) pairs against the frozen
corpus band catalog must reproduce the batch form (X171) exactly, be
exactly-once across checkpoint restarts, and never touch corpus text
outside the candidate semi-join."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from xero_api_etl_utilities_spark.streaming.incremental_dedup import (
    build_corpus_band_catalog,
    stream_incremental_dedup_sink,
)

SF = "/root/testdata/sf0.001"
_DOCS_SCHEMA = "doc_id bigint, text string"


def _drain(spark, drop, catalog_dir, corpus_path, pairs_dir, ckpt):
    stream = (
        spark.readStream.schema(_DOCS_SCHEMA).parquet(drop)
    )
    q = stream_incremental_dedup_sink(
        stream, catalog_dir, corpus_path, pairs_dir, ckpt
    )
    q.awaitTermination()


def _setup(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 5 != 4)
    new = docs.filter(F.col("doc_id") % 5 == 4)
    corpus_path = str(tmp_path / "corpus")
    corpus.write.parquet(corpus_path)
    catalog_dir = str(tmp_path / "catalog")
    build_corpus_band_catalog(
        spark.read.parquet(corpus_path), catalog_dir
    )
    return corpus, new, corpus_path, catalog_dir


def _batch_expected(spark):
    from xero_api_etl_utilities_spark.plans.wave13 import (
        dedup_incremental_pairs,
    )

    return {
        (r["new_id"], r["corpus_id"], r["inter_size"], r["union_size"])
        for r in dedup_incremental_pairs(spark, SF).collect()
    }


def _accumulated(spark, pairs_dir):
    return {
        (r["new_id"], r["corpus_id"], r["inter_size"], r["union_size"])
        for r in spark.read.parquet(pairs_dir).collect()
    }


def test_single_batch_parity_with_batch_form(spark, tmp_path):
    """All new docs in ONE batch: identical semantics to X171 — same
    banding, same combined stop-bucket census, same verify rule."""
    _, new, corpus_path, catalog_dir = _setup(spark, tmp_path)
    drop = str(tmp_path / "drop")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    new.write.mode("append").parquet(drop)
    _drain(spark, drop, catalog_dir, corpus_path, pairs_dir, ckpt)
    expected = _batch_expected(spark)
    assert len(expected) > 0
    assert _accumulated(spark, pairs_dir) == expected


def test_two_batches_restart_and_replay(spark, tmp_path):
    """Two drops drained by RESTARTED availableNow queries on one
    checkpoint: accumulated pairs equal the batch form (the bucket cap
    never binds on this corpus, so the batch-local census matches the
    global one — the module docstring's stated caveat), each pair
    lands in the batch its new doc arrived in, and a replay with no
    new files publishes nothing."""
    _, new, corpus_path, catalog_dir = _setup(spark, tmp_path)
    drop = str(tmp_path / "drop")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    first = new.filter(F.col("doc_id") % 2 == 0)
    second = new.filter(F.col("doc_id") % 2 == 1)
    first.write.mode("append").parquet(drop)
    _drain(spark, drop, catalog_dir, corpus_path, pairs_dir, ckpt)
    got_first = _accumulated(spark, pairs_dir)
    first_ids = {r["doc_id"] for r in first.collect()}
    assert got_first and all(p[0] in first_ids for p in got_first)

    second.write.mode("append").parquet(drop)
    _drain(spark, drop, catalog_dir, corpus_path, pairs_dir, ckpt)
    assert _accumulated(spark, pairs_dir) == _batch_expected(spark)

    # replay: no new files, same checkpoint -> no new batch dirs
    n_dirs = len(os.listdir(pairs_dir))
    _drain(spark, drop, catalog_dir, corpus_path, pairs_dir, ckpt)
    assert len(os.listdir(pairs_dir)) == n_dirs


def test_colliding_doc_id_fails_loudly(spark, tmp_path):
    """A new-crawl doc_id that already exists in the frozen corpus
    violates the module's disjoint-id precondition (ADVICE r13) —
    verification would silently duplicate the id's rows in the
    equi-joins and corrupt inter/union counts.  The guard must fail
    the batch instead, and exactly-once publish means the failed
    batch leaves no pairs behind."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    corpus, new, corpus_path, catalog_dir = _setup(spark, tmp_path)
    drop = str(tmp_path / "drop")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    # poison the drop with one corpus doc alongside the real new docs
    new.unionByName(corpus.limit(1)).write.mode("append").parquet(drop)
    with pytest.raises(StreamingQueryException, match="collide"):
        _drain(spark, drop, catalog_dir, corpus_path, pairs_dir, ckpt)
    assert not os.path.isdir(pairs_dir) or not [
        d for d in os.listdir(pairs_dir) if d.startswith("batch=")
    ]
