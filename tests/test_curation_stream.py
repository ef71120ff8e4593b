"""Streaming curation capstone (streaming/curation.py): end-to-end
wiring, batch parity vs pipeline_curation_report, checkpoint restart,
and the semantic-guard leg."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

# passes the quality gate: > 50 chars, low punctuation, stopword-rich
_GOOD = (
    "the quick brown fox jumps over the lazy dog and then the dog "
    "sleeps on a mat in the sun for a while"
)


def _dirs(tmp_path):
    return {
        "out_dir": str(tmp_path / "out"),
        "seen_dir": str(tmp_path / "seen"),
        "quarantine_dir": str(tmp_path / "quar"),
        "metrics_dir": str(tmp_path / "metrics"),
        "checkpoint_root": str(tmp_path / "ckpt"),
    }


def test_curation_batch_parity_and_guard_containment(spark, sf_dir, tmp_path):
    """Whole corpus in one drop: stages raw → quality → exact dedup
    must equal pipeline_curation_report rows 1–3 exactly (identical
    gate expressions, identical min-id-per-digest rule); and with the
    reference set to the kept partner of every batch-verified pair,
    the stream quarantine must CONTAIN the batch near-dup-pruned set
    (verified pairs share a band by construction)."""
    from xero_api_etl_utilities_spark.operators import dedup as dd
    from xero_api_etl_utilities_spark.plans.extensions import (
        _pipeline_stages,
        pipeline_curation_report,
    )
    from xero_api_etl_utilities_spark.streaming.curation import (
        run_curation_drain,
        stream_curation_pipeline,
    )

    funnel = {
        r["stage"]: r["n_docs"]
        for r in pipeline_curation_report(spark, sf_dir).collect()
    }
    surv, near_dups = _pipeline_stages(spark, sf_dir)

    drop = str(tmp_path / "drop")
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).write.parquet(
        drop
    )
    docs = spark.readStream.schema(DOC_SCHEMA).parquet(drop)

    # leg 1: EMPTY reference — no band suspects, so the accepted set
    # is exactly the batch quality+exact-dedup survivor set
    empty_ref = spark.createDataFrame([], DOC_SCHEMA)
    d1 = _dirs(tmp_path / "parity")
    run_curation_drain(stream_curation_pipeline(docs, empty_ref, **d1))

    accepted = spark.read.parquet(d1["out_dir"])
    assert accepted.count() == funnel["exact_dedup"]
    got_ids = {r["doc_id"] for r in accepted.select("doc_id").collect()}
    want_ids = {r["doc_id"] for r in surv.select("doc_id").collect()}
    assert got_ids == want_ids
    m = (
        spark.read.parquet(d1["metrics_dir"])
        .agg(F.sum("n_rows").alias("n"), F.sum("n_any_fail").alias("f"))
        .collect()[0]
    )
    assert int(m["n"]) == funnel["raw"]
    assert int(m["n"]) - int(m["f"]) == funnel["quality_gate"]
    assert not os.path.isdir(d1["quarantine_dir"]) or (
        spark.read.parquet(d1["quarantine_dir"]).count() == 0
    )

    # leg 2: reference = the kept (doc_a) partner of every verified
    # pair.  Since r10 the guard VERIFIES band hits with the batch
    # 7/10 exact-Jaccard rule, so the quarantine must EQUAL the
    # batch-computed verified-match set against that reference (not
    # merely contain the pruned docs): every survivor that verifies
    # against some reference member — including reference members
    # themselves, which self-match at J=1 — and nothing else.
    sigs = dd.minhash_signatures(surv, "doc_id", "text", n=1, num_hashes=64)
    cands = dd.minhash_lsh_candidates(
        sigs, bands=16, rows_per_band=4, max_bucket=500
    )
    pairs = dd.jaccard_verify(cands, surv, "doc_id", "text", n=1)
    ref_ids = {r["doc_a"] for r in pairs.select("doc_a").distinct().collect()}
    ref = surv.join(
        pairs.select(F.col("doc_a").alias("doc_id")).distinct(), "doc_id"
    )
    assert ref.count() > 0  # the fixture corpus has verified near-dups
    d2 = _dirs(tmp_path / "guard")
    docs2 = spark.readStream.schema(DOC_SCHEMA).parquet(drop)
    run_curation_drain(stream_curation_pipeline(docs2, ref, **d2))

    quarantined = {
        r["doc_id"]
        for r in spark.read.parquet(d2["quarantine_dir"])
        .select("doc_id")
        .collect()
    }
    pruned = {r["doc_id"] for r in near_dups.collect()}
    assert pruned <= quarantined
    # batch replica of the verified-match set: survivors with a
    # verified pair whose partner is a reference member, plus the
    # reference members present in the stream (self-match)
    pair_rows = pairs.select("doc_a", "doc_b").collect()
    expected = set(ref_ids)
    for r in pair_rows:
        if r["doc_a"] in ref_ids:
            expected.add(r["doc_b"])
        if r["doc_b"] in ref_ids:
            expected.add(r["doc_a"])
    assert quarantined == expected
    # and accepted + quarantined still partitions the gated set —
    # unverified band false-positives now flow to the corpus
    acc2 = {
        r["doc_id"]
        for r in spark.read.parquet(d2["out_dir"]).select("doc_id").collect()
    }
    assert not (acc2 & quarantined)
    assert len(acc2) + len(quarantined) == funnel["exact_dedup"]


def test_curation_checkpoint_restart(spark, tmp_path):
    """Drain, drop more files, drain again on the SAME checkpoints:
    the cross-batch digest state survives (a later exact duplicate is
    dropped), metrics append one row per batch, and a full fresh-
    checkpoint replay adds nothing to the accepted corpus."""
    from xero_api_etl_utilities_spark.streaming.curation import (
        run_curation_drain,
        stream_curation_pipeline,
    )

    drop = str(tmp_path / "drop")
    empty_ref = spark.createDataFrame([], DOC_SCHEMA)
    d = _dirs(tmp_path)

    def rows(*items):
        return spark.createDataFrame(
            [
                (i, t, "en", "s", len(t))
                for i, t in items
            ],
            DOC_SCHEMA,
        )

    def drain(ckroot=None):
        docs = spark.readStream.schema(DOC_SCHEMA).parquet(drop)
        cfg = dict(d)
        if ckroot is not None:
            cfg["checkpoint_root"] = ckroot
        run_curation_drain(stream_curation_pipeline(docs, empty_ref, **cfg))

    rows((1, _GOOD + " one"), (2, _GOOD + " two")).write.mode(
        "append"
    ).parquet(drop)
    drain()
    acc = spark.read.parquet(d["out_dir"])
    assert {r["doc_id"] for r in acc.collect()} == {1, 2}

    # restart with new files: 3 duplicates doc 1's text (cross-run
    # digest state must drop it), 4 is new, 5 fails the quality gate
    rows((3, _GOOD + " one"), (4, _GOOD + " four"), (5, "too short")).write.mode(
        "append"
    ).parquet(drop)
    drain()
    acc = spark.read.parquet(d["out_dir"])
    assert {r["doc_id"] for r in acc.collect()} == {1, 2, 4}

    mrows = spark.read.parquet(d["metrics_dir"]).collect()
    assert sum(int(r["n_rows"]) for r in mrows) == 5
    assert sum(int(r["n_any_fail"]) for r in mrows) == 1

    # disaster recovery: fresh checkpoints replay EVERYTHING against
    # the accumulated seen state — accepted set must not change
    drain(ckroot=str(tmp_path / "ckpt2"))
    acc = spark.read.parquet(d["out_dir"]).collect()
    assert {r["doc_id"] for r in acc} == {1, 2, 4}
    assert len(acc) == 3  # no physical duplicates either


def test_curation_semantic_guard_leg(spark, tmp_path):
    """With reference embeddings + centroids, a rephrasing whose
    vector cosine clears tau lands in quarantine with reason
    'semantic'; an orthogonal vector flows through to the accepted
    corpus."""
    from xero_api_etl_utilities_spark.streaming.curation import (
        run_curation_drain,
        stream_curation_pipeline,
    )

    schema = T.StructType(
        list(DOC_SCHEMA.fields)
        + [T.StructField("embedding", T.ArrayType(T.DoubleType()))]
    )
    drop = str(tmp_path / "drop")
    spark.createDataFrame(
        [
            (1, _GOOD + " alpha", "en", "s", 99, [0.99, 0.1]),
            (2, _GOOD + " beta", "en", "s", 99, [0.0, 1.0]),
        ],
        schema,
    ).write.parquet(drop)

    ref_vecs = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    empty_ref = spark.createDataFrame([], DOC_SCHEMA)
    d = _dirs(tmp_path)
    docs = spark.readStream.schema(schema).parquet(drop)
    run_curation_drain(
        stream_curation_pipeline(
            docs,
            empty_ref,
            reference_vecs=ref_vecs,
            centroids=[[1.0, 0.0], [0.0, 1.0]],
            tau=0.85,
            **d,
        )
    )
    quar = spark.read.parquet(d["quarantine_dir"]).collect()
    assert [(r["doc_id"], r["reason"]) for r in quar] == [(1, "semantic")]
    acc = spark.read.parquet(d["out_dir"]).collect()
    assert {r["doc_id"] for r in acc} == {2}
