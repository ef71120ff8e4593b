"""Streaming curation capstone: the full ingest-time cleaning pipeline.

Composes the already-tested streaming pieces into ONE documented
pipeline — the stream-side mirror of the batch north-star composite
(``plans/extensions.pipeline_corpus_clean`` + its X128 funnel report):

    raw feed ──► metrics sink            (observability, pre-gate)
        │
        ▼
    quality gate   (stateless — the batch ``quality_flags`` columns)
        ▼
    band guard     (MinHash-LSH vs a static reference, stateless)
        ▼
    semantic guard (SemDeDup vs reference embeddings, optional,
        ▼           stateless)
    exact-dedup sink (unbounded cross-batch digest state on storage)
        │
        ├──► accepted corpus  (out_dir, per-batch atomic publish)
        └──► seen digests     (seen_dir)

    guard suspects ──► quarantine sink (append, with a reason column)

State inventory (the 100 TB argument): the gate and both guards are
scan projections — zero streaming state at any feed rate; the only
state anywhere is the exact-dedup sink's digest side table (32
bytes per distinct accepted document, on storage not in the state
store) plus the file-source/commit logs.  Crash/replay safety is the
sinks' per-batch atomic-publish contract (tested individually in
tests/test_streaming_and_io.py and end-to-end here via the
checkpoint-restart test in tests/test_curation_stream.py).

Batch parity (pinned by test): with the whole corpus dropped as one
batch, stages raw → quality gate → exact dedup produce EXACTLY the
counts of ``pipeline_curation_report`` rows 1–3 (identical column
expressions, identical min-id-per-digest rule).  The near-dup stage
verifies since r10 (VERDICT r9 item 6): band suspects are confirmed
with the batch verifier's EXACT 7/10 Jaccard rule in-row before
quarantining (``verify_suspects=True``, the default), so against a
fixed reference the stream quarantine EQUALS the batch-computed
verified-match set — the equality the parity test asserts (band
false positives flow on to the accepted corpus instead of
over-quarantining).  ``verify_suspects=False`` restores the r9
superset-containment behavior (cheaper broadcast index: keys only,
no token sets — the right trade when the reference is corpus-sized
and quarantine review is batch anyway).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_curation_pipeline(
    docs: DataFrame,
    reference_docs: DataFrame,
    *,
    out_dir: str,
    seen_dir: str,
    quarantine_dir: str,
    metrics_dir: str,
    checkpoint_root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    reference_vecs: DataFrame | None = None,
    centroids: list[list[float]] | None = None,
    vec_col: str = "embedding",
    tau: float = 0.85,
    verify_suspects: bool = True,
) -> dict:
    """Wire the curation pipeline over a streaming document frame and
    start its queries (all ``availableNow`` — drain-and-stop; rerun
    on a schedule or swap the trigger for continuous ingest).

    Returns ``{"metrics": q, "accepted": q, "quarantine": q}`` —
    await all three.  ``reference_docs`` feeds the band guard;
    ``reference_vecs`` + ``centroids`` (batch-trained, inlined)
    enable the semantic guard, and require ``docs`` to carry
    ``vec_col``.  Each checkpoint lives under ``checkpoint_root`` so
    a restart resumes every leg consistently."""
    from xero_api_etl_utilities_spark.operators import textstats as tx
    from xero_api_etl_utilities_spark.streaming.cdc_sink import (
        stream_exact_dedup_sink,
        stream_quality_metrics_sink,
    )
    from xero_api_etl_utilities_spark.streaming.filestream import (
        stream_neardup_guard,
        stream_semdedup_guard,
    )

    if (reference_vecs is None) != (centroids is None):
        raise ValueError(
            "semantic guard needs BOTH reference_vecs and centroids"
        )

    ck = lambda leg: os.path.join(checkpoint_root, leg)  # noqa: E731

    # observability first: the metrics sink sees the RAW feed, so a
    # bad crawl shows up even when the gate eats all of it
    metrics_q = stream_quality_metrics_sink(
        docs, metrics_dir, ck("metrics"), text_col=text_col
    )

    # quality gate — the batch pipeline's exact column expressions
    flags = tx.quality_flags(F.col(text_col))
    gated = docs.filter(
        flags["len_ok"] & flags["punct_ok"] & flags["stopword_ok"]
    )

    # band guard (stateless): clean side flows on, suspects quarantine;
    # verify_suspects confirms each band hit with the batch 7/10 exact
    # Jaccard rule in-row, so quarantine = the batch prune semantics
    band_clean = stream_neardup_guard(
        gated, reference_docs, id_col=id_col, text_col=text_col,
        emit="clean", verify_jaccard=verify_suspects,
    )
    band_susp = stream_neardup_guard(
        gated, reference_docs, id_col=id_col, text_col=text_col,
        emit="suspects", verify_jaccard=verify_suspects,
    ).withColumn("reason", F.lit("band"))

    accepted_src = band_clean
    suspects = band_susp
    if reference_vecs is not None:
        sem_kwargs = dict(
            id_col=id_col, vec_col=vec_col, tau=tau
        )
        accepted_src = stream_semdedup_guard(
            band_clean, reference_vecs, centroids, emit="clean", **sem_kwargs
        )
        sem_susp = stream_semdedup_guard(
            band_clean, reference_vecs, centroids, emit="suspects",
            **sem_kwargs,
        ).withColumn("reason", F.lit("semantic"))
        suspects = band_susp.unionByName(sem_susp)

    # quarantine leg: plain append file sink — idempotence comes from
    # the streaming file-sink commit log; the reason column tells the
    # reviewer which guard fired
    quarantine_q = (
        suspects.writeStream.format("parquet")
        .option("checkpointLocation", ck("quarantine"))
        .option("path", quarantine_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )

    # accepted leg: the unbounded cross-batch exact-dedup sink
    accepted_q = stream_exact_dedup_sink(
        accepted_src,
        out_dir,
        seen_dir,
        ck("accept"),
        id_col=id_col,
        text_col=text_col,
    )

    return {
        "metrics": metrics_q,
        "accepted": accepted_q,
        "quarantine": quarantine_q,
    }


def run_curation_drain(queries: dict) -> None:
    """Await every leg of a :func:`stream_curation_pipeline` drain."""
    for q in queries.values():
        q.awaitTermination()
