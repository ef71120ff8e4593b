"""Streaming incremental near-dedup: frozen-corpus (X173) and
absorbing / growing-store (X178) sinks.

X173 is the streaming twin of plans/wave13.dedup_incremental_pairs —
every batch dedups against the FROZEN corpus catalog.  X178 closes
the loop a production crawl actually runs: each accepted batch is
ABSORBED into the store (the X176 catalog-absorb operation driven
continuously), so batch N also dedups against batches 1..N-1.

The 100 TB operation X171 batches is actually CONTINUOUS: crawl
batches arrive forever and each must be deduped against the curated
corpus without recomputing the corpus side.  The corpus contributes
exactly two frozen artifacts, both built once offline:

* the **band catalog** — ``(doc, band, bh)`` LSH band rows of the
  corpus (``build_corpus_band_catalog``), the persisted projection of
  the signature sketch; per-batch reads are scan-only, the corpus is
  never re-shingled;
* the **corpus parquet** itself, touched per batch only through the
  candidate semi-join inside exact-Jaccard verification.

Per micro-batch: shingle/sign the BATCH only (it is the small side),
band it with the same frozen banding parameters, apply the combined
stop-bucket guard (corpus catalog counts + this batch's counts — the
same census the batch form computes, so a boilerplate bucket can't go
quadratic mid-stream), equi-join batch bands against catalog bands,
verify candidates at the 0.7 Jaccard rule, and publish the oriented
``(new_id, corpus_id, inter_size, union_size)`` pairs exactly-once
(tmp-dir + atomic rename per ``batch=<run>-<id>`` subdir, replay a
no-op — the cdc_sink/publish house pattern).

Precondition (guarded, ADVICE r13): new-crawl ``doc_id``s must be
DISJOINT from corpus ``doc_id``s — verification resolves both pair
sides against the corpus∪batch union by id equi-join, so a collision
would silently fan out candidate rows and corrupt inter/union counts.
Each micro-batch anti-checks its ids against the corpus and raises on
overlap (one broadcast semi-join count on the tiny batch side).

Semantics note (the watermark-class caveat, stated rather than
hidden): the stop-bucket census counts corpus + CURRENT batch; the
batch form counts corpus + the whole new set.  The two differ only
when a bucket crosses ``max_bucket`` because of NEW docs split across
batches — pinned equal on the test corpus, and conservative in the
right direction at scale (a bucket the full census would drop may
survive an early small batch, never the reverse... the early batch
emits at most the pairs the cap exists to bound).  The ABSORBING
form (X178) carries the same caveat, compounded: there the census is
store-so-far + current batch, and "store so far" itself depends on
the arrival split — whether a bucket crosses ``max_bucket`` at batch
N depends on how many of its members arrived in batches 1..N-1.
Still bounded in the same direction: an early batch can emit pairs a
late-census would have capped, never suppress pairs it would have
kept (ADVICE r14).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xero_api_etl_utilities_spark.operators.dedup import (
    band_rows,
    jaccard_verify,
    minhash_signatures,
)
from xero_api_etl_utilities_spark.streaming.cdc_sink import _query_run_id
from xero_api_etl_utilities_spark.streaming.publish import (
    _publish,
    _sweep_inprogress,
)

_BANDS = 16
_ROWS_PER_BAND = 4
_MAX_BUCKET = 500


def build_corpus_band_catalog(
    docs: DataFrame,
    out_dir: str,
    bands: int = _BANDS,
    rows_per_band: int = _ROWS_PER_BAND,
) -> None:
    """The one-off offline build of the frozen dedup catalog: MinHash
    signatures (1-gram, 64 permutations — the corpus_ops substrate
    parameters) projected through ``band_rows`` and persisted.  At
    100 TB this is the artifact the corpus store keeps next to the
    documents; every streaming batch reads it scan-only."""
    sigs = minhash_signatures(docs, "doc_id", "text", n=1, num_hashes=64)
    band_rows(sigs, bands, rows_per_band).write.mode("overwrite").parquet(
        out_dir
    )


def stream_incremental_dedup_sink(
    new_docs: DataFrame,
    corpus_catalog_dir: str,
    corpus_docs_path: str,
    pairs_dir: str,
    checkpoint_dir: str,
    bands: int = _BANDS,
    rows_per_band: int = _ROWS_PER_BAND,
    max_bucket: int = _MAX_BUCKET,
):
    """foreachBatch sink: verified (new × corpus) near-dup pairs per
    arriving batch, published exactly-once under ``pairs_dir``."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tag = f"{_query_run_id(checkpoint_dir)}-{batch_id}"
        out_b = os.path.join(pairs_dir, f"batch={tag}")
        if os.path.isdir(out_b):
            return  # replayed batch: already published wholesale
        _sweep_inprogress(pairs_dir)

        batch = batch_df.select("doc_id", "text").localCheckpoint()
        new_bands = band_rows(
            minhash_signatures(batch, "doc_id", "text", n=1, num_hashes=64),
            bands,
            rows_per_band,
        )
        catalog = spark.read.parquet(corpus_catalog_dir)
        # combined stop-bucket census: catalog counts (scan-only) +
        # this batch's counts — see the module docstring caveat
        corpus_counts = catalog.groupBy("band", "bh").agg(
            F.count(F.lit(1)).alias("n_corp")
        )
        batch_counts = new_bands.groupBy("band", "bh").agg(
            F.count(F.lit(1)).alias("n_new")
        )
        kept = (
            corpus_counts.join(batch_counts, ["band", "bh"])
            .filter(F.col("n_corp") + F.col("n_new") <= max_bucket)
            .select("band", "bh")
        )
        cands = (
            new_bands.join(kept, ["band", "bh"])
            .select("band", "bh", F.col("doc").alias("doc_a"))
            .join(
                catalog.select("band", "bh", F.col("doc").alias("doc_b")),
                ["band", "bh"],
            )
            .select("doc_a", "doc_b")
            .distinct()
        )
        corpus_docs = spark.read.parquet(corpus_docs_path).select(
            "doc_id", "text"
        )
        # Disjoint-id guard (ADVICE r13): jaccard_verify resolves both
        # pair sides against docs_all by equi-join, so a batch doc_id
        # colliding with a corpus doc_id would silently duplicate rows
        # and corrupt inter/union counts.  The batch is tiny and
        # already driver-local (localCheckpoint above), so the check
        # is one broadcast-semi-join count — fail loudly, not wrongly.
        n_collide = corpus_docs.join(
            F.broadcast(batch.select("doc_id")), "doc_id", "left_semi"
        ).count()
        if n_collide:
            raise ValueError(
                f"incremental dedup batch {batch_id}: {n_collide} doc_id(s)"
                " collide with the frozen corpus — new-crawl ids must be"
                " disjoint from corpus ids (re-key the crawl or bump its"
                " id base)"
            )
        docs_all = corpus_docs.unionByName(batch)
        verified = jaccard_verify(cands, docs_all, "doc_id", "text", n=1)
        out = verified.select(
            F.col("doc_a").alias("new_id"),
            F.col("doc_b").alias("corpus_id"),
            "inter_size",
            "union_size",
        )
        os.makedirs(pairs_dir, exist_ok=True)
        _publish(out, out_b)

    return (
        new_docs.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# X178: the ABSORBING sink — the store grows with every accepted batch
# ---------------------------------------------------------------------------


def build_dedup_store(docs: DataFrame, store_dir: str) -> None:
    """Seed the GROWING dedup store (X178): the corpus band catalog
    under ``<store>/catalog/part=corpus`` and the corpus documents
    under ``<store>/docs/part=corpus``.  Batches absorbed later land
    as sibling ``part=<run>-<id>`` partitions, so one partitioned
    parquet read always sees the whole store."""
    sigs = minhash_signatures(docs, "doc_id", "text", n=1, num_hashes=64)
    band_rows(sigs, _BANDS, _ROWS_PER_BAND).write.mode("overwrite").parquet(
        os.path.join(store_dir, "catalog", "part=corpus")
    )
    docs.select("doc_id", "text").write.mode("overwrite").parquet(
        os.path.join(store_dir, "docs", "part=corpus")
    )


def _part_parquet_files(d: str) -> list[str]:
    return [
        os.path.join(dp, f)
        for dp, _, files in os.walk(d)
        for f in files
        if f.endswith(".parquet")
    ]


def compact_store(
    spark,
    store_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    subs: tuple[str, ...] = ("catalog", "docs"),
) -> dict[str, int]:
    """Compact the absorbing store's accreted partitions (X178's
    housekeeping, VERDICT r14 item 2): every absorbed batch appended
    one ``part=<run>-<id>`` partition of ~32 kilobyte-scale files to
    ``<store>/catalog`` and ``<store>/docs``; at crawl cadence that is
    the small-files failure mode.  Each sub-store's live partitions
    are merged into ONE new ``part=compact-<k>`` partition sized from
    the on-disk bytes (``ceil(total / target_file_bytes)`` files, the
    compact_dir rule), while every prior partition directory survives
    as an EMPTY marker dir holding only an ``_ABSORBED`` flag file —
    the sink's exactly-once replay guard is ``os.path.isdir`` on the
    batch's partition dir, so markers keep replays no-ops, and Spark's
    file listing ignores both the empty dirs and the underscore file,
    so readers see exactly the compacted rows.

    Crash safety is ``sources/writer.compact_dir``'s proven swap: the
    new layout (compact parquet + marker dirs) is assembled in a
    sibling ``.compacting`` tmp, then swapped in via two renames with
    a ``.precompact`` fallback — readers see the old or the new
    layout, never duplicates, and a re-invocation repairs any
    interrupted run.  Re-compacting an already-compacted store merges
    the single compact partition into the next-indexed one (a no-op
    rewrite, same rows).

    Run it quiesced — between micro-batches, like any housekeeping on
    a streaming sink's artifact; an in-flight batch could otherwise
    publish a new partition into the pre-swap root and lose it.
    Returns {sub-store: parquet file count after compaction}."""
    import math
    import re
    import shutil

    out: dict[str, int] = {}
    for sub in subs:
        root = os.path.join(store_dir, sub)
        tmp, old = f"{root}.compacting", f"{root}.precompact"
        # recovery preamble (compact_dir semantics): discard a
        # half-built tmp; restore or discard a stranded precompact
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        if os.path.isdir(old):
            if not os.path.isdir(root):
                os.rename(old, root)
            else:
                shutil.rmtree(old)
        parts = sorted(
            p for p in os.listdir(root) if p.startswith("part=")
        )
        live = [
            p for p in parts if _part_parquet_files(os.path.join(root, p))
        ]
        if not live:
            out[sub] = 0
            continue
        total = sum(
            os.path.getsize(f)
            for p in live
            for f in _part_parquet_files(os.path.join(root, p))
        )
        n_files = max(1, math.ceil(total / target_file_bytes))
        k = 1 + max(
            (
                int(m.group(1))
                for p in parts
                if (m := re.fullmatch(r"part=compact-(\d+)", p))
            ),
            default=0,
        )
        spark.read.parquet(
            *(os.path.join(root, p) for p in live)
        ).repartition(n_files).write.parquet(
            os.path.join(tmp, f"part=compact-{k:06d}")
        )
        for p in parts:
            marker = os.path.join(tmp, p)
            os.makedirs(marker, exist_ok=True)
            open(os.path.join(marker, "_ABSORBED"), "w").close()
        os.rename(root, old)
        os.rename(tmp, root)
        shutil.rmtree(old)
        out[sub] = len(
            _part_parquet_files(
                os.path.join(root, f"part=compact-{k:06d}")
            )
        )
    return out


def stream_absorbing_dedup_sink(
    new_docs: DataFrame,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    bands: int = _BANDS,
    rows_per_band: int = _ROWS_PER_BAND,
    max_bucket: int = _MAX_BUCKET,
):
    """X178 — the streaming sink X173 stops short of: the store GROWS.

    X173 dedups every batch against the FROZEN corpus, so two near-dup
    crawl batches sail past each other.  Here each batch is deduped
    against the store AS OF its arrival (corpus + every previously
    absorbed batch) and then ABSORBED: its band rows and its documents
    are appended to the store as new ``part=<run>-<id>`` partitions —
    the X176 absorb operation driven continuously.  Batch N therefore
    emits (new × corpus) AND (new × earlier-arrival) verified pairs;
    within-batch pairs stay out of scope exactly as in the batch form
    (X171's mixed-pair contract).

    Exactly-once, per ARTIFACT: the pairs dir, the catalog partition
    and the docs partition are each an atomic tmp+rename publish keyed
    by ``<run>-<batch_id>`` with an isdir replay guard — a crash
    between publishes resumes by finishing only the missing artifacts
    (the absorb payloads are pure functions of the batch, so finishing
    them on replay is safe regardless of later store growth; pairs are
    only ever computed before this batch's own absorb, so replay
    cannot double-count).

    100 TB shape: per batch the store contributes one scan of its band
    catalog (never the text outside the candidate semi-join) and the
    absorb is a map-only append of ~16 rows/doc — the store is never
    rewritten, never re-shingled, and the accreted per-batch
    partitions are merged by :func:`compact_store` (quiesced
    housekeeping; replay guards survive as marker dirs)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tag = f"{_query_run_id(checkpoint_dir)}-{batch_id}"
        out_pairs = os.path.join(pairs_dir, f"batch={tag}")
        out_cat = os.path.join(store_dir, "catalog", f"part={tag}")
        out_docs = os.path.join(store_dir, "docs", f"part={tag}")
        if all(os.path.isdir(d) for d in (out_pairs, out_cat, out_docs)):
            return  # replayed batch: fully published
        _sweep_inprogress(pairs_dir)
        _sweep_inprogress(os.path.join(store_dir, "catalog"))
        _sweep_inprogress(os.path.join(store_dir, "docs"))

        batch = batch_df.select("doc_id", "text").localCheckpoint()
        store_docs = spark.read.parquet(os.path.join(store_dir, "docs")).select(
            "doc_id", "text"
        )
        # disjoint-id guard, now against the WHOLE store (corpus +
        # absorbed arrivals): same silent-corruption mode as X173's
        n_collide = store_docs.join(
            F.broadcast(batch.select("doc_id")), "doc_id", "left_semi"
        ).count()
        if n_collide:
            raise ValueError(
                f"absorbing dedup batch {batch_id}: {n_collide} doc_id(s)"
                " collide with the store — ids must be unique across the"
                " corpus and every absorbed batch"
            )

        new_bands = band_rows(
            minhash_signatures(batch, "doc_id", "text", n=1, num_hashes=64),
            bands,
            rows_per_band,
        ).localCheckpoint()

        if not os.path.isdir(out_pairs):
            catalog = spark.read.parquet(
                os.path.join(store_dir, "catalog")
            ).select("doc", "band", "bh")
            store_counts = catalog.groupBy("band", "bh").agg(
                F.count(F.lit(1)).alias("n_store")
            )
            batch_counts = new_bands.groupBy("band", "bh").agg(
                F.count(F.lit(1)).alias("n_new")
            )
            kept = (
                store_counts.join(batch_counts, ["band", "bh"])
                .filter(F.col("n_store") + F.col("n_new") <= max_bucket)
                .select("band", "bh")
            )
            cands = (
                new_bands.join(kept, ["band", "bh"])
                .select("band", "bh", F.col("doc").alias("doc_a"))
                .join(
                    catalog.select("band", "bh", F.col("doc").alias("doc_b")),
                    ["band", "bh"],
                )
                .select("doc_a", "doc_b")
                .distinct()
            )
            docs_all = store_docs.unionByName(batch)
            verified = jaccard_verify(cands, docs_all, "doc_id", "text", n=1)
            out = verified.select(
                F.col("doc_a").alias("new_id"),
                F.col("doc_b").alias("store_id"),
                "inter_size",
                "union_size",
            )
            os.makedirs(pairs_dir, exist_ok=True)
            _publish(out, out_pairs)
        # absorb AFTER the pairs: the batch must never dedup against
        # itself through the store
        if not os.path.isdir(out_cat):
            _publish(new_bands, out_cat)
        if not os.path.isdir(out_docs):
            _publish(batch, out_docs)

    return (
        new_docs.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
