"""Round-12 wave (X164–X166): the ANN index-lifecycle queries.

The r11 wave closed the matryoshka EXACTNESS instrument (X162:
brute-force truncation recall, bounded by design); this wave adds the
pieces a production vector platform runs continuously:

- X164 ``similarity_truncation_recall_ivf`` — truncation recall on the
  SCALE PATH: an IVF index per prefix width, searched under truncated
  vectors, scored against the full-dimension exact truth.  This is the
  sizing table matryoshka serving actually consults (Kusupati et al.
  2022): it prices truncation AND the approximate index together, so
  the d'=64 row doubles as the pure-IVF recall baseline.
- X165 ``similarity_ivf_drift_census`` — the batch twin of the
  streaming maintenance sink's drift trigger
  (``streaming/ann_maintenance.py``): newly-arrived vectors assigned
  under the FROZEN corpus-trained centroids, per-cell load factors for
  the indexed corpus vs the arrivals, and the hot-cell flag that says
  "retrain".
- X166 ``similarity_topk_ivfpq_residual`` — IVF-PQ with RESIDUAL
  encoding (the FAISS IVFADC recipe, Jégou et al. 2011): codes model
  v − c(cell) instead of v, spending the same 4 bytes/vector on the
  much tighter residual distribution.  Same ADC search shape as
  similarity_topk_ivfpq — per-query distance tables are simply built
  per probed cell from q − c(cell).

Reference provenance: the reference ETL (src/queries.ts) has no vector
tier; these extend the training-data-pipeline surface the brief
requires.  Oracles re-train bit-identical geometry via the pyarrow
twins and replay assignment/encoding/ADC in SQL with the repo's
fixed-association float convention.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xero_api_etl_utilities_spark.plans.catalog import register
from xero_api_etl_utilities_spark.sources.parquet import load_table

_K_CELLS = 16
_IVF_ITERS = 4
_IVF_SAMPLE = 1000


def _oracle_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


# ---------------------------------------------------------------------------
# X164: truncation recall on the IVF scale path
# ---------------------------------------------------------------------------

_TRUNC_DIMS = (16, 32, 48, 64)
_TRUNC_NPROBE = 2


def _trunc_cents_from_parquet(sf_dir: str, d: int) -> list[list[float]]:
    """Pyarrow twin of the per-width training: the first _IVF_SAMPLE
    rows by vec_id, sliced to the prefix width, through the shared
    k-means core — bit-identical to ivf.train_centroids over the
    sliced DataFrame."""
    import pyarrow.parquet as pq

    from xero_api_etl_utilities_spark.operators.ivf import _kmeans_unit

    tb = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = tb.column("vec_id").to_pylist()
    raw = tb.column("embedding").to_pylist()
    order = sorted(range(len(ids)), key=lambda i: ids[i])[:_IVF_SAMPLE]
    vecs = [[float(v) for v in raw[i][:d]] for i in order]
    return _kmeans_unit(vecs, _K_CELLS, _IVF_ITERS, 11)


def similarity_truncation_recall_ivf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X164: matryoshka truncation recall measured on the SCALE PATH —
    for each prefix width d' in ``_TRUNC_DIMS``, an IVF index is
    trained and searched entirely under the truncated vectors
    (centroids, cell assignment, candidate generation, exact-cosine
    rank within candidates all at d'), and its top-5 is scored against
    the full-dimension exact ground truth.  Where X162 answers "what
    does truncation alone cost" with guard-caged brute force, this
    answers the production question: "what recall does the index I
    would actually DEPLOY at width d' deliver" — truncation loss and
    IVF probe loss priced together (the d'=64 row isolates the latter).

    Lowering: ONE brute-force truth pass (20 query vectors, the
    exactness-instrument convention) + one ``ivf.topk_ivf`` per width —
    each is the production candidate shape (broadcast probe frame →
    cell equi-join, never all-pairs).  Membership compare is a
    (query, neighbor) semi-join per width; totals attach as the
    audited 1-row broadcast.  At 100 TB the same census runs on a
    sampled query set with no change of shape — the corpus-sized work
    is the per-width cell assignment, a zero-shuffle scan projection.

    Cross-engine exactness: cosine ties broken by neighbor id on both
    sides; recall_bp is the exact rounded integer division."""
    from xero_api_etl_utilities_spark.operators import ivf
    from xero_api_etl_utilities_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")
    truth = sim.topk_bruteforce(
        emb.filter(F.col("vec_id") < 20), emb, k=5
    ).select("query_id", "neighbor_id")

    tagged = None
    for d in _TRUNC_DIMS:
        tr = emb.select(
            "vec_id", F.slice("embedding", 1, d).alias("embedding")
        )
        cents = ivf.train_centroids(
            tr, k=_K_CELLS, iters=_IVF_ITERS, sample=_IVF_SAMPLE
        )
        approx = ivf.topk_ivf(
            tr.filter(F.col("vec_id") < 20),
            tr,
            cents,
            k=5,
            nprobe=_TRUNC_NPROBE,
        ).select("query_id", "neighbor_id")
        m = truth.join(
            F.broadcast(approx), ["query_id", "neighbor_id"], "left_semi"
        ).select(F.lit(d).cast("int").alias("dims"))
        tagged = m if tagged is None else tagged.unionByName(m)

    total = truth.agg(F.count(F.lit(1)).alias("total"))
    return (
        tagged.groupBy("dims")
        .agg(F.count(F.lit(1)).cast("bigint").alias("matched"))
        .crossJoin(F.broadcast(total))
        .select(
            "dims",
            "matched",
            F.col("total").cast("bigint").alias("total"),
            F.expr(
                "CAST((20000 * matched + total) div (2 * total) AS BIGINT)"
            ).alias("recall_bp"),
        )
        .orderBy("dims")
    )


def _truncation_recall_ivf_oracle() -> str:
    from xero_api_etl_utilities_spark.plans.sketch_oracles import _vec_lit

    sf_dir = _oracle_sf_dir()

    def ivf_at(d: int) -> str:
        cents = _trunc_cents_from_parquet(sf_dir, d)
        structs = ", ".join(
            f"{{'d': list_dot_product(v, {_vec_lit(c)}), 'cell': {i}}}"
            for i, c in enumerate(cents)
        )
        cells = (
            f"list_transform(list_reverse(list_sort([{structs}])), s -> s.cell)"
        )
        return f"""
e{d} AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[])[1:{d}] AS v FROM embeddings
), corpus{d} AS (
  SELECT vec_id, v, ({cells})[1] AS cell FROM e{d}
), probes{d} AS (
  SELECT vec_id, UNNEST(({cells})[1:{_TRUNC_NPROBE}]) AS cell
  FROM e{d} WHERE vec_id < 20
), a{d} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY s DESC, neighbor_id ASC) AS rank
    FROM (
      SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(eq.v, c.v) AS s
      FROM probes{d} p
      JOIN corpus{d} c ON c.cell = p.cell AND c.vec_id <> p.vec_id
      JOIN e{d} eq ON eq.vec_id = p.vec_id
    )
  ) WHERE rank <= 5
)"""

    chains = ",".join(ivf_at(d) for d in _TRUNC_DIMS)
    matched = "\nUNION ALL ".join(
        f"SELECT {d} AS dims, CAST(COUNT(*) AS BIGINT) AS matched"
        f" FROM truth t JOIN a{d} a USING (query_id, neighbor_id)"
        for d in _TRUNC_DIMS
    )
    return f"""
WITH truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                      c.vec_id ASC) AS rank
    FROM (SELECT * FROM embeddings WHERE vec_id < 20) q, embeddings c
    WHERE q.vec_id <> c.vec_id
  ) WHERE rank <= 5
), {chains},
m AS ({matched}),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM truth)
SELECT CAST(dims AS INT) AS dims, matched, total,
  CAST((20000 * matched + total) // (2 * total) AS BIGINT) AS recall_bp
FROM m, tot
ORDER BY dims
"""


register(
    "similarity_truncation_recall_ivf",
    similarity_truncation_recall_ivf,
    _truncation_recall_ivf_oracle,
)


# ---------------------------------------------------------------------------
# X165: IVF drift census — indexed corpus vs new arrivals under frozen cells
# ---------------------------------------------------------------------------

_DRIFT_HOT_X100 = 300


def similarity_ivf_drift_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X165: the index-maintenance decision table — the batch twin of
    the streaming drift trigger (streaming/ann_maintenance.py).  The
    embeddings table splits into the INDEXED corpus (vec_id % 5 != 4)
    and NEW ARRIVALS (vec_id % 5 == 4); centroids train on the corpus
    only and are then FROZEN — exactly the state of a deployed index
    when fresh data lands.  Per cell: corpus and arrival counts, load
    factors vs perfect balance (100 = balanced, integer
    cross-multiplied), and the hot flag (arrival load factor past
    ``_DRIFT_HOT_X100``) that tells the scheduler this cell is
    absorbing disproportionate new mass — the "re-train k or
    re-balance" signal, X113's rule applied to the arrival stream.

    Shape: two zero-shuffle assignment projections (inlined centroid
    literals), two 16-cell aggregates, a k-row range completion, two
    1-row broadcast totals.  Corpus-linear, no window, no data
    collect."""
    from xero_api_etl_utilities_spark.operators import ivf

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 5 != 4)
    arrivals = emb.filter(F.col("vec_id") % 5 == 4)
    cents = ivf.train_centroids(
        corpus, k=_K_CELLS, iters=_IVF_ITERS, sample=_IVF_SAMPLE
    )

    def census(df: DataFrame, out: str) -> DataFrame:
        return (
            ivf.assign_cells(df, cents, nprobe=1)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias(out))
        )

    c_idx = census(corpus, "n_index")
    c_new = census(arrivals, "n_new")
    totals = corpus.agg(F.count(F.lit(1)).alias("_ti")).crossJoin(
        arrivals.agg(F.count(F.lit(1)).alias("_tn"))
    )
    cells = spark.range(_K_CELLS).select(F.col("id").cast("int").alias("cell"))
    return (
        cells.join(F.broadcast(c_idx), "cell", "left")
        .join(F.broadcast(c_new), "cell", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "cell",
            F.coalesce(F.col("n_index"), F.lit(0)).cast("bigint").alias("n_index"),
            F.coalesce(F.col("n_new"), F.lit(0)).cast("bigint").alias("n_new"),
            F.expr(f"coalesce(n_index, 0) * 100 * {_K_CELLS} div _ti")
            .cast("bigint")
            .alias("index_load_x100"),
            F.expr(f"coalesce(n_new, 0) * 100 * {_K_CELLS} div _tn")
            .cast("bigint")
            .alias("new_load_x100"),
            (
                F.expr(f"coalesce(n_new, 0) * 100 * {_K_CELLS} div _tn")
                > F.lit(_DRIFT_HOT_X100)
            ).alias("hot"),
        )
        .orderBy("cell")
    )


def _drift_census_oracle() -> str:
    import pyarrow.parquet as pq

    from xero_api_etl_utilities_spark.operators.ivf import _kmeans_unit
    from xero_api_etl_utilities_spark.plans.sketch_oracles import _vec_lit

    sf_dir = _oracle_sf_dir()
    tb = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = tb.column("vec_id").to_pylist()
    raw = tb.column("embedding").to_pylist()
    kept = [i for i in sorted(range(len(ids)), key=lambda i: ids[i]) if ids[i] % 5 != 4]
    vecs = [[float(v) for v in raw[i]] for i in kept[:_IVF_SAMPLE]]
    cents = _kmeans_unit(vecs, _K_CELLS, _IVF_ITERS, 11)
    structs = ", ".join(
        f"{{'d': list_dot_product(v, {_vec_lit(c)}), 'cell': {i}}}"
        for i, c in enumerate(cents)
    )
    cell1 = f"(list_transform(list_reverse(list_sort([{structs}])), s -> s.cell))[1]"
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), a_idx AS (
  SELECT {cell1} AS cell, count(*)::BIGINT AS n_index
  FROM e WHERE vec_id % 5 != 4 GROUP BY 1
), a_new AS (
  SELECT {cell1} AS cell, count(*)::BIGINT AS n_new
  FROM e WHERE vec_id % 5 = 4 GROUP BY 1
), tot AS (
  SELECT (SELECT count(*) FROM e WHERE vec_id % 5 != 4)::BIGINT AS ti,
         (SELECT count(*) FROM e WHERE vec_id % 5 = 4)::BIGINT AS tn
)
SELECT CAST(r.range AS INT) AS cell,
  coalesce(i.n_index, 0)::BIGINT AS n_index,
  coalesce(n.n_new, 0)::BIGINT AS n_new,
  CAST(coalesce(i.n_index, 0) * 100 * {_K_CELLS} // ti AS BIGINT) AS index_load_x100,
  CAST(coalesce(n.n_new, 0) * 100 * {_K_CELLS} // tn AS BIGINT) AS new_load_x100,
  (coalesce(n.n_new, 0) * 100 * {_K_CELLS} // tn > {_DRIFT_HOT_X100}) AS hot
FROM range({_K_CELLS}) r
LEFT JOIN a_idx i ON i.cell = r.range
LEFT JOIN a_new n ON n.cell = r.range
CROSS JOIN tot
ORDER BY cell
"""


register(
    "similarity_ivf_drift_census",
    similarity_ivf_drift_census,
    _drift_census_oracle,
)


# ---------------------------------------------------------------------------
# X166: residual-encoded IVF-PQ (IVFADC) search
# ---------------------------------------------------------------------------

# the residual index materializes once per (SparkContext, sf_dir) —
# the _pq_index pattern: one encode feeds every search this session
_RPQ_CACHE: dict[tuple[str, str], tuple] = {}


def _rpq_index(spark: SparkSession, sf_dir: str):
    from xero_api_etl_utilities_spark.operators import ivf
    from xero_api_etl_utilities_spark.operators.quantize import (
        train_pq_codebooks_from_parquet,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _RPQ_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        cents = ivf.train_centroids(
            emb, k=_K_CELLS, iters=_IVF_ITERS, sample=_IVF_SAMPLE
        )
        books = train_pq_codebooks_from_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            residual_centroids=cents,
        )
        index = ivf.encode_ivfpq_residual(emb, cents, books).localCheckpoint()
        _RPQ_CACHE[key] = (cents, books, index)
    return _RPQ_CACHE[key]


def similarity_topk_ivfpq_residual(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X166: IVF-PQ with RESIDUAL encoding — the full IVFADC recipe
    (Jégou et al. 2011): the index stores PQ codes of v − c(cell), and
    each query builds its ADC distance tables per probed cell from
    q − c(cell).  The residual distribution is far tighter than the
    raw one (the centroid absorbed the coarse structure), so the same
    16-codes-per-subspace budget quantizes it with materially less
    error — the standard accuracy upgrade at identical index bytes
    (4 B/vector), and the reason FAISS's IndexIVFPQ encodes residuals
    by default.

    Scale shape identical to similarity_topk_ivfpq: the searchable
    index is (id, cell, m codes); candidates come from ONE cell
    equi-join; corpus float vectors are never touched at search time.
    The only delta is table construction cost — nprobe tables per
    query instead of one — which is O(nprobe·k·dim) driver/executor
    float math per query, unchanged in shape.

    Oracle: bit-identical geometry via the pyarrow twins
    (residual_centroids re-derives cells with the assign_cells tie
    rule), then SQL replays residual encode + per-probe-cell ADC with
    the repo's fixed-association float sums."""
    from xero_api_etl_utilities_spark.operators import ivf

    emb = load_table(spark, sf_dir, "embeddings")
    cents, books, index = _rpq_index(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 20)
    return ivf.topk_ivf_pq(
        queries,
        emb,
        cents,
        books,
        k=5,
        nprobe=4,
        corpus_index=index,
        residual=True,
    )


def _ivfpq_residual_oracle() -> str:
    from xero_api_etl_utilities_spark.operators.ivf import (
        train_centroids_from_parquet,
    )
    from xero_api_etl_utilities_spark.operators.quantize import (
        train_pq_codebooks_from_parquet,
    )
    from xero_api_etl_utilities_spark.plans.sketch_oracles import _vec_lit

    sf_dir = _oracle_sf_dir()
    cents = train_centroids_from_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        k=_K_CELLS,
        iters=_IVF_ITERS,
        sample=_IVF_SAMPLE,
    )
    books = train_pq_codebooks_from_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), residual_centroids=cents
    )
    ds = len(books[0][0])
    cell_structs = ", ".join(
        f"{{'d': list_dot_product(v, {_vec_lit(c)}), 'cell': {i}}}"
        for i, c in enumerate(cents)
    )
    cells = f"list_transform(list_reverse(list_sort([{cell_structs}])), s -> s.cell)"
    cent_lits = "[" + ", ".join(_vec_lit(c) for c in cents) + "]"
    book_lits = ", ".join(
        "[" + ", ".join(_vec_lit(c) for c in book) + f"] AS b{s}"
        for s, book in enumerate(books)
    )
    # corpus residual codes: ((v[i] - cl[cell+1][i]) - cd)^2 summed
    # with the exact left-to-right association of the Spark encode
    # (zip_with residual materialized, then _sub_dist)
    code_cols = []
    for s, book in enumerate(books):
        dists = []
        for c in book:
            terms = " + ".join(
                f"((v[{s * ds + d + 1}] - cl[cell + 1][{s * ds + d + 1}])"
                f" - {float(cd)!r})"
                f" * ((v[{s * ds + d + 1}] - cl[cell + 1][{s * ds + d + 1}])"
                f" - {float(cd)!r})"
                for d, cd in enumerate(c)
            )
            dists.append(f"({terms})")
        lst = f"[{', '.join(dists)}]"
        code_cols.append(f"list_position({lst}, list_min({lst})) - 1 AS code_{s}")
    # ADC score: query residual vs the coded residual centroid — the
    # residual tables' ((q_d - c_d) - y_d)^2 with matching association
    score_terms = " + ".join(
        "("
        + " + ".join(
            f"((eq.v[{s * ds + d + 1}] - cl[p.cell + 1][{s * ds + d + 1}])"
            f" - b{s}[c.code_{s} + 1][{d + 1}])"
            f" * ((eq.v[{s * ds + d + 1}] - cl[p.cell + 1][{s * ds + d + 1}])"
            f" - b{s}[c.code_{s} + 1][{d + 1}])"
            for d in range(ds)
        )
        + ")"
        for s in range(len(books))
    )
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), geom AS (
  SELECT {cent_lits} AS cl, {book_lits}
), corpus0 AS (
  SELECT vec_id, v, ({cells})[1] AS cell FROM e
), corpus AS (
  SELECT vec_id, cell, {", ".join(code_cols)}
  FROM corpus0 CROSS JOIN geom
), probes AS (
  SELECT vec_id, UNNEST(({cells})[1:4]) AS cell
  FROM e WHERE vec_id < 20
), scored AS (
  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         {score_terms} AS sc
  FROM probes p
  JOIN corpus c ON c.cell = p.cell AND c.vec_id <> p.vec_id
  JOIN e eq ON eq.vec_id = p.vec_id
  CROSS JOIN geom
), ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sc ASC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
"""


register(
    "similarity_topk_ivfpq_residual",
    similarity_topk_ivfpq_residual,
    _ivfpq_residual_oracle,
)
