"""Context-window packing: assign documents to fixed-token-budget
packs for LLM training-batch assembly.

No reference counterpart; north-star training-data-pipeline surface.

Packing is inherently sequential (each pack depends on every earlier
document), which would serialize a 100 TB corpus through one task.
The scalable formulation used here is *sharded fixed-boundary
chunking*:

- the corpus is split into shards (any stable key — storage bucket,
  hash of the id, date); each shard packs independently, so the
  window computation parallelizes across shards;
- within a shard, documents are laid out in stable id order and a
  running token total is computed; a document is assigned to pack
  ``floor(prev_running_total / budget)`` — pack boundaries sit at
  fixed multiples of the budget along the token stream.

Documents are never split. A document whose tokens straddle a
boundary stays in the earlier pack, so a pack can overflow the budget
by at most ``max_doc_tokens − 1`` — the standard deterministic
approximation of next-fit packing, chosen because it is a pure window
expression (one shuffle on the shard key) and reproducible on any
engine, unlike true next-fit which is a sequential recurrence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_fixed_budget(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    shard_col: str | Column | None = None,
) -> DataFrame:
    """Add ``prev_tokens`` (exclusive running total) and ``pack_id``
    (= prev_tokens div budget) within each shard, ordered by id.

    With ``shard_col=None`` everything is one shard — correct but a
    single-partition window; always shard real corpora.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    shard = F.lit(0) if shard_col is None else (
        F.col(shard_col) if isinstance(shard_col, str) else shard_col
    )
    w = (
        Window.partitionBy(shard.alias("shard"))
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("bigint")
    # exact integer division: (prev - prev % budget) is a multiple of
    # budget, so the double division below is exact for any quotient
    # a real corpus can reach
    pack = ((prev - prev % budget) / budget).cast("bigint")
    return df.select(
        F.col(id_col),
        shard.alias("shard"),
        F.col(tokens_col).cast("bigint").alias("n_tokens"),
        prev.alias("prev_tokens"),
        pack.alias("pack_id"),
    )
