"""J1 — the reconciliation equi-join (the reference's most load-bearing
semantic).

The reference verifies each parsed workbook charge against the DB with a
per-row ``findFirst`` probe — a client-driven nested loop, one SQL round
trip per row (/root/reference/src/queries.ts:5-46). Matched rows are
enriched and kept; misses become the "unverified" set that aborts the
run (/root/reference/src/helpers.ts:200-214).

Spark-first re-expression: ONE set-based join per outcome —
``inner`` for matched (+ carry-through of probe-only columns, the J4
notes-merge at src/queries.ts:41), ``left_anti`` for unverified. The
probe side is tiny relative to the fact table, so Catalyst/AQE picks a
broadcast hash join: at 100 TB the N+1 loop becomes a single
scan-side hash probe with zero shuffle of the big table.

The round-to-2dp rule lives on the PROBE side only, mirroring
``+charge.amount.toFixed(2)`` (src/queries.ts:15): callers pre-round
the probe key column; the build side is compared as stored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reconcile(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    broadcast_probe: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Split ``probe`` into (matched, unverified) against ``build``.

    matched    : inner join on ``on`` — probe columns enriched with the
                 build side's non-key columns (J4 merge semantics).
    unverified : left-anti join — probe rows with no build match
                 (feeds the Q3 abort gate).

    ``broadcast_probe`` hints Spark to broadcast the probe side when it
    is the small one (the daily-workbook case: dozens of rows vs a
    multi-TB charge table).
    """
    p = F.broadcast(probe) if broadcast_probe else probe
    matched = p.join(build, on=on, how="inner")
    unverified = p.join(build, on=on, how="left_anti")
    return matched, unverified
