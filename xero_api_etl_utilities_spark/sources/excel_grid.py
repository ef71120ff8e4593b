"""S1/S2/S3 — the Excel "Day Docket" workbook source, relationalized.

The reference addresses one worksheet ("A4 Summary") positionally:
B3 = Excel-serial date, D15 = till variance, charge rows from row 21
delimited by literal "Amount" marker rows, a payments section ending at
"Total Charges", and a "Total Debtors" reconciliation row located by
scanning every cell (/root/reference/src/parse.ts:61-146).

Engine model: a workbook becomes a GRID DataFrame —
(src_file, row_idx, A..G as strings) — and every downstream step is a
relational operator over that grid (see ``parse_day_dockets``):
marker segmentation is a running-sum window (W1), cell lookups are
filters, the balance check is an aggregate. This keeps the positional
logic testable on in-memory fixtures with no Excel library present.

Physical ingestion paths:
- ``grid_from_rows``      : build the grid from fixture tuples (tests).
- ``read_workbook_grids`` : binaryFile source + mapInPandas/openpyxl —
  partition-parallel workbook decode for many files. The openpyxl
  decode is import-gated: this container ships no Excel reader, so the
  Spark-side plumbing (schema, batch shape, glob filter) is real and
  tested while the byte-level decode raises NotImplementedError.
"""

from __future__ import annotations

import os
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

GRID_COLUMNS = ("A", "B", "C", "D", "E", "F", "G")

GRID_SCHEMA = T.StructType(
    [T.StructField("src_file", T.StringType(), False),
     T.StructField("row_idx", T.IntegerType(), False)]
    + [T.StructField(c, T.StringType(), True) for c in GRID_COLUMNS]
)

# Filename contract: `DD {dd}.xls[x]` (src/parse.ts:49, src/helpers.ts:76).
DD_FILE_GLOB = "DD [0-9][0-9].xls*"
DD_FILE_REGEX = r"^DD \d\d\.xls[x]?$"


def grid_from_rows(
    spark: SparkSession,
    rows: Iterable[tuple],
) -> DataFrame:
    """Build a grid DataFrame from (src_file, row_idx, A..G) tuples."""
    return spark.createDataFrame(list(rows), schema=GRID_SCHEMA)


def list_day_docket_files(spark: SparkSession, drop_dir: str) -> DataFrame:
    """S1: non-recursive directory scan with the DD-filename filter.

    The reference's recursion is broken (return value discarded,
    src/parse.ts:46-48) — evident-intent semantics here is the Spark
    default recursiveFileLookup=false, honored deliberately.
    """
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", DD_FILE_GLOB)
        .load(drop_dir)
        .select(
            F.col("path"),
            F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
            F.col("length"),
            F.col("content"),
        )
        .filter(F.col("file_name").rlike(DD_FILE_REGEX))
    )


def _decode_workbook_batches(batches):
    """mapInPandas worker: binaryFile rows → grid rows via openpyxl.

    Import-gated: raises NotImplementedError when no Excel reader is
    installed (this container), keeping the distributed plumbing
    importable and plan-checkable either way.
    """
    import io

    import pandas as pd

    try:
        from openpyxl import load_workbook
    except ImportError as exc:  # pragma: no cover - absent in container
        raise NotImplementedError(
            "workbook byte decode requires openpyxl; install it or ingest "
            "grids via grid_from_rows/parquet"
        ) from exc

    for pdf in batches:
        out: list[dict] = []
        for _, row in pdf.iterrows():
            wb = load_workbook(io.BytesIO(row["content"]), read_only=True)
            ws = wb["A4 Summary"]  # fixed sheet name, src/parse.ts:63
            for r_idx, cells in enumerate(ws.iter_rows(max_col=7), start=1):
                rec = {"src_file": row["file_name"], "row_idx": r_idx}
                for c_idx, cell in enumerate(cells):
                    v = cell.value
                    rec[GRID_COLUMNS[c_idx]] = None if v is None else str(v)
                out.append(rec)
        yield pd.DataFrame(
            out, columns=["src_file", "row_idx", *GRID_COLUMNS]
        )


def read_workbook_grids(spark: SparkSession, drop_dir: str) -> DataFrame:
    """S2 at scale: one task per workbook partition, Arrow-batched
    decode to the grid schema. (Decode itself is import-gated; see
    module docstring.)"""
    files = list_day_docket_files(spark, drop_dir)
    # one workbook per task: workbooks are independent decode units
    return files.repartition("file_name").mapInPandas(
        _decode_workbook_batches, schema=GRID_SCHEMA
    )


def save_grid(df: DataFrame, path: str) -> None:
    """Persist decoded grids as parquet (the replay/audit copy)."""
    df.write.mode("overwrite").parquet(path)
