"""JSONL / CSV document sources with corrupt-record routing.

Raw corpus drops arrive as JSON-lines and CSV long before they are
parquet; an engine that only reads parquet pushes the messy first hop
somewhere else.  These readers wrap Spark's native json/csv sources
(distributed, pushdown-capable) with the ingestion policy a curation
pipeline actually needs: NEVER drop a malformed record silently —
route it to a side output with the raw line intact (the P10
validation side-output rule applied to the file hop).

Scale notes: both readers are plain ``spark.read`` — splittable,
schema-explicit (no inference pass over 100 TB), PERMISSIVE mode so
one bad byte cannot kill a 1000-file batch.  The corrupt column uses
Spark's ``columnNameOfCorruptRecord`` machinery; callers get (good,
bad) DataFrames and decide quarantine policy themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT = "_corrupt_record"


def _with_corrupt_column(schema: T.StructType) -> T.StructType:
    """Copy of ``schema`` with the corrupt-record column appended.

    Must NOT use ``StructType.add`` on the caller's object:
    ``add`` mutates in place and returns ``self``, so the caller's
    schema would permanently grow a ``_corrupt_record`` field — and a
    second read with the same schema object would carry a duplicate."""
    if any(f.name == _CORRUPT for f in schema.fields):
        raise ValueError(
            f"schema already contains a {_CORRUPT!r} column; "
            "pass the data schema without it"
        )
    return T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType(), True)]
    )


def read_jsonl_with_quarantine(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines with an explicit schema; return (good, bad).

    ``bad`` carries one ``raw`` string column with the original line
    (Spark's corrupt-record capture), so quarantine review sees the
    actual bytes, not a parse of them.  A record that parses but
    carries nulls for every schema field is STILL "good" here —
    null-policy is a contract check (diag_data_contract), not a parse
    check.

    Caveat (documented Spark behavior): the corrupt column must be
    part of the read schema, and good/bad must come from ONE read —
    filtering a cached frame — because re-reading with a filter on
    the corrupt column alone is unsupported."""
    full = _with_corrupt_column(schema)
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    ).cache()
    good = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = df.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw")
    )
    return good, bad


def read_csv_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of :func:`read_jsonl_with_quarantine` — same (good,
    bad) contract, same PERMISSIVE + corrupt-column routing (a row
    with the wrong arity or an unparsable typed field lands in
    ``bad`` with the raw line)."""
    full = _with_corrupt_column(schema)
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    ).cache()
    good = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = df.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw")
    )
    return good, bad
