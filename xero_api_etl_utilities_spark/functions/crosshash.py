"""Cross-engine deterministic hashing (Spark ⇄ DuckDB ⇄ python).

The MinHash/SimHash family originally hashed with ``xxhash64``, which
DuckDB cannot reproduce — leaving those catalog queries without a
driver oracle. md5 is bit-identical everywhere, so deriving integer
hashes from md5 hex prefixes makes the whole sketch pipeline
*algorithmically reproducible* in DuckDB SQL (and in pure python for
unit fixtures): the oracle re-runs the same documented algorithm,
which is a strictly stronger check than set-containment.

Spark side stays fully JVM/codegen (md5 + substring + conv are
built-ins); md5 costs a few ns/row more than xxhash64, which is noise
next to the shuffles these operators feed.

  H32(x) = int(md5(x)[0:8], 16)            ∈ [0, 2^32)
  H64(x) = (H32hi << 32) | H32lo  as a signed two's-complement long,
           where hi/lo are the first/second 8 hex chars.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def h32(col):
    """Spark column: first 32 md5 bits of the string value, as long."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def h64(col):
    """Spark column: first 64 md5 bits as a SIGNED long (two's complement
    wrap via shiftleft — a bitwise op, exempt from ANSI overflow)."""
    m = F.md5(col.cast("string"))
    hi = F.conv(F.substring(m, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(m, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def h32_spark(expr: str) -> str:
    """SPARK-SQL string twin of :func:`h32`, for builders that render
    their repeated-expression loops as one ``F.expr`` string instead
    of hundreds of py4j column ops (operators/litfold.py rationale:
    plan-construction driver time).  Must stay textually equivalent to
    the Column form — conv() returns STRING, hence the outer CAST."""
    return (
        f"CAST(conv(substring(md5(CAST({expr} AS STRING)), 1, 8), 16, 10)"
        " AS BIGINT)"
    )


def h32_sql(expr: str) -> str:
    """DuckDB twin of :func:`h32` (UBIGINT value in [0, 2^32))."""
    return f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8) AS UBIGINT)"


def h64_hi_sql(expr: str) -> str:
    """DuckDB: high 32 md5 bits as UBIGINT."""
    return f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8) AS UBIGINT)"


def h64_lo_sql(expr: str) -> str:
    """DuckDB: low 32 md5 bits (hex chars 9-16) as UBIGINT."""
    return f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR)), 9, 8) AS UBIGINT)"


def signed64_sql(hi_expr: str, lo_expr: str) -> str:
    """DuckDB: assemble (hi << 32) | lo as a SIGNED BIGINT matching
    Java/Spark two's-complement semantics (DuckDB refuses UBIGINT→BIGINT
    casts above 2^63-1, so go through HUGEINT and subtract 2^64)."""
    return (
        f"CAST(CAST({hi_expr} AS HUGEINT) * 4294967296 + CAST({lo_expr} AS HUGEINT)"
        f" - CASE WHEN {hi_expr} >= 2147483648 THEN 18446744073709551616::HUGEINT"
        f" ELSE 0::HUGEINT END AS BIGINT)"
    )


def py_h32(s: str) -> int:
    """Pure-python twin of :func:`h32` for unit-test fixtures."""
    return int(hashlib.md5(s.encode()).hexdigest()[0:8], 16)


def py_h64(s: str) -> int:
    """Pure-python twin of :func:`h64` (signed two's complement)."""
    d = hashlib.md5(s.encode()).hexdigest()
    v = (int(d[0:8], 16) << 32) | int(d[8:16], 16)
    return v - (1 << 64) if v >= (1 << 63) else v
