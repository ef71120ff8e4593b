"""Z-order (Morton) curve encoding — multi-dimensional data layout.

No reference counterpart (src/queries.ts is a bookkeeping ETL); this
is the layout primitive a 100 TB lakehouse uses to make file-level
min/max skipping work for MORE THAN ONE predicate column at once:
sorting by the bit-interleaved key clusters rows so every file covers
a narrow range in BOTH dimensions, where a lexicographic sort gives
pruning on the leading column only (Delta/Iceberg OPTIMIZE ZORDER is
exactly this).

Pure integer bit arithmetic on both engines — every shift distance is
a compile-time literal, so the whole encode stays inside whole-stage
codegen, and the DuckDB twin is generated from the same loop, making
z-values hash-verifiable cross-engine.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

BITS = 16  # per dimension; z-value fits 32 bits


def z_interleave16(x: Column, y: Column) -> Column:
    """Morton-interleave the low 16 bits of ``x`` (even positions) and
    ``y`` (odd positions) into one 32-bit z-value. Callers mask their
    dimensions into [0, 2^16) first (`& 65535`)."""
    terms = []
    for i in range(BITS):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def z_interleave16_sql(x: str, y: str) -> str:
    """DuckDB twin of :func:`z_interleave16` (same loop, same bits)."""
    terms = []
    for i in range(BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def py_z_interleave16(x: int, y: int) -> int:
    """Pure-python reference for unit fixtures."""
    z = 0
    for i in range(BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def py_z_deinterleave16(z: int) -> tuple[int, int]:
    """Inverse of :func:`py_z_interleave16` — recover (x, y) from a
    z-value. Used to turn a file's [z_min, z_max] range back into the
    dimension rectangles a skipping planner prunes with."""
    x = y = 0
    for i in range(BITS):
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
    return x, y
