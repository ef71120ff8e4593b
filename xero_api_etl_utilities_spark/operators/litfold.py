"""Constant-folded nested double literals in ONE py4j call.

``F.lit(nested_list)`` decomposes into one ``lit``/``array`` py4j
round-trip per element — ~1100 calls and 0.6–4 s of DRIVER time for a
16×64 centroid grid, paid on every plan build (bench and driver alike
rebuild each query's plan inside the timed region).  Rendering the
same values as a single SQL ``array(array(...))`` expression string is
one parser call (~3 ms); ConstantFolding collapses it to the identical
Literal the ``F.lit`` path produced.

Bit-identity: each element is formatted with ``repr(float(v))`` — the
shortest decimal string that round-trips to the same IEEE-754 double —
and suffixed ``D`` so Spark parses it as a DOUBLE literal (bare
decimals would parse as DECIMAL).  Correctly-rounded parsing of a
shortest round-trip repr recovers the exact original double, so the
folded literal is byte-identical to the element-wise one (pinned by
tests/test_litfold.py over adversarial values: -0.0, denormal min,
DBL_MAX, 1/3, pi).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_doubles(vals) -> Column:
    """Literal Column for a (possibly nested) list of finite doubles."""

    def fmt(v) -> str:
        if isinstance(v, (list, tuple)):
            return "array(" + ",".join(fmt(x) for x in v) + ")"
        d = float(v)
        if not math.isfinite(d):
            raise ValueError(f"non-finite literal element: {v!r}")
        return repr(d) + "D"

    return F.expr(fmt(vals))


def lit_longs(vals) -> Column:
    """Literal Column for a (possibly nested) list of int64s — the
    BIGINT twin of :func:`lit_doubles` (``L`` suffix; exact, no float
    round-trip concerns)."""

    def fmt(v) -> str:
        if isinstance(v, (list, tuple)):
            return "array(" + ",".join(fmt(x) for x in v) + ")"
        return f"{int(v)}L"

    return F.expr(fmt(vals))
