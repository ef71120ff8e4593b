"""operators/litfold — the one-call SQL-string literal must be
byte-identical to the element-wise ``F.lit`` it replaced.

The helper exists purely for DRIVER-side plan-construction speed
(~1100 py4j calls -> 1 parser call for a 16x64 centroid grid); the
values must not change by a single bit, or every ANN score/bucket/code
downstream drifts.  Pinned over adversarial doubles: -0.0, the
denormal minimum, DBL_MAX, shortest-repr-sensitive values (0.1, 1/3,
pi), and a uniform random batch.
"""

from __future__ import annotations

import math
import random
import struct

import pytest
from pyspark.sql import functions as F

from xero_api_etl_utilities_spark.operators.litfold import lit_doubles, lit_longs


ADVERSARIAL = [
    0.0,
    -0.0,
    1.0,
    -1.0,
    0.1,
    1 / 3,
    math.pi,
    -math.pi,
    2.0**-52,
    1e16 + 1.0,
    1e-300,
    5e-324,  # smallest denormal
    1.7976931348623157e308,  # DBL_MAX
]


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def test_lit_doubles_bit_identical_to_elementwise(spark):
    rng = random.Random(1234)
    vals = ADVERSARIAL + [rng.uniform(-1e6, 1e6) for _ in range(50)]
    nested = [vals[i : i + 7] for i in range(0, len(vals), 7)]
    row = (
        spark.range(1)
        .select(
            F.lit([[float(x) for x in r] for r in nested]).alias("a"),
            lit_doubles(nested).alias("b"),
        )
        .collect()[0]
    )
    assert [len(r) for r in row["a"]] == [len(r) for r in row["b"]]
    for ra, rb in zip(row["a"], row["b"]):
        for x, y in zip(ra, rb):
            assert _bits(x) == _bits(y)


def test_lit_doubles_three_level_and_sign_of_zero(spark):
    nested = [[[-0.0, 0.0], [1.5, -2.5]], [[5e-324, -5e-324], [0.25, -0.25]]]
    row = (
        spark.range(1)
        .select(
            F.lit(nested).alias("a"),
            lit_doubles(nested).alias("b"),
        )
        .collect()[0]
    )
    for ba, bb in zip(row["a"], row["b"]):
        for ra, rb in zip(ba, bb):
            for x, y in zip(ra, rb):
                assert _bits(x) == _bits(y)  # distinguishes -0.0 from 0.0


def test_lit_doubles_rejects_non_finite():
    with pytest.raises(ValueError):
        lit_doubles([float("nan"), 1.0])
    with pytest.raises(ValueError):
        lit_doubles([[float("inf")]])


def test_lit_longs_matches_elementwise(spark):
    vals = [0, 1, -1, 2**62, -(2**62), 123456789, -987654321]
    row = (
        spark.range(1)
        .select(
            F.array(*[F.lit(int(v)).cast("bigint") for v in vals]).alias("a"),
            lit_longs(vals).alias("b"),
        )
        .collect()[0]
    )
    assert list(row["a"]) == list(row["b"])
    schema = spark.range(1).select(lit_longs(vals).alias("b")).schema
    assert schema["b"].dataType.simpleString() == "array<bigint>"
