"""Differential pin for willa_spark.functions._fastlit (r15 verdict
#6): the one-expr-parse literal builders must be BIT-identical to the
``F.lit`` forms they replaced — the PQ/classifier/similarity training
loops rebuild these literals every iteration, so any rounding drift
here would silently move oracle-visible hashes and band boundaries.

Bit-identity is asserted on the IEEE-754 bytes of every element
(``struct.pack`` of the collected doubles — the Spark→Python double
transfer is exact binary64), not ``==`` — so -0.0 vs +0.0 and
subnormal round-trips cannot hide behind value equality.
"""

import math
import struct

import pytest
from pyspark.sql import functions as F

from willa_spark.functions._fastlit import (
    lit_double_cube,
    lit_double_rows,
    lit_doubles,
)

# Adversarial doubles: signed zeros, subnormals (min subnormal, largest
# subnormal, smallest normal), extremes, and values whose shortest repr
# carries 17 significant digits.
ADVERSARIAL = [
    0.0,
    -0.0,
    5e-324,
    -5e-324,
    2.2250738585072009e-308,  # largest subnormal
    2.2250738585072014e-308,  # smallest normal
    1.7976931348623157e308,
    -1.7976931348623157e308,
    0.1,
    -0.1,
    1 / 3,
    math.pi,
    -math.e,
    123456789.123456789,
    9.999999999999999e22,
    1e-300,
    -1e300,
    6755399441055744.0,  # 2^52 + 2^51 (exact integer boundary)
]


def _bits(x):
    """IEEE-754 bytes of a double / nested double structure."""
    if isinstance(x, float):
        return struct.pack("<d", x)
    return [_bits(v) for v in x]


def test_lit_doubles_bit_identical_to_f_lit(spark):
    row = spark.range(1).select(
        lit_doubles(ADVERSARIAL).alias("fast"), F.lit(ADVERSARIAL).alias("slow")
    ).collect()[0]
    assert len(row["fast"]) == len(ADVERSARIAL)
    assert _bits(row["fast"]) == _bits(row["slow"])


def test_lit_double_rows_bit_identical_and_ragged_fallback(spark):
    rows = [ADVERSARIAL[:4], ADVERSARIAL[4:8], ADVERSARIAL[8:12]]
    got = spark.range(1).select(
        lit_double_rows(rows).alias("fast"), F.lit(rows).alias("slow")
    ).collect()[0]
    assert _bits(got["fast"]) == _bits(got["slow"])
    # ragged (an empty row) falls back to F.lit, identical by identity
    ragged = [[1.0], []]
    vals = spark.range(1).select(lit_double_rows(ragged).alias("v")).collect()[0]
    assert vals["v"] == [[1.0], []]


def test_lit_double_cube_bit_identical(spark):
    cube = [
        [ADVERSARIAL[:3], ADVERSARIAL[3:6]],
        [ADVERSARIAL[6:9], ADVERSARIAL[9:12]],
    ]
    got = spark.range(1).select(
        lit_double_cube(cube).alias("fast"), F.lit(cube).alias("slow")
    ).collect()[0]
    assert _bits(got["fast"]) == _bits(got["slow"])


def test_empty_forms_are_typed(spark):
    df = spark.range(1).select(
        lit_doubles([]).alias("a"),
        lit_double_rows([]).alias("r"),
        lit_double_cube([]).alias("c"),
    )
    assert dict(df.dtypes) == {
        "a": "array<double>",
        "r": "array<array<double>>",
        "c": "array<array<array<double>>>",
    }
    row = df.collect()[0]
    assert row["a"] == [] and row["r"] == [] and row["c"] == []


@pytest.mark.parametrize("bad", [float("inf"), float("-inf"), float("nan")])
def test_non_finite_rejected_loudly(bad):
    with pytest.raises(ValueError, match="non-finite"):
        lit_doubles([1.0, bad])
    with pytest.raises(ValueError, match="non-finite"):
        lit_double_rows([[1.0], [bad]])
