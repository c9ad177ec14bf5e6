"""functions/lits.py: the one-py4j-call literal arrays must be
BIT-identical (and type-identical) to the F.array(*F.lit) idiom they
replace — the r16 plan-construction optimization changes how literals
cross py4j, never what lands in the plan."""

import math
import struct

import pytest
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.functions.lits import (
    lit_doubles,
    lit_doubles_2d,
    lit_doubles_3d,
    lit_ints,
    lit_longs,
)

# adversarial doubles: shortest-repr edge cases, subnormals, exact ints,
# negative zero, huge/tiny exponents, non-finite
HARD_DOUBLES = [
    0.1,
    2.675,
    1.0,
    -0.0,
    0.0,
    5e-324,
    1.7976931348623157e308,
    2.2250738585072014e-308,
    1 / 3,
    math.pi,
    -math.e,
    123456789.123456789,
    1e16,
    9.999999999999999e15,
    6.02e23,
    -1e-300,
    float("nan"),
    float("inf"),
    float("-inf"),
]


def _bits(x):
    return struct.pack("<d", x)


def test_lit_doubles_bit_identical(spark):
    old = F.array(*[F.lit(float(v)) for v in HARD_DOUBLES])
    new = lit_doubles(HARD_DOUBLES)
    row = spark.range(1).select(old.alias("o"), new.alias("n")).first()
    assert len(row["o"]) == len(row["n"]) == len(HARD_DOUBLES)
    for a, b in zip(row["o"], row["n"]):
        assert _bits(a) == _bits(b), (a, b)
    schema = spark.range(1).select(new.alias("n")).schema
    assert schema["n"].dataType.simpleString() == "array<double>"


def test_lit_doubles_nested_shapes(spark):
    mat = [HARD_DOUBLES[:4], HARD_DOUBLES[4:8]]
    t3 = [mat, [HARD_DOUBLES[8:12], HARD_DOUBLES[12:16]]]
    row = (
        spark.range(1)
        .select(
            lit_doubles_2d(mat).alias("m"),
            lit_doubles_3d(t3).alias("t"),
            F.array(
                *[F.array(*[F.lit(v) for v in r]) for r in mat]
            ).alias("m_old"),
        )
        .first()
    )
    for a, b in zip(row["m"], row["m_old"]):
        for x, y in zip(a, b):
            assert _bits(x) == _bits(y)
    assert [list(r) for r in row["t"][0]] == [list(r) for r in row["m"]]


def test_lit_ints_and_longs(spark):
    vals = [0, 1, -1, 2**31 - 1, -(2**31)]
    row = (
        spark.range(1)
        .select(
            lit_ints(vals).alias("i"),
            lit_longs(vals + [2**62]).alias("l"),
            F.array(*[F.lit(int(v)) for v in vals]).alias("i_old"),
        )
        .first()
    )
    assert list(row["i"]) == list(row["i_old"]) == vals
    assert list(row["l"]) == vals + [2**62]
    schema = spark.range(1).select(
        lit_ints(vals).alias("i"), lit_longs(vals).alias("l")
    ).schema
    assert schema["i"].dataType.simpleString() == "array<int>"
    assert schema["l"].dataType.simpleString() == "array<bigint>"
    with pytest.raises(ValueError):
        lit_ints([2**31])


def test_lit_strings_parity(spark):
    from pyspark_etl_twitter_spark.functions.lits import lit_strings

    vals = ["plain", "it's", "a\\b", 'quo"te', "unié", "i'll"]
    row = (
        spark.range(1)
        .select(
            lit_strings(vals).alias("n"),
            F.array(*[F.lit(v) for v in vals]).alias("o"),
            lit_strings(["ctl\x01char"]).alias("c"),  # fallback path
        )
        .first()
    )
    assert list(row["n"]) == list(row["o"]) == vals
    assert list(row["c"]) == ["ctl\x01char"]
    # full stopword list round-trips (the hot caller)
    from pyspark_etl_twitter_spark.functions.stopwords import ENGLISH_STOPWORDS

    got = spark.range(1).select(lit_strings(ENGLISH_STOPWORDS).alias("s")).first()
    assert list(got["s"]) == list(ENGLISH_STOPWORDS)


def test_empty_rejected():
    for fn in (lit_doubles, lit_doubles_2d, lit_doubles_3d, lit_ints, lit_longs):
        with pytest.raises(ValueError):
            fn([])
