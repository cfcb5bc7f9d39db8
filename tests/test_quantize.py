"""Cross-engine bit-parity of the 6-dp quantizer (functions/quantize.py).

qround6 / qround6_sql exist because Spark's ROUND and DuckDB's ROUND
diverge on half-boundary doubles; they must themselves be bit-identical
across engines for every input class — including the pass-through guard
for NaN / Infinity / |x| >= 9e12 added after review (Spark's
floor(double) returns LONG, so without the guard NaN became 0 and +Inf
became ~9.22e12 while DuckDB passed them through).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from masd_spark.functions.quantize import qround6, qround6_sql

# Normal values, documented Spark/DuckDB ROUND divergence boundary, exact
# .5 ulp boundaries, tiny/huge magnitudes straddling the pass-through
# bound, NaN, infinities, and NULL.
CASES = [
    0.0,
    -0.0,
    1.2345678,
    -1.2345678,
    43.472812499999996,  # the documented round() divergence row
    0.0000005,
    -0.0000005,
    123456.7890625,
    8.999999e12,  # just under the pass-through bound
    9.0e12,  # exactly at the bound -> pass-through
    9.1e13,
    -9.1e13,
    float("nan"),
    float("inf"),
    float("-inf"),
    None,
]


def test_qround6_matches_duckdb_bit_for_bit(spark):
    df = spark.createDataFrame(
        [(v,) for v in CASES],
        StructType([StructField("x", DoubleType(), True)]),
    )
    got = [
        r["q"] for r in df.select(qround6(F.col("x")).alias("q")).collect()
    ]
    def _lit(v: float | None) -> str:
        # SQL literals, not parameter binding: the duckdb Python client
        # binds float('nan') as NULL, which is not engine semantics
        if v is None:
            return "CAST(NULL AS DOUBLE)"
        if math.isnan(v):
            return "'NaN'::DOUBLE"
        if math.isinf(v):
            return ("'-Infinity'" if v < 0 else "'Infinity'") + "::DOUBLE"
        return f"CAST({v!r} AS DOUBLE)"

    values = ", ".join(f"({_lit(v)})" for v in CASES)
    want = [
        r[0]
        for r in duckdb.connect()
        .execute(
            "SELECT " + qround6_sql("x") + f" FROM (VALUES {values}) t(x)"
        )
        .fetchall()
    ]
    assert len(got) == len(want) == len(CASES)
    for v, g, w in zip(CASES, got, want):
        if g is None or w is None:
            assert g is None and w is None, (v, g, w)
        elif math.isnan(g) or math.isnan(w):
            assert math.isnan(g) and math.isnan(w), (v, g, w)
        else:
            # bit-identical, not approx: the oracle hash compares repr
            assert g == w and math.copysign(1, g) == math.copysign(1, w), (
                v,
                g,
                w,
            )


@pytest.mark.parametrize(
    ("x", "expected"),
    [
        (float("nan"), float("nan")),
        (float("inf"), float("inf")),
        (float("-inf"), float("-inf")),
        (9.1e13, 9.1e13),  # beyond the bound: identity, NOT long-saturated
        (1.23456749, 1.234567),
        (1.23456755, 1.234568),  # but see quantize.py: exactly-.5 rounds up
    ],
)
def test_qround6_guard_semantics(spark, x, expected):
    df = spark.createDataFrame(
        [(x,)], StructType([StructField("x", DoubleType(), True)])
    )
    got = df.select(qround6(F.col("x")).alias("q")).collect()[0]["q"]
    if math.isnan(expected):
        assert math.isnan(got)
    else:
        assert got == expected


def test_quantize_int8_poison_vectors_degrade_to_null(spark):
    """A NaN or Inf element must not abort the query under ANSI mode
    (CAST_OVERFLOW on cast(NaN as long)); the poisoned vector quantizes
    element-wise to NULL and its integer dot product becomes NULL, so it
    drops out of top-k instead of crashing the job."""
    from masd_spark.functions.vectors import dot_fixed_long, quantize_int8

    df = spark.createDataFrame(
        [
            (1, [3.0, -4.0]),
            (2, [float("nan"), 1.0]),
            (3, [float("inf"), 1.0]),
            (4, [0.0, 0.0]),
        ],
        "id int, v array<double>",
    )
    q = df.select("id", quantize_int8(F.col("v")).alias("q"))
    rows = {r["id"]: r["q"] for r in q.collect()}
    assert rows[1] == [95, -127]
    # NaN scale poisons every element -> all-NULL array, not an abort
    assert rows[2] == [None, None]
    # Inf -> scale 0.0 -> Inf*0 = NaN -> NULL; the finite element is 0
    assert rows[3] == [None, 0]
    assert rows[4] == [0, 0]  # zero-vector scale guard unchanged
    dots = {
        r["id"]: r["d"]
        for r in q.select(
            "id", dot_fixed_long(F.col("q"), F.col("q"), 2).alias("d")
        ).collect()
    }
    assert dots[1] == 95 * 95 + 127 * 127
    assert dots[2] is None and dots[3] is None and dots[4] == 0
