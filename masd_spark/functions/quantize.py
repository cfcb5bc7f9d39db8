"""Engine-agnostic 6-decimal quantization for float output surfaces.

Oracled queries that emit derived doubles must produce BIT-IDENTICAL
values in Spark and DuckDB (tests/oracle.py compares float repr
exactly). ``ROUND(x, 6)`` is NOT engine-agnostic:

- Spark's ``round`` goes through ``BigDecimal.valueOf(double)`` — the
  double's shortest decimal repr — then HALF_UP, so
  round(43.472812499999996, 6) = 43.472812 (correct).
- DuckDB's ``round`` multiplies by 10^6 first; 43.472812499999996 * 1e6
  double-rounds to exactly 43472812.5, and half-away gives 43.472813.

The sf0.1 parity sweep (scripts/parity_sweep.py) caught three queries
flipping on exactly such boundary rows. Fix: quantize with pure IEEE-754
ops only — ``floor(x * 1e6 + 0.5) / 1e6``. Multiply, add, floor, and
divide are each bit-defined by IEEE-754, so given the same input double
both engines produce the same output double, boundary or not. (Half
values round toward +inf instead of away from zero; the convention is
irrelevant for parity as long as both sides share it.)

This protects against rounding-RULE divergence. If the input double
itself differs between engines (e.g. a different summation order
changing the last ulp of an avg), no quantization rule can help; keep
upstream arithmetic order-identical (exact integer/decimal sums where
possible — see ts_rolling_zscore's DECIMAL(18,6) pre-quantization).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALE = 1e6

# Pass-through bound: Spark's floor(double) returns LONG, so x * 1e6
# overflows past ~9.22e18 (Long.MAX) — NaN would become 0, +Inf would
# become ~9.22e12, and |x| > ~9.2e12 would saturate — while DuckDB's
# floor stays DOUBLE (NaN -> NaN, Inf -> Inf, big -> identity). Past
# this bound a double has < 6 fractional digits anyway, so BOTH engines
# pass the raw value through under the SAME predicate, keeping parity.
_PASS_ABS = 9.0e12


def qround6(col: Column) -> Column:
    """6-dp quantization of a double column using IEEE-only ops."""
    return F.when(
        F.isnan(col) | (F.abs(col) >= F.lit(_PASS_ABS)), col
    ).otherwise(F.floor(col * F.lit(_SCALE) + F.lit(0.5)) / F.lit(_SCALE))


def qround6_sql(expr: str) -> str:
    """The identical quantization as a DuckDB SQL fragment."""
    return (
        f"(CASE WHEN isnan({expr}) OR abs({expr}) >= 9.0e12 THEN ({expr}) "
        f"ELSE floor(({expr}) * 1e6 + 0.5) / 1e6 END)"
    )
