"""Vector (embedding) column expressions — built-in higher-order functions,
JVM-side, no UDFs.

Embeddings are ``array<float>`` columns (fixture: embeddings.embedding,
dim 64). All math is done in double (cast per element) so results match
engines that compute in double (e.g. DuckDB's list_cosine_similarity) and
don't depend on float accumulation order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product via zip_with + aggregate (sequential sum —
    deterministic order, matches a scalar loop)."""
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null-safe only insofar as inputs are non-empty."""
    return dot(a, b) / (norm(a) * norm(b))


# --- fixed-dimension variants -------------------------------------------
# The higher-order aggregate/zip_with functions above are interpreted per
# element (no codegen) — fine for occasional use, ~10x too slow in a
# pairwise hot path. When the dimension is known statically, unroll to an
# explicit left-fold sum: whole-stage codegen compiles it to straight-line
# JVM code, and the accumulation order (left-to-right) is identical to the
# sequential loop, so results stay bit-exact with the HOF versions and
# with engines that loop (e.g. the DuckDB oracle).


def _unrolled_sum(terms: list[Column]) -> Column:
    acc = terms[0]
    for term in terms[1:]:
        acc = acc + term
    return acc


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    return _unrolled_sum(
        [
            F.element_at(a, i + 1).cast("double") * F.element_at(b, i + 1).cast("double")
            for i in range(dim)
        ]
    )


def dot_literal(a: Column, weights: list[float]) -> Column:
    """Dot of a vector column with a Python-side constant vector — the
    constants fold into the codegen'd expression (LSH hyperplanes)."""
    return _unrolled_sum(
        [
            F.element_at(a, i + 1).cast("double") * F.lit(w)
            for i, w in enumerate(weights)
        ]
    )


def norm_fixed(a: Column, dim: int) -> Column:
    sq = [
        F.element_at(a, i + 1).cast("double") * F.element_at(a, i + 1).cast("double")
        for i in range(dim)
    ]
    return F.sqrt(_unrolled_sum(sq))


def cosine_fixed(a: Column, b: Column, dim: int) -> Column:
    return dot_fixed(a, b, dim) / (norm_fixed(a, dim) * norm_fixed(b, dim))


# --- int8 scalar quantization -------------------------------------------
# Per-vector symmetric quantization: q_i = round(x_i * 127/max|x|). Cosine
# is invariant to per-vector positive scaling, so cos(q_a, q_b) tracks
# cos(a, b) up to rounding noise — 4x smaller vectors (int8 at rest) and
# integer dot products in the hot loop. Quantized values are carried as
# array<bigint> in-flight (storage would pack to tinyint/binary); every
# step below is exact integer or IEEE-deterministic double math, so the
# whole pipeline is bit-reproducible cross-engine (oracle-checkable).


def quantize_int8(a: Column) -> Column:
    """array<float> -> array<bigint> with values in [-127, 127]; an
    all-zero vector quantizes to all zeros (scale guard)."""
    ma = F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))
    scale = F.when(ma > 0, F.lit(127.0) / ma).otherwise(F.lit(0.0))
    return F.transform(
        a, lambda x: F.round(x.cast("double") * scale).cast("long")
    )


def dot_fixed_long(a: Column, b: Column, dim: int) -> Column:
    """Unrolled integer dot product (codegen straight-line, exact)."""
    return _unrolled_sum(
        [F.element_at(a, i + 1) * F.element_at(b, i + 1) for i in range(dim)]
    )
