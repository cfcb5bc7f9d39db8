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
