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
