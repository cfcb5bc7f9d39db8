"""Bloom-filter pre-filtered semi-join.

The classic 100 TB join problem: the dimension side is too big to
broadcast, so a semi-join shuffles the ENTIRE fact table even though
only a few percent of its rows survive. A Bloom filter fixes the
asymmetry: build a k-hash bitset over the dimension keys (a few KB-MB
regardless of row count — it aggregates map-side and merges by OR),
broadcast the bitset, and drop non-matching fact rows BEFORE the
exchange. Rows that pass (including the ~fpp false positives) still go
through the exact join, so the result is exactly the semi-join — the
bloom stage only cuts shuffled bytes.

Spark 3.3+ can inject this automatically
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) but only for
selective filters it can see at plan time; this operator is the explicit
version for engine surface area and for dim-side predicates the
optimizer can't cost (UDMs, pre-aggregated dims).

Everything is built-in JVM expressions (xxhash64, shifts, bit_or) —
whole-stage codegen, no Python in the row path. ``n_bits`` must be a
power of two (positions come from ``hash & (n_bits-1)``, which also
keeps the sign bit out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORDS_COL = "_bloom_words"


def _pos_expr(key: str, seed: int, n_bits: int) -> str:
    """Bit position of one hash probe as a SQL expr (non-negative:
    n_bits is a power of two, so the mask clears the sign bit)."""
    return f"(xxhash64({key}, {seed}) & {n_bits - 1})"


def bloom_build(dim: DataFrame, key: str, n_bits: int, n_hashes: int) -> DataFrame:
    """One-row DataFrame holding the filter as ``array<bigint>`` words.

    Per input row: k positions -> (word, bit) pairs; ``bit_or`` per word
    is a partial+final aggregate (the sketch merges by OR, so each
    executor ships at most ``n_bits/64`` longs); the dense word array is
    assembled from the sparse (word -> bits) map with zero-fill.
    """
    if n_bits & (n_bits - 1):
        raise ValueError(f"n_bits must be a power of two, got {n_bits}")
    n_words = n_bits // 64
    probes = F.array(
        *[F.expr(_pos_expr(key, s, n_bits)) for s in range(n_hashes)]
    )
    sparse = (
        dim.select(F.explode(probes).alias("_pos"))
        .select(
            F.expr("shiftright(_pos, 6)").alias("_word"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast((_pos & 63) as int))"
            ).alias("_bit"),
        )
        .groupBy("_word")
        .agg(F.expr("bit_or(_bit)").alias("_bits"))
    )
    return sparse.agg(
        F.map_from_arrays(
            F.collect_list("_word"), F.collect_list("_bits")
        ).alias("_m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("_m"), i.cast("long")), F.lit(0).cast("long")
            ),
        ).alias(_WORDS_COL)
    )


def bloom_might_contain(key: str, n_bits: int, n_hashes: int):
    """Conjunctive bit-test predicate over the broadcast words column."""
    tests = []
    for s in range(n_hashes):
        pos = _pos_expr(key, s, n_bits)
        tests.append(
            f"((shiftright(element_at({_WORDS_COL}, "
            f"cast(shiftright({pos}, 6) as int) + 1), "
            f"cast(({pos} & 63) as int)) & 1) = 1)"
        )
    return F.expr(" AND ".join(tests))


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """Exact ``fact LEFT SEMI JOIN dim`` with a Bloom pre-filter.

    The bitset rides to every fact task as a broadcast single-row cross
    join (a few KB; the crossJoin is 1 x N, not a real cross product),
    the bit-test filter runs inside the fact scan stage — BEFORE the
    join exchange — and the surviving rows flow into the exact semi-join,
    which removes false positives. With load factor
    ``n_hashes * |dim| / n_bits`` ~ 0.14 the false-positive rate is
    ~0.2%, i.e. shuffled fact bytes shrink to (selectivity + 0.002) of
    the input.
    """
    # Evaluate the bloom build eagerly and inline the words as a LITERAL
    # (Spark's own runtime bloom filters execute the build as a scalar
    # subquery and inline the result the same way). Shipping it as a
    # broadcast 1-row cross join instead looks equivalent but is not:
    # Catalyst's PushLeftSemiThroughJoin rule pushes the final semi-join
    # below the cross join, shuffling the UNFILTERED fact — the literal
    # keeps the probe a plain scan-stage filter that stays below the join.
    # The collected state is n_bits/64 longs (8 KB at the default) —
    # size-independent of dim row count, same driver footprint class as a
    # broadcast variable.
    words = bloom_build(dim, dim_key, n_bits, n_hashes).collect()[0][0]
    # The cast is LOAD-BEARING (round-6 SF1 false-negative bug): when the
    # filter saturates, every 64-bit word happens to fit int32 (a dense
    # word is -1), PySpark's lit() then infers array<INT>, and the probe's
    # shiftright(int, bit) masks the shift amount mod 32 (Java int-shift
    # semantics) — silently testing the WRONG bit and dropping true keys.
    # A sparse filter has large word values, infers array<bigint>, and
    # hides the bug — it only fires once the dim outgrows the bitset.
    pre = (
        fact.withColumn(_WORDS_COL, F.lit(words).cast("array<bigint>"))
        .filter(bloom_might_contain(fact_key, n_bits, n_hashes))
        .drop(_WORDS_COL)
    )
    cond = pre[fact_key] == dim[dim_key]
    return pre.join(dim, cond, "left_semi")
