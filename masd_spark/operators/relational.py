"""Relational operators beyond the reference's surface.

The reference contains no joins, analytic windows, sorts, or set ops
(SURVEY.md §2.3/2.5/2.6/2.7 — verified ABSENT); its design avoids them by
denormalizing station metadata into every message. A general engine needs
them, and they're all built-in Spark — these helpers only add the
composition patterns Spark lacks as single calls.

Scale notes are per function; none of them uses a Python UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence,
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group via row_number.

    Scale: one shuffle on the partition keys; Spark's WindowExec sorts
    within partitions only. For heavily skewed groups with tiny k, a
    pre-aggregation (AQE skew split) keeps partitions bounded. Always pass
    a unique tiebreaker in ``order_cols`` — top-k without total order is
    nondeterministic.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    time_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event for the same key exceeds ``gap_seconds``.

    Classic lag + cumulative-sum-of-boundaries pattern — one shuffle on the
    key, no state, no UDF. The streaming twin is ``F.session_window``
    (see masd_spark/streaming/pipeline.py).

    Invalid-input contract: a row with a NULL time cannot be placed on the
    timeline and is EXCLUDED — the same thing Spark's native
    ``F.session_window`` does with a null event time. (Where the row
    lands would otherwise be an engine artifact: Spark windows default to
    NULLS FIRST ascending, DuckDB to NULLS LAST, so the null rows would
    open or extend different sessions in each engine.) NULL keys are kept:
    both engines' PARTITION BY group them into one "anonymous" key.
    """
    df = df.filter(F.col(time_col).isNotNull())
    w = Window.partitionBy(key_col).orderBy(time_col)
    prev_ts = F.lag(F.col(time_col)).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col(time_col).cast("double") - prev_ts.cast("double") > gap_seconds),
        1,
    ).otherwise(0)
    return df.withColumn("_new_session", is_new).withColumn(
        session_col,
        F.sum("_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("_new_session")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """As-of join: for each left row, attach the latest right row with
    ``right_time <= left_time`` within the same key (null if none).

    Spark has no native as-of join; the scalable composition is the
    union-and-carry-forward pattern: tag both sides, union, sort by
    (key, time, side) and carry the right side's values forward with
    ``last(..., ignorenulls=True)``. ONE shuffle on the key and no
    pairwise explosion — unlike the naive range-join (left x right filter
    + max), which is quadratic per key. This is the 100 TB path; an
    ``applyInPandas``+``merge_asof`` variant would move every row through
    Python for no semantic gain.

    PRECONDITION: the right side must be unique per (``key_col``,
    ``right_time``). The carry-forward window orders only by
    ``(_t, _side)``, so duplicate right rows at one (key, time) tie in the
    sort and whichever the partition happens to order last wins —
    partition-order nondeterminism, not an error. Callers with possible
    duplicates (e.g. SCD2 starts from same-timestamp change rows) must
    collapse them under a deterministic rule first; see
    ``pit_scd2_priority_at_ship`` (queries/warehouse.py) for the pattern.

    Invalid-input contract: a row with a NULL key or NULL time has no
    place on the (key, timeline) plane and is EXCLUDED from both sides.
    There is no portable keep-them semantics — Spark's partitionBy groups
    null keys together (null "users" would as-of-match each other) while
    SQL join equality never matches NULL, and DuckDB's sort-based ASOF
    treats a NULL left time as +infinity (matches the latest right row)
    where a predicate evaluation would say no-match. Oracle twins carry
    the same ``key IS NOT NULL AND time IS NOT NULL`` filters.
    """
    left = left.filter(F.col(key_col).isNotNull() & F.col(left_time).isNotNull())
    right = right.filter(F.col(key_col).isNotNull() & F.col(right_time).isNotNull())
    lcols = left.columns
    # The right payload travels as ONE struct, not as bare columns: the
    # carry-forward below uses last(..., ignorenulls=True) to skip LEFT
    # rows' placeholders, and a bare null-valued field on a real right row
    # would be skipped too — reaching back past the latest right row to an
    # older one's value. The per-row struct is never null, so ignorenulls
    # skips exactly the left placeholders and "latest right ROW" semantics
    # hold even when that row's fields are null.
    tagged_left = left.select(
        F.col(key_col).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_left"),
        F.lit(None).cast(right.select(*value_cols).schema).alias("_rv"),
    )
    tagged_right = right.select(
        F.col(key_col).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            tagged_left.schema["_left"].dataType
        ).alias("_left"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_rv"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    # right rows (_side=0) sort before left rows at equal time -> a right row
    # AT the left row's timestamp is visible to it ("<=" semantics).
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_side",
        "_left",
        F.last(F.col("_rv"), ignorenulls=True).over(w).alias("_rv"),
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_left.{c}").alias(c) for c in lcols],
        *[F.col(f"_rv.{c}").alias(f"asof_{c}") for c in value_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    radius: int,
) -> DataFrame:
    """Band/range join: all (left, right) pairs with the same keys and
    ``|left_ts - right_ts| <= radius`` (timestamps and radius in the same
    integer unit, e.g. epoch-ms).

    A naive theta-join on the interval predicate plans as a nested loop
    (all pairs per key). The scale shape is bin-and-probe: the right side
    gets one bin row (``ts div radius``), the left side probes its own bin
    and both neighbors (3 rows), the join is EQUI on (keys, bin), and the
    exact interval predicate filters the candidates. Any qualifying pair
    shares a probed bin (|Δ| <= radius spans at most one bin boundary),
    and each pair meets exactly once (the right row has one bin) — exact
    result, no distinct needed, join work bounded by bin occupancy.
    Inner join only: the probe explosion would triple null-extension rows
    of an outer join.
    """
    r = right.withColumn("_bin", F.expr(f"{right_ts} div {radius}"))
    probes = F.array(
        *[F.expr(f"{left_ts} div {radius} + ({d})") for d in (-1, 0, 1)]
    )
    joined = left.withColumn("_bin", F.explode(probes)).join(r, [*on, "_bin"])
    return joined.filter(
        F.abs(F.col(left_ts) - F.col(right_ts)) <= radius
    ).drop("_bin")
