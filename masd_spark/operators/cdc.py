"""Change-data-capture operators: SCD2 validity intervals from change logs.

The reference engine (omartrj/MASD) persists only the latest rollup per
key; a warehouse consuming the same feed usually needs the *history* —
"what was this key's attribute over time" — i.e. a slowly-changing-
dimension type-2 table built from an append-only change log. This module
derives SCD2 validity intervals with two window passes (gaps-and-islands):
no self-join, no driver state, scales as one shuffle on the dimension key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    changes: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    tracked: str,
) -> DataFrame:
    """Collapse an append-only change log into SCD2 validity intervals.

    ``changes`` holds one row per observed state of ``tracked`` per key;
    ``order_by`` must be a deterministic total order within a key (include
    a unique tiebreaker column). Consecutive rows with an unchanged
    ``tracked`` value are collapsed into one interval; each emitted row is

    - ``version``      1-based interval ordinal within the key,
    - ``valid_from``   first ``order_by[0]`` of the interval,
    - ``valid_to``     next interval's ``valid_from`` (NULL = current),
    - ``is_current``   whether this is the key's latest interval.

    Plan shape: one hash-shuffle on ``keys``, two window passes over the
    SAME partitioning (change-point detection via ``lag``, interval close
    via ``lead``) — Spark reuses the exchange, so at 100 TB this costs a
    single shuffle of the change log and streams within each key.

    NULL semantics: a NULL tracked value is a real state; transitions
    NULL->x and x->NULL both open a new interval (null-safe comparison).
    A NULL in any ``order_by`` column, however, has no place in the
    version sequence (and would land at engine-dependent ends of it:
    Spark sorts NULLS FIRST ascending, standard SQL engines NULLS LAST)
    — those change rows are EXCLUDED; oracle twins filter identically.
    """
    for c in order_by:
        changes = changes.filter(F.col(c).isNotNull())
    w = Window.partitionBy(*keys).orderBy(*order_by)
    first_order = order_by[0]
    marked = changes.withColumn(
        "_chg",
        F.when(
            F.lag(tracked).over(w).eqNullSafe(F.col(tracked))
            & (F.row_number().over(w) > 1),
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    # row_number>1 guard: lag() is NULL on the first row, and NULL tracked
    # values would make eqNullSafe(NULL, NULL) true — the first row must
    # always open an interval.
    starts = marked.filter(F.col("_chg") == 1).drop("_chg")
    w2 = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        starts.withColumn("version", F.row_number().over(w2))
        .withColumn("valid_from", F.col(first_order))
        .withColumn("valid_to", F.lead(first_order).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
