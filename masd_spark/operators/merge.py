"""MERGE / upsert: reconcile a keyed base snapshot with a change feed.

The reference engine's sink is exactly this operation done row-at-a-time:
``replace_one(upsert=True)`` per document against MongoDB (reference:
spark-app/consumer.py:194-201 — last write per station wins). Here the
same semantics run as ONE relational job over arbitrarily large inputs:
tag both sides, union, and keep the winning row per key with a window —
a single shuffle on the merge key, no driver loop, no per-row round trip.

At 100 TB this is the standard "MERGE INTO without a table format"
pattern: the output is a full rewritten snapshot. With a transactional
table format (Delta/Iceberg) the same plan feeds MERGE INTO and only
touched files rewrite; the winning-row selection below is identical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    version_cols: Sequence[str],
) -> DataFrame:
    """Last-write-wins merge of ``updates`` into ``base``.

    Semantics (MERGE INTO t USING s):
    - key in both           -> the update row wins (WHEN MATCHED UPDATE)
    - key only in updates   -> inserted           (WHEN NOT MATCHED INSERT)
    - key only in base      -> kept unchanged
    - duplicate keys INSIDE ``updates`` are resolved by ``version_cols``
      (max wins; make the last version column a unique tiebreaker for a
      deterministic result).

    Both frames must share a schema. One hash shuffle on ``keys``; the
    window's sort is per-key over (occurrences of that key), so skew is
    bounded by the hottest key's change count, not table size.
    """
    if base.columns != updates.columns:
        raise ValueError(
            f"schema mismatch: base {base.columns} vs updates {updates.columns}"
        )
    tagged = base.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    # updates beat base regardless of version (MERGE semantics: the source
    # overrides a matched target row); versions order rows within a side.
    w = Window.partitionBy(*keys).orderBy(
        F.col("_src").desc(), *[F.col(c).desc() for c in version_cols]
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_src", "_rn")
    )
