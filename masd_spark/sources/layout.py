"""Data-layout operators: range-sorted parquet writes for scan pruning.

At 100 TB the cheapest query is the one that never reads the data: parquet
row-group min/max statistics let a filtered scan skip whole row groups —
but only if the layout clusters the filter column. ``write_range_sorted``
produces that layout with two Spark primitives:

- ``repartitionByRange(n, col)`` — range-partitions rows so each output
  file owns a disjoint slice of the sort key's domain (sampled range
  bounds; one shuffle), and
- ``sortWithinPartitions(col)`` — orders rows inside each file so every
  ROW GROUP (not just file) gets a tight min/max window.

A reader filtering ``col BETWEEN a AND b`` then prunes both at file
granularity (partition-level stats) and row-group granularity. The layout
invariants — disjoint file ranges, monotone row-group stats — are
asserted against the actual parquet footers in tests/test_layout.py,
and the skip effect is visible in scan metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_range_sorted(
    df: DataFrame, path: str, col: str, n_files: int
) -> None:
    """Write ``df`` as parquet range-clustered and sorted on ``col``."""
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def row_group_stats(path: str, col: str) -> list[tuple[str, int, object, object]]:
    """(file, row_group_index, min, max) for every row group under
    ``path`` — read from the parquet footers via pyarrow, i.e. the same
    statistics a Spark scan consults when deciding what to skip."""
    from pathlib import Path

    import pyarrow.parquet as pq

    out = []
    for f in sorted(Path(path).glob("*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = names[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            out.append((f.name, rg, st.min, st.max))
    return out
