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
            # stats can be absent (writer disabled them, or the type has
            # none) — report (None, None): that IS the "no pruning
            # possible" answer a layout-diagnostics helper exists to give
            if st is None:
                out.append((f.name, rg, None, None))
            else:
                out.append((f.name, rg, st.min, st.max))
    return out


def zvalue(a, b, bits: int = 16):
    """Morton (z-curve) value of two non-negative ints already scaled to
    ``[0, 2^bits)``: bit i of ``a`` lands at position 2i, bit i of ``b``
    at 2i+1. Pure shifts/masks -> whole-stage codegen, exact, portable.
    """
    from pyspark.sql import functions as F

    # operate in BIGINT: on an IntegerType operand, bit 15 of b would land
    # at position 31 and flip the 32-bit sign, clustering the top half of
    # the domain in the wrong order
    a = f"cast(({a}) as bigint)"
    b = f"cast(({b}) as bigint)"
    terms = []
    for i in range(bits):
        terms.append(F.expr(f"shiftleft((shiftright({a}, {i}) & 1), {2 * i})"))
        terms.append(
            F.expr(f"shiftleft((shiftright({b}, {i}) & 1), {2 * i + 1})")
        )
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Write parquet clustered on the z-curve of two columns.

    Empty input writes an empty schema-preserving table; NaN or an
    all-null column with rows present raises (no meaningful bounds).

    Unlike a lexicographic sort (first column fully clustered, second
    column's row-group windows span the whole domain), the z-curve
    interleaves both columns' bits, so row-group min/max windows are
    narrow on BOTH — band filters on either column skip row groups
    (Delta/Iceberg's OPTIMIZE ZORDER, expressed with vanilla Spark:
    scale both columns to 2^bits, range-partition + sort on the Morton
    value). Columns must be numeric; each is affinely scaled by its own
    min/max (two tiny driver scalars).
    """
    import math

    from pyspark.sql import functions as F

    lo_a, hi_a, lo_b, hi_b = df.select(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]
    if all(v is None for v in (lo_a, hi_a, lo_b, hi_b)):
        # empty input: a maintenance job over an empty partition writes
        # an empty (schema-preserving) table — no bounds needed, and no
        # reason to crash the pipeline. NaN / all-null-column inputs
        # with ROWS still raise below (z-values would be meaningless).
        df.write.mode("overwrite").parquet(path)
        return
    bad = [
        v
        for v in (lo_a, hi_a, lo_b, hi_b)
        if v is None or (isinstance(v, float) and math.isnan(v))
    ]
    if bad:
        # empty input (all-None bounds) would crash float(None) below;
        # NaN would interpolate the bare token 'nan' into the expression
        # and die later as an unresolvable column — fail loudly up front
        raise ValueError(
            f"write_zordered needs non-empty, NaN-free {col_a}/{col_b}: "
            f"got bounds {lo_a!r}, {hi_a!r}, {lo_b!r}, {hi_b!r}"
        )
    top = (1 << bits) - 1

    def scaled(col: str, lo, hi) -> str:
        span = float(hi) - float(lo) or 1.0
        return (
            f"least({top}, cast(floor((cast({col} as double) - {float(lo)})"
            f" / {span} * {top + 1}) as bigint))"
        )

    z = zvalue(scaled(col_a, lo_a, hi_a), scaled(col_b, lo_b, hi_b), bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_files(
    spark, src_path: str, dst_path: str, target_bytes: int = 128 << 20
) -> int:
    """Rewrite a parquet directory into ~``target_bytes``-sized files.

    The small-files problem is the quiet killer of big scans: every file
    costs a task, a footer read, and scheduler overhead, so a table that
    accumulated thousands of tiny micro-batch outputs scans 10-100x
    slower than the same bytes in right-sized files. Output file count =
    ceil(total_bytes / target_bytes) from the ACTUAL on-disk footprint
    (no guessing), written via repartition (round-robin, even sizes —
    coalesce would merge unevenly and can collapse parallelism upstream).
    Returns the file count written. Maintenance pass: one shuffle of the
    data being compacted. NOTE: the output is UNPARTITIONED — for a
    hive-partitioned table, run per partition directory (the read below
    would otherwise flatten the partition columns into the data files).
    """
    import math
    from pathlib import Path

    # rglob, matching the recursive partition discovery of the read below:
    # a non-recursive glob over a hive-partitioned table would find zero
    # top-level files and silently compact terabytes into ONE output file
    total = sum(f.stat().st_size for f in Path(src_path).rglob("*.parquet"))
    if total == 0:
        raise ValueError(f"no .parquet files found under {src_path}")
    n_files = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src_path)
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return n_files
