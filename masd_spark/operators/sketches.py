"""Mergeable sketches — the sublinear-state aggregates of a 100 TB engine.

Two families:

- Count-min sketch (CMS), built from scratch on md5-derived hashes so the
  DuckDB oracle reproduces every cell bit-for-bit: the sketch is a
  (depth x width) grid of ADDITIVE counters — partial sketches built per
  partition/day/shard merge by cell-wise sum, which is exactly Spark's
  partial+final agg shape. Point estimate = min over rows (classic
  Cormode-Muthukrishnan upper bound: never under, over only on
  collisions).
- HLL via Spark's built-in Apache DataSketches bindings
  (hll_sketch_agg / hll_union_agg / hll_sketch_estimate): distinct counts
  whose state is a few KB regardless of cardinality, mergeable across
  arbitrary splits. Estimates are engine-specific -> rows-only harness
  entry, accuracy and merge-consistency pinned by pytest instead.

Scale shapes: CMS build is one partial+final agg over depth x |input|
exploded rows with at most depth x width result cells; estimation joins
the (tiny, broadcastable) sketch to the distinct-keys side. Nothing here
holds per-key state proportional to cardinality — that is the point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 3
CMS_WIDTH = 128


def _cms_bucket(key: Column, row: int, width: int) -> Column:
    """Row-``row``'s hash bucket for ``key``: first 4 hex digits of
    md5('cms{row}:' || key) mod width — reproducible in ANSI SQL."""
    h = F.md5(F.concat(F.lit(f"cms{row}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % width


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch: (sketch_row, bucket, cnt) with at most
    depth x width rows. Counters are additive, so sketches over disjoint
    splits merge by summing cnt per cell (see tests) — the property that
    lets each executor/day/shard sketch independently.
    """
    buckets = F.array(
        *[_cms_bucket(F.col(key_col), i, width) for i in range(depth)]
    )
    return (
        df.select(F.posexplode(buckets).alias("sketch_row", "bucket"))
        .groupBy("sketch_row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate each key in ``keys``: min over sketch rows of the
    key's cell counter. The sketch is at most depth x width rows ->
    BROADCAST to the keys side; estimates upper-bound true counts.
    """
    buckets = F.array(
        *[_cms_bucket(F.col(key_col), i, width) for i in range(depth)]
    )
    probes = keys.select(
        key_col, F.posexplode(buckets).alias("sketch_row", "bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["sketch_row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("cms_estimate"))
    )


def cms_bucket_sql(expr: str, row: int, width: int = CMS_WIDTH) -> str:
    """DuckDB twin of :func:`_cms_bucket`."""
    from masd_spark.operators.sampling import md5_bucket_sql

    return md5_bucket_sql(expr, salt=f"cms{row}:", modulus=width)
