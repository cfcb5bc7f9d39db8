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


def mg_merge(counters: dict, add, k: int) -> dict:
    """Merge (key, count) pairs into a Misra-Gries summary of <= k
    counters: add, then subtract the (k+1)-th largest count from every
    counter and drop non-positives (the Mergeable Summaries merge, which
    caps the total decrement any key ever absorbs at n/(k+1)). Pure —
    the MG guarantee is property-tested directly on this function
    (tests/test_properties.py)."""
    for key, cnt in add:
        counters[key] = counters.get(key, 0) + int(cnt)
    if len(counters) > k:
        cut = sorted(counters.values(), reverse=True)[k]
        counters = {key: c - cut for key, c in counters.items() if c - cut > 0}
    return counters


def mg_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries candidate keys (<= k rows per partition).

    One Arrow pass per partition holding at most k counters: each batch is
    pre-aggregated with value_counts (vectorized), merged into the running
    summary, then the summary is shrunk back to k entries by subtracting
    the (k+1)-th largest count and dropping non-positives — the mergeable-
    summaries MG merge (Agarwal et al., "Mergeable Summaries", PODS'12),
    which preserves the deterministic guarantee: any key with true
    partition frequency > n_p / k survives in that partition's output.
    By pigeonhole, any key with GLOBAL frequency > n / k therefore appears
    in at least one partition's candidates — the recall contract
    :func:`heavy_keys` builds on. State is O(k) per partition regardless
    of input size or cardinality; that is the point.
    """
    import pandas as pd

    field = df.schema[key_col]

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            vc = pdf[key_col].value_counts(dropna=True)
            counters = mg_merge(counters, vc.items(), k)
        if counters:
            yield pd.DataFrame({key_col: list(counters.keys())})

    return df.select(key_col).mapInPandas(
        summarize, schema=f"{key_col} {field.dataType.simpleString()}"
    )


def heavy_keys(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """EXACT heavy hitters — every key with frequency > n/k — via the
    two-pass shape that scales: pass 1 generates candidates with bounded
    state (:func:`mg_candidates`, a superset of the answer by the MG
    guarantee); pass 2 exactly recounts CANDIDATES ONLY (a broadcast
    semi-join — at most k x n_partitions keys — then one partial+final
    agg) and keeps those above the global threshold. The output is
    therefore partitioning-INDEPENDENT even though the intermediate
    candidate set is not: plain GROUP BY HAVING count * k > n is a true
    oracle. The global n rides in as a 1-row scalar aggregate crossJoin.

    Invalid-input contract: NULL keys are excluded — they carry no
    identity to attribute frequency to, value_counts cannot track them,
    and the candidate semi-join's equality would silently drop them
    anyway. n counts only non-null-key rows; oracle twins filter
    identically (a bare GROUP BY would otherwise surface the null group).
    """
    df = df.filter(F.col(key_col).isNotNull())
    cands = mg_candidates(df, key_col, k).distinct()
    total = df.agg(F.count("*").alias("_n"))
    return (
        df.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("_n"))
        .select(key_col, "cnt")
    )
