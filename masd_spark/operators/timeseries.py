"""Time-series regularization: resampling, gap fill, gap detection.

The reference aggregates sensor readings into fixed windows but emits
NOTHING for windows with no data (consumer.py's windowed agg only sees
arriving rows) — downstream consumers of a telemetry table usually need a
dense, regular grid with explicit carried-forward values. These operators
densify in pure DataFrame algebra; everything is reproducible in ANSI SQL
(the DuckDB oracle recomputes the same grids).

Scale shapes: the grid explode is bounded by (span / step) rows per key —
output-proportional, computed from a 3-column agg, never a cross join
against a calendar table. Fill + gap detection are single window passes
keyed by the series key: one shuffle each, partial-agg friendly. Skewed
series (one key spanning years at second granularity) surface as big
per-key grids — cap with the ``max_buckets`` guard rather than OOMing a
task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from masd_spark.functions.quantize import qround6


def resample_gap_fill(
    df: DataFrame,
    key_cols: list[str],
    ts_ms_col: str,
    value_col: str,
    step_ms: int,
    max_buckets: int = 1_000_000,
) -> DataFrame:
    """Resample each key's series onto a regular ``step_ms`` grid spanning
    its own [min, max] bucket range, averaging observations within a
    bucket and FORWARD-FILLING empty buckets from the last observed value.

    Returns key_cols + bucket_ms, value_filled (6-dp rounded), is_observed.
    The first buckets of a key are observed by construction (grid starts
    at the key's first observation). A key whose grid would exceed
    ``max_buckets`` buckets raises — that's a data bug (mixed units,
    corrupt timestamp), not a resampling job.
    """
    # exact integer bucket floor (double division could misround at
    # bucket boundaries for large epoch values)
    bucket = F.col(ts_ms_col) - (F.col(ts_ms_col) % step_ms)
    observed = (
        df.withColumn("_b", bucket)
        .groupBy(*key_cols, "_b")
        .agg(F.avg(value_col).alias("_v"))
    )
    spans = observed.groupBy(*key_cols).agg(
        F.min("_b").alias("_mn"), F.max("_b").alias("_mx")
    )
    too_big = spans.filter(
        (F.col("_mx") - F.col("_mn")) / step_ms >= max_buckets
    )
    if too_big.limit(1).count() > 0:
        bad = too_big.select(*key_cols).limit(3).collect()
        raise ValueError(
            f"resample span exceeds max_buckets={max_buckets} for keys {bad}; "
            "suspect timestamp corruption or wrong step_ms"
        )
    grid = spans.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("_mn"), F.col("_mx"), F.lit(step_ms))
        ).alias("bucket_ms"),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket_ms")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(
            observed.withColumnRenamed("_b", "bucket_ms"),
            [*key_cols, "bucket_ms"],
            "left",
        )
        .withColumn("is_observed", F.col("_v").isNotNull())
        .withColumn(
            "value_filled", qround6(F.last("_v", ignorenulls=True).over(w))
        )
        .drop("_v")
    )


def resample_interpolate(
    df: DataFrame,
    key_cols: list[str],
    ts_ms_col: str,
    value_col: str,
    step_ms: int,
    max_buckets: int = 1_000_000,
) -> DataFrame:
    """Resample each key's series onto a regular ``step_ms`` grid with
    LINEAR interpolation across empty buckets (vs the carry-forward hold
    of :func:`resample_gap_fill`) — the reconstruction a telemetry
    consumer wants for a continuously varying quantity, where a
    forward-fill draws staircases through real slopes.

    Semantics per empty bucket: the value is lerped between the nearest
    observed bucket averages on either side,
    ``prev + (next - prev) * (t - t_prev) / (t_next - t_prev)``; buckets
    after a key's last observation hold the last value (no extrapolation);
    leading buckets are observed by construction (the grid starts at the
    key's first observation). Bucket averages are quantized to 6 dp
    BEFORE interpolation (functions/quantize.py:qround6 — IEEE-only ops,
    identical in Spark and DuckDB) so both engines lerp from identical
    anchors, and the lerp is written with the same operation order in
    the oracle SQL — float parity by construction, not luck.

    Scale: same shape as resample_gap_fill — a 3-column span agg bounds
    the grid explode, then TWO window passes (previous / next anchor)
    over the same key partitioning: one shuffle, no self-join against
    the observation set. Returns key_cols + bucket_ms, value_interp,
    is_observed.
    """
    bucket = F.col(ts_ms_col) - (F.col(ts_ms_col) % step_ms)
    observed = (
        df.withColumn("_b", bucket)
        .groupBy(*key_cols, "_b")
        .agg(qround6(F.avg(value_col)).alias("_v"))
    )
    spans = observed.groupBy(*key_cols).agg(
        F.min("_b").alias("_mn"), F.max("_b").alias("_mx")
    )
    too_big = spans.filter(
        (F.col("_mx") - F.col("_mn")) / step_ms >= max_buckets
    )
    if too_big.limit(1).count() > 0:
        bad = too_big.select(*key_cols).limit(3).collect()
        raise ValueError(
            f"resample span exceeds max_buckets={max_buckets} for keys {bad}; "
            "suspect timestamp corruption or wrong step_ms"
        )
    grid = spans.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("_mn"), F.col("_mx"), F.lit(step_ms))
        ).alias("bucket_ms"),
    )
    w_prev = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket_ms")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket_ms")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_bucket = F.when(F.col("_v").isNotNull(), F.col("bucket_ms"))
    joined = (
        grid.join(
            observed.withColumnRenamed("_b", "bucket_ms"),
            [*key_cols, "bucket_ms"],
            "left",
        )
        .withColumn("is_observed", F.col("_v").isNotNull())
        .withColumn("_pv", F.last("_v", ignorenulls=True).over(w_prev))
        .withColumn("_pt", F.last(obs_bucket, ignorenulls=True).over(w_prev))
        .withColumn("_nv", F.first("_v", ignorenulls=True).over(w_next))
        .withColumn("_nt", F.first(obs_bucket, ignorenulls=True).over(w_next))
    )
    lerp = F.col("_pv") + (F.col("_nv") - F.col("_pv")) * (
        (F.col("bucket_ms") - F.col("_pt"))
        / (F.col("_nt") - F.col("_pt"))
    )
    return joined.withColumn(
        "value_interp",
        qround6(
            F.when(F.col("is_observed"), F.col("_v"))
            .when(F.col("_nv").isNull(), F.col("_pv"))
            .otherwise(lerp)
        ),
    ).drop("_v", "_pv", "_pt", "_nv", "_nt")


def detect_gaps(
    df: DataFrame,
    key_cols: list[str],
    ts_ms_col: str,
    min_gap_ms: int,
) -> DataFrame:
    """Report every gap of at least ``min_gap_ms`` between consecutive
    observations of a key: key_cols + gap_start_ms (last seen), gap_end_ms
    (next seen), gap_ms. One window pass over the key-partitioned sort —
    the monitoring query behind 'sensor went dark for an hour'.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_ms_col)
    return (
        df.select(
            *key_cols,
            F.col(ts_ms_col).alias("gap_start_ms"),
            F.lead(ts_ms_col).over(w).alias("gap_end_ms"),
        )
        .withColumn("gap_ms", F.col("gap_end_ms") - F.col("gap_start_ms"))
        .filter(F.col("gap_ms") >= min_gap_ms)
    )


def rolling_zscore(
    df: DataFrame,
    key_cols: list[str],
    ts_ms_col: str,
    value_col: str,
    window_ms: int,
    min_obs: int = 10,
    numerics: str = "native",
) -> DataFrame:
    """Anomaly score: each observation's z-score against the TRAILING
    ``window_ms`` of its own series (frame excludes the current row, so a
    spike can't mask itself). Rows with fewer than ``min_obs`` prior
    observations or non-positive variance get null z. One RANGE-frame
    window pass over the key-partitioned time sort — single shuffle, no
    self-join.

    ``numerics='native'`` uses Spark's stddev_samp (Welford; the
    production path — last-ULP results are engine/fold-order specific).
    ``numerics='portable'`` derives mean/stddev from DECIMAL(18,6)-
    quantized window sums, so any engine computing the same formula on
    the same frame gets bit-identical doubles — the repo's standard
    cross-engine parity trick (see queries/__init__.py); a test pins the
    two modes to ~1e-9 agreement.
    """
    if min_obs < 2:
        raise ValueError("min_obs must be >= 2 (sample stddev needs n > 1)")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_ms_col)
        .rangeBetween(-window_ms, -1)
    )
    n = F.count("*").over(w)
    if numerics == "portable":
        vq = F.col(value_col).cast("decimal(18,6)")
        s1 = F.sum(vq).over(w).cast("double")
        s2 = F.sum(vq * vq).over(w).cast("double")
        var = (s2 - s1 * s1 / n) / (n - 1)
        z = F.when(
            n >= min_obs,
            F.when(var > 0, (F.col(value_col) - s1 / n) / F.sqrt(var)),
        )
    elif numerics == "native":
        m = F.avg(value_col).over(w)
        sd = F.stddev_samp(value_col).over(w)
        z = F.when(n >= min_obs, F.when(sd > 0, (F.col(value_col) - m) / sd))
    else:
        raise ValueError(f"numerics must be 'native' or 'portable', got {numerics!r}")
    return df.withColumn("z", z)
