"""Oracle parity + invariants for time-series resampling/gap detection."""

import pytest
from pyspark.sql import functions as F

from masd_spark.operators.timeseries import resample_gap_fill
from masd_spark.queries import load_all
from masd_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE
from tests.oracle import compare_query

REGISTRY = load_all()


@pytest.mark.parametrize(
    "name",
    [
        "ts_resample_ffill_hourly",
        "ts_detect_gaps",
        "ts_rolling_zscore",
        "ts_interpolate_linear_hourly",
        "ts_seasonal_residuals",
        "ts_autocorrelation",
    ],
)
def test_oracle_parity(spark, name):
    compare_query(spark, REGISTRY[name], SF_ORACLE)


def test_autocorrelation_semantics(spark):
    """ACF is bounded to [-1, 1], one row per (type, lag), and a planted
    perfectly-periodic series yields ACF ~ 1 at its period."""
    out = REGISTRY["ts_autocorrelation"].fn(spark, SF_ORACLE).collect()
    assert len(out) == 5 * 3  # 5 event types x lags 1..3
    for r in out:
        assert -1.0 <= r["acf"] <= 1.0, r


def test_seasonal_residuals_semantics(spark):
    """Per-cell residuals must average ~0 (the profile is the cell mean),
    anomalies are rare but present, and flags respect the 3-sigma rule."""
    df = REGISTRY["ts_seasonal_residuals"].fn(spark, SF_ORACLE).cache()
    try:
        n = df.count()
        n_anom = df.filter("is_anomaly").count()
        assert 0 < n_anom < 0.05 * n, (n_anom, n)
        worst_cell_mean = (
            df.groupBy("event_type", "hod")
            .agg(F.abs(F.avg("residual")).alias("m"))
            .agg(F.max("m").alias("mm"))
            .collect()[0]["mm"]
        )
        assert worst_cell_mean < 1e-4, worst_cell_mean
    finally:
        df.unpersist()


def test_interpolation_invariants(spark):
    """Interpolated values sit strictly between their anchors; observed
    rows match the ffill twin; the grid is identical to ffill's."""
    from masd_spark.operators.timeseries import (
        resample_gap_fill,
        resample_interpolate,
    )

    ev = (
        load_table(spark, SF_ORACLE, "events")
        .select(
            "event_type",
            F.expr("ts div 1000000").alias("ts_ms"),
            "value",
        )
        .filter(F.col("event_type").isNotNull())
    )
    hour = 3_600_000
    interp = resample_interpolate(
        ev, ["event_type"], "ts_ms", "value", step_ms=hour
    )
    ffill = resample_gap_fill(ev, ["event_type"], "ts_ms", "value", step_ms=hour)
    rows = {
        (r["event_type"], r["bucket_ms"]): r for r in interp.collect()
    }
    frows = {
        (r["event_type"], r["bucket_ms"]): r for r in ffill.collect()
    }
    assert rows.keys() == frows.keys()
    n_gap = 0
    # group rows per key in bucket order to find each gap's anchors
    by_key: dict = {}
    for (k, b), r in rows.items():
        by_key.setdefault(k, []).append((b, r))
    for k, series in by_key.items():
        series.sort()
        prev_obs = None
        for i, (b, r) in enumerate(series):
            if r["is_observed"]:
                prev_obs = (b, r["value_interp"])
                # observed rows: ffill twin agrees (same bucket average)
                assert abs(r["value_interp"] - frows[(k, b)]["value_filled"]) < 1e-9
            else:
                n_gap += 1
                nxt = next(
                    ((b2, r2) for b2, r2 in series[i + 1 :] if r2["is_observed"]),
                    None,
                )
                assert prev_obs is not None  # grid starts on an observation
                if nxt is not None:
                    lo = min(prev_obs[1], nxt[1]["value_interp"])
                    hi = max(prev_obs[1], nxt[1]["value_interp"])
                    assert lo - 1e-6 <= r["value_interp"] <= hi + 1e-6
                else:
                    assert abs(r["value_interp"] - prev_obs[1]) < 1e-9
    assert n_gap > 0  # fixture exercises the interpolation path


def test_rolling_zscore_native_matches_portable(spark):
    """The production (Welford stddev) and parity (decimal-sum) numerics
    must agree to float noise — they are the same statistic."""
    from masd_spark.operators.timeseries import rolling_zscore

    ev = (
        load_table(spark, SF_ORACLE, "events")
        .select("event_type", F.expr("ts div 1000000").alias("ts_ms"), "value")
        .groupBy("event_type", "ts_ms")
        .agg(F.min("value").alias("value"))
    )
    kw = dict(window_ms=6 * 3_600_000, min_obs=10)
    nat = rolling_zscore(ev, ["event_type"], "ts_ms", "value", **kw)
    por = rolling_zscore(
        ev, ["event_type"], "ts_ms", "value", numerics="portable", **kw
    )
    j = nat.withColumnRenamed("z", "z_nat").join(
        por.withColumnRenamed("z", "z_por"), ["event_type", "ts_ms", "value"]
    )
    stats = j.agg(
        F.count("*").alias("n"),
        F.sum(F.col("z_nat").isNull().cast("int")).alias("null_nat"),
        F.sum(F.col("z_por").isNull().cast("int")).alias("null_por"),
        F.max(F.abs(F.col("z_nat") - F.col("z_por"))).alias("max_diff"),
        F.sum(F.col("z_nat").isNotNull().cast("int")).alias("n_scored"),
    ).collect()[0]
    assert stats["null_nat"] == stats["null_por"]
    assert stats["n_scored"] > 0, "fixture produced no scored rows"
    assert stats["max_diff"] < 1e-9


def test_rolling_zscore_frame_excludes_current_row(spark):
    """A lone spike after a flat warm-up must score, and its own value
    cannot deflate the trailing stats: flat prefix => sd==0 => null z for
    flat rows, while the spike row scores against the flat window only if
    variance>0 — inject slight jitter to pin the exact z."""
    rows = [("k", i * 1000, 10.0 + (0.5 if i % 2 else -0.5)) for i in range(20)]
    rows.append(("k", 20_000, 100.0))
    df = spark.createDataFrame(rows, "key string, ts_ms long, value double")
    from masd_spark.operators.timeseries import rolling_zscore

    out = rolling_zscore(
        df, ["key"], "ts_ms", "value", window_ms=60_000, min_obs=10
    )
    spike = out.filter(F.col("value") == 100.0).collect()[0]
    # trailing 20 obs: mean 10, sample sd of +-0.5 alternation
    import statistics

    vals = [v for _, _, v in rows[:20]]
    expect = (100.0 - statistics.mean(vals)) / statistics.stdev(vals)
    assert spike["z"] == pytest.approx(expect, rel=1e-9)


def test_resample_grid_is_dense_and_filled(spark):
    """Each key's grid is contiguous at the step; some buckets are truly
    unobserved (the fill path is exercised) and every unobserved bucket
    carries a non-null forward-filled value."""
    out = REGISTRY["ts_resample_ffill_hourly"].fn(spark, SF_ORACLE).cache()
    try:
        spans = out.groupBy("event_type").agg(
            F.count("*").alias("n"),
            ((F.max("bucket_ms") - F.min("bucket_ms")) / 3_600_000 + 1).alias(
                "expected"
            ),
        )
        assert spans.filter(F.col("n") != F.col("expected")).count() == 0
        unobserved = out.filter(~F.col("is_observed"))
        assert unobserved.count() > 0
        assert unobserved.filter(F.col("value_filled").isNull()).count() == 0
    finally:
        out.unpersist()


def test_resample_max_buckets_guard(spark):
    ev = load_table(spark, SF_ORACLE, "events").select(
        "event_type", F.expr("ts div 1000000").alias("ts_ms"), "value"
    )
    with pytest.raises(ValueError, match="max_buckets"):
        resample_gap_fill(
            ev, ["event_type"], "ts_ms", "value", step_ms=1, max_buckets=1000
        )


def test_resample_single_window_shuffle(spark):
    """The fill stage must reuse the grid's key partitioning — exactly
    one extra shuffle class beyond the observed/spans aggregation (no
    per-bucket join shuffle storm)."""
    from masd_spark.plans.explain import count_exchanges

    ev = load_table(spark, SF_ORACLE, "events").select(
        "event_type", F.expr("ts div 1000000").alias("ts_ms"), "value"
    )
    df = resample_gap_fill(ev, ["event_type"], "ts_ms", "value", 3_600_000)
    assert count_exchanges(df) <= 3  # observed-agg, spans-agg reuse, window


def test_ohlc_parity(spark):
    compare_query(spark, REGISTRY["ts_ohlc_hourly_bars"], SF_ORACLE)


def test_ohlc_bar_invariants(spark):
    """low <= open, close <= high on every bar, and bar event counts sum
    to the table's row count (no row lost to the windowing)."""
    df = REGISTRY["ts_ohlc_hourly_bars"].fn(spark, SF_ORACLE).cache()
    try:
        bad = df.filter(
            (F.col("open") > F.col("high"))
            | (F.col("close") > F.col("high"))
            | (F.col("open") < F.col("low"))
            | (F.col("close") < F.col("low"))
        ).count()
        assert bad == 0
        total = df.agg(F.sum("n_events")).collect()[0][0]
        n_events = load_table(spark, SF_ORACLE, "events").count()
        assert total == n_events
    finally:
        df.unpersist()


def test_debounce_parity(spark):
    compare_query(spark, REGISTRY["clean_event_debounce"], SF_ORACLE)


def test_debounce_heads_spaced_and_subset(spark):
    """Kept rows are a strict subset of events, and consecutive kept
    rows per user are > gap apart (burst heads inherit the gap bound:
    next head is > gap after the previous burst's LAST event, which is
    >= the previous head)."""
    from pyspark.sql import Window

    df = REGISTRY["clean_event_debounce"].fn(spark, SF_ORACLE).cache()
    try:
        n_all = load_table(spark, SF_ORACLE, "events").count()
        n_kept = df.count()
        assert 0 < n_kept < n_all
        w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        gaps = df.withColumn("_prev", F.lag("ts_ms").over(w)).filter(
            F.col("_prev").isNotNull() & (F.col("ts_ms") - F.col("_prev") <= 7_200_000)
        )
        assert gaps.count() == 0
    finally:
        df.unpersist()


def test_cusum_parity(spark):
    compare_query(spark, REGISTRY["ts_cusum_changepoints"], SF_ORACLE)


def test_cusum_telescopes_to_zero(spark):
    """The final CUSUM per type telescopes to sum(m) - n*mu ~ 0 (the
    series' own mean is the reference), so the last value is ~0 and the
    stationary fixture flags no changepoints at k=2."""
    df = REGISTRY["ts_cusum_changepoints"].fn(spark, SF_ORACLE).cache()
    try:
        from pyspark.sql import Window

        w = Window.partitionBy("event_type").orderBy(F.col("day").desc())
        last = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("event_type", "cusum")
            .collect()
        )
        for r in last:
            assert abs(r.cusum) < 1e-3, (r.event_type, r.cusum)
    finally:
        df.unpersist()


def test_trailing_active_users_parity(spark):
    compare_query(spark, REGISTRY["ts_trailing_7d_active_users"], SF_ORACLE)


def test_trailing_active_users_bounds(spark):
    """The 7-day count is >= the single-day distinct count for that day
    and <= the global distinct user count."""
    df = REGISTRY["ts_trailing_7d_active_users"].fn(spark, SF_ORACLE)
    ev = load_table(spark, SF_ORACLE, "events").select(
        "user_id", F.expr("(ts div 1000000) div 86400000").alias("day")
    )
    daily = ev.distinct().groupBy("day").agg(F.count_distinct("user_id").alias("d1"))
    n_users = ev.select("user_id").distinct().count()
    j = df.join(daily, "day")
    assert j.filter(F.col("active_users_7d") < F.col("d1")).count() == 0
    assert j.filter(F.col("active_users_7d") > n_users).count() == 0
