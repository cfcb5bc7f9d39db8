"""Oracle parity + invariants for time-series resampling/gap detection."""

import pytest
from pyspark.sql import functions as F

from masd_spark.operators.timeseries import resample_gap_fill
from masd_spark.queries import load_all
from masd_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE
from tests.oracle import compare_query

REGISTRY = load_all()


@pytest.mark.parametrize("name", ["ts_resample_ffill_hourly", "ts_detect_gaps"])
def test_oracle_parity(spark, name):
    compare_query(spark, REGISTRY[name], SF_ORACLE)


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
