"""Parity + invariants for the analytics family (funnel, cohorts) and
the round-3 robust-stats / LM-score additions."""

import math

import pytest
from pyspark.sql import functions as F

from masd_spark.queries import load_all
from masd_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE
from tests.oracle import compare_query

REGISTRY = load_all()

QUERIES = [
    "funnel_view_click_purchase",
    "cohort_retention_daily",
    "agg_mad_robust",
    "text_unigram_logprob",
    # round-5 audit (tests/test_parity_audit.py) found these two oracled
    # analytics queries had no local compare_query row — both sit in the
    # round-5 driver window, so the local twin must run before the driver
    "basket_brand_affinity",
    "bi_rfm_segments",
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


EXTRA = [
    "streak_longest_daily",
    "sample_weighted_es",
    "drift_psi_value_dist",
    "dedup_survivorship",
]


@pytest.mark.parametrize("name", EXTRA)
def test_extra_oracle_parity(spark, name):
    compare_query(spark, REGISTRY[name], SF_ORACLE)


def test_streak_bounded_by_active_days(spark):
    df = REGISTRY["streak_longest_daily"].fn(spark, SF_ORACLE)
    ev = load_table(spark, SF_ORACLE, "events")
    active = (
        ev.select("user_id", F.expr("(ts div 1000000) div 86400000").alias("d"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count("*").alias("n_days"))
    )
    j = df.join(active, "user_id")
    assert j.filter(F.col("longest_streak_days") > F.col("n_days")).count() == 0
    assert j.filter(F.col("longest_streak_days") < 1).count() == 0
    assert df.count() == active.count()


def test_weighted_sample_is_biased_toward_weight(spark):
    """Exactly k rows, deterministic across calls, and the length-weighted
    draw's mean n_chars exceeds the corpus mean."""
    a = REGISTRY["sample_weighted_es"].fn(spark, SF_ORACLE)
    b = REGISTRY["sample_weighted_es"].fn(spark, SF_ORACLE)
    rows_a = sorted((r.doc_id, r.es_score) for r in a.collect())
    rows_b = sorted((r.doc_id, r.es_score) for r in b.collect())
    assert rows_a == rows_b and len(rows_a) == 100
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    sample_mean = a.agg(F.avg("n_chars")).collect()[0][0]
    assert sample_mean > corpus_mean


def test_psi_nonnegative_and_stationary_fixture_small(spark):
    """Every PSI term is (p-q)ln(p/q) >= 0, so PSI >= 0; the fixture's
    halves are draws from one distribution, so PSI sits under the 0.1
    'no significant drift' rule-of-thumb."""
    rows = REGISTRY["drift_psi_value_dist"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r.psi < 0.1, (r.event_type, r.psi)


def test_survivorship_one_canonical_per_component(spark):
    df = REGISTRY["dedup_survivorship"].fn(spark, SF_ORACLE).cache()
    try:
        per_comp = df.groupBy("component").agg(
            F.sum(F.col("is_canonical").cast("int")).alias("n_canon"),
            F.count("*").alias("n"),
        )
        assert per_comp.filter(F.col("n_canon") != 1).count() == 0
        # canonical row holds the component's max n_chars
        docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
            "doc_id", "n_chars"
        )
        j = df.join(docs, "doc_id")
        mx = j.groupBy("component").agg(F.max("n_chars").alias("mx"))
        bad = (
            j.filter(F.col("is_canonical"))
            .join(mx, "component")
            .filter(F.col("n_chars") != F.col("mx"))
        )
        assert bad.count() == 0
    finally:
        df.unpersist()


def test_weighted_sample_plan_is_take_ordered(spark):
    from masd_spark.plans.explain import has_take_ordered
    from tests.conftest import SF_SMOKE

    assert has_take_ordered(REGISTRY["sample_weighted_es"].fn(spark, SF_SMOKE))


EXTRA2 = ["pipeline_kfold_assignment", "diag_key_skew"]


@pytest.mark.parametrize("name", EXTRA2)
def test_extra2_oracle_parity(spark, name):
    compare_query(spark, REGISTRY[name], SF_ORACLE)


def test_kfold_disjoint_and_exhaustive(spark):
    df = REGISTRY["pipeline_kfold_assignment"].fn(spark, SF_ORACLE)
    rows = df.collect()
    folds = {r.fold for r in rows}
    assert folds == set(range(5))
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    # every fold gets a non-trivial share (hash balance sanity)
    per_fold = {}
    for r in rows:
        per_fold[r.fold] = per_fold.get(r.fold, 0) + r.n_docs
    assert min(per_fold.values()) >= 0.1 * docs.count() / 5


def test_key_skew_summary_consistent(spark):
    r = REGISTRY["diag_key_skew"].fn(spark, SF_ORACLE).collect()[0]
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    assert r.n_rows == li.count()
    assert 0 < r.top1_share <= 1.0
    assert r.p99 >= r.p50 >= 1.0
    assert r.max_per_key >= r.p99


EXTRA3 = ["stat_daily_value_correlation", "stat_chi2_type_by_dow"]


@pytest.mark.parametrize("name", EXTRA3)
def test_extra3_oracle_parity(spark, name):
    compare_query(spark, REGISTRY[name], SF_ORACLE)


def test_pearson_matches_numpy(spark):
    """The quantized-sums closed form must agree with numpy's corrcoef on
    the same daily means (quantization noise is ~1e-6 on the means)."""
    import numpy as np

    r = REGISTRY["stat_daily_value_correlation"].fn(spark, SF_ORACLE).collect()[0]
    assert -1.0 <= r.pearson_r <= 1.0
    ev = (
        load_table(spark, SF_ORACLE, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            F.expr("(ts div 1000000) div 86400000").alias("day"),
            "event_type",
            "value",
        )
        .groupBy("day", "event_type")
        .agg(F.avg("value").alias("m"))
    )
    rows = ev.collect()
    by_day = {}
    for row in rows:
        by_day.setdefault(row.day, {})[row.event_type] = row.m
    xs = [v["click"] for v in by_day.values() if len(v) == 2]
    ys = [v["purchase"] for v in by_day.values() if len(v) == 2]
    want = float(np.corrcoef(xs, ys)[0, 1])
    assert abs(r.pearson_r - want) < 1e-4
    assert r.n_days == len(xs)


def test_chi2_nonnegative_with_right_dof(spark):
    r = REGISTRY["stat_chi2_type_by_dow"].fn(spark, SF_ORACLE).collect()[0]
    assert r.chi2 >= 0.0
    assert r.dof == (5 - 1) * (7 - 1)


def test_attribution_parity(spark):
    compare_query(spark, REGISTRY["attribution_last_touch"], SF_ORACLE)


def test_attribution_touch_precedes_purchase(spark):
    """Credited touches never postdate the purchase; purchases with no
    prior touch carry NULL credit and appear exactly once."""
    df = REGISTRY["attribution_last_touch"].fn(spark, SF_ORACLE).cache()
    try:
        assert df.filter(F.col("touch_ms") > F.col("ts_ms")).count() == 0
        assert df.filter(F.col("ms_since_touch") < 0).count() == 0
        assert df.groupBy("event_id").count().filter(F.col("count") > 1).count() == 0
    finally:
        df.unpersist()


def test_transitions_parity(spark):
    compare_query(spark, REGISTRY["seq_event_transitions"], SF_ORACLE)


def test_transition_rows_are_distributions(spark):
    """P(next | prev) sums to ~1 per source state and transition counts
    conserve: total transitions == total events minus one per user."""
    df = REGISTRY["seq_event_transitions"].fn(spark, SF_ORACLE).cache()
    try:
        sums = df.groupBy("prev_type").agg(
            F.sum("p_next_given_prev").alias("s"), F.sum("n_transitions").alias("n")
        )
        bad = sums.filter(F.abs(F.col("s") - 1.0) > 1e-4).count()
        assert bad == 0
        total = df.agg(F.sum("n_transitions")).collect()[0][0]
        ev = load_table(spark, SF_ORACLE, "events")
        n_events = ev.count()
        n_users = ev.select("user_id").distinct().count()
        assert total == n_events - n_users
    finally:
        df.unpersist()


def test_welch_ttest_parity(spark):
    compare_query(spark, REGISTRY["stat_welch_ttest"], SF_ORACLE)


def test_welch_ttest_matches_scipy_formula(spark):
    """Closed-form check against numpy on the same filtered values."""
    import numpy as np

    r = REGISTRY["stat_welch_ttest"].fn(spark, SF_ORACLE).collect()[0]
    ev = load_table(spark, SF_ORACLE, "events")
    a = np.array(
        [x.value for x in ev.filter(F.col("event_type") == "click").collect()]
    )
    b = np.array(
        [x.value for x in ev.filter(F.col("event_type") == "purchase").collect()]
    )
    se2 = a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(se2)
    assert abs(r.t_stat - t) < 1e-3, (r.t_stat, t)
    assert r.n_a == len(a) and r.n_b == len(b)


def test_session_paths_parity(spark):
    compare_query(spark, REGISTRY["seq_top_session_paths"], SF_ORACLE)


def test_session_paths_cover_sessions(spark):
    """Path frequencies can't exceed the total session count, and each
    path string is a non-empty chain of known event types."""
    rows = REGISTRY["seq_top_session_paths"].fn(spark, SF_ORACLE).collect()
    assert 0 < len(rows) <= 20
    n_sessions = REGISTRY["sessionize_events"].fn(spark, SF_ORACLE).count()
    types = {"view", "click", "purchase", "signup", "error"}
    for r in rows:
        assert 0 < r.n_sessions <= n_sessions
        assert set(r.path.split(">")) <= types


def test_theil_sen_parity(spark):
    compare_query(spark, REGISTRY["stat_theil_sen_trend"], SF_ORACLE)


def test_theil_sen_outlier_robust(spark):
    """Corrupting one day's mean by 1e6 must not move the slope (numpy
    reference on a planted series)."""
    import numpy as np

    days = np.arange(30)
    clean = 2.0 * days + 5.0
    spiked = clean.copy()
    spiked[7] += 1e6

    def ts_slope(ys):
        rows = [("a", int(d), float(v)) for d, v in zip(days, ys)]
        df = spark.createDataFrame(rows, "event_type string, day long, m double")
        a = df.select("event_type", F.col("day").alias("da"), F.col("m").alias("ma"))
        b = df.select("event_type", F.col("day").alias("db"), F.col("m").alias("mb"))
        s = (
            a.join(b, "event_type")
            .filter(F.col("da") < F.col("db"))
            .select(((F.col("mb") - F.col("ma")) / (F.col("db") - F.col("da"))).alias("s"))
        )
        return s.agg(F.median("s")).collect()[0][0]

    assert abs(ts_slope(clean) - 2.0) < 1e-9
    assert abs(ts_slope(spiked) - 2.0) < 0.2


def test_seq_pattern_parity(spark):
    compare_query(spark, REGISTRY["seq_sessions_matching_pattern"], SF_ORACLE)


def test_seq_pattern_subset_of_funnel_users(spark):
    """Matches are bounded by sessions, nonnegative, and at least one
    user matches on the fixture (the pattern is not vacuous)."""
    df = REGISTRY["seq_sessions_matching_pattern"].fn(spark, SF_ORACLE).cache()
    try:
        assert df.filter(F.col("n_matching") > F.col("n_sessions")).count() == 0
        assert df.filter(F.col("n_matching") < 0).count() == 0
        assert df.agg(F.sum("n_matching")).collect()[0][0] > 0
    finally:
        df.unpersist()
