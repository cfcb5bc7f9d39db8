"""Oracle parity + invariants for the warehouse family (SCD2, fuzzy
join, bloom-filtered semi-join)."""

import pytest
from pyspark.sql import functions as F

from masd_spark.queries import load_all
from tests.conftest import SF_ORACLE
from tests.oracle import compare_query

REGISTRY = load_all()

QUERIES = [
    "scd2_customer_priority",
    "fuzzy_join_nations",
    "dq_quarantine_readings",
]


def test_quarantine_split_consistency(spark):
    """Verdict and failed_rule agree row-by-row; both failure modes are
    actually exercised by the fixture; clean rows carry no rule."""
    from pyspark.sql import functions as F

    df = REGISTRY["dq_quarantine_readings"].fn(spark, SF_ORACLE).cache()
    try:
        assert df.filter(
            (F.col("verdict") == "pass") & F.col("failed_rule").isNotNull()
        ).count() == 0
        assert df.filter(
            (F.col("verdict") == "quarantine") & F.col("failed_rule").isNull()
        ).count() == 0
        rules = {
            r["failed_rule"]
            for r in df.filter(F.col("failed_rule").isNotNull())
            .select("failed_rule").distinct().collect()
        }
        assert {"unparseable_value", "value_out_of_range"} <= rules
        n_bad = df.filter(F.col("verdict") == "quarantine").count()
        assert 0 < n_bad < df.count()
    finally:
        df.unpersist()


@pytest.mark.parametrize("name", QUERIES)
def test_oracle_parity(spark, name):
    compare_query(spark, REGISTRY[name], SF_ORACLE)


def test_scd2_interval_invariants(spark):
    """SCD2 output must be a valid history: versions contiguous from 1,
    intervals chained (valid_to == next valid_from), exactly one current
    row per key, and no zero-length or overlapping intervals."""
    df = REGISTRY["scd2_customer_priority"].fn(spark, SF_ORACLE).cache()
    try:
        per_key = df.groupBy("custkey").agg(
            F.count("*").alias("n"),
            F.max("version").alias("maxv"),
            F.sum(F.col("is_current").cast("int")).alias("n_current"),
        )
        bad = per_key.filter(
            (F.col("maxv") != F.col("n")) | (F.col("n_current") != 1)
        )
        assert bad.count() == 0

        # Interval chaining: version v's valid_to equals v+1's valid_from.
        a = df.select("custkey", "version", "valid_to_ms")
        b = df.select(
            "custkey",
            (F.col("version") - 1).alias("version"),
            F.col("valid_from_ms").alias("next_from"),
        )
        chained = a.join(b, ["custkey", "version"])
        broken = chained.filter(F.col("valid_to_ms") != F.col("next_from"))
        assert broken.count() == 0

        # No adjacent intervals share the tracked value (else they should
        # have been collapsed into one).
        c = df.select("custkey", "version", "priority")
        d = df.select(
            "custkey",
            (F.col("version") - 1).alias("version"),
            F.col("priority").alias("next_priority"),
        )
        uncollapsed = c.join(d, ["custkey", "version"]).filter(
            F.col("priority") == F.col("next_priority")
        )
        assert uncollapsed.count() == 0
    finally:
        df.unpersist()


def test_scd2_null_state_opens_interval(spark):
    """NULL tracked values are real states: NULL->x and x->NULL both open
    intervals, and runs of NULLs collapse (null-safe comparison)."""
    from masd_spark.operators.cdc import scd2_intervals

    rows = [
        (1, 10, None),
        (1, 20, None),
        (1, 30, "a"),
        (1, 40, None),
        (2, 10, "b"),
    ]
    df = spark.createDataFrame(rows, "k int, t int, v string")
    out = scd2_intervals(df, ["k"], ["t"], "v").orderBy("k", "version")
    got = [(r.k, r.version, r.v, r.valid_from, r.valid_to) for r in out.collect()]
    assert got == [
        (1, 1, None, 10, 30),
        (1, 2, "a", 30, 40),
        (1, 3, None, 40, None),
        (2, 1, "b", 10, None),
    ]


def test_fuzzy_join_resolves_vowel_dropped_names(spark):
    """Corruption mode 0 (vowel loss) must resolve back to the customer's
    true nation: dropping AEI never brings a name closer to a different
    nation in this dimension."""
    df = REGISTRY["fuzzy_join_nations"].fn(spark, SF_ORACLE)
    cust = spark.read.parquet(f"{SF_ORACLE}/customer.parquet")
    nation = spark.read.parquet(f"{SF_ORACLE}/nation.parquet")
    truth = cust.join(nation, cust.c_nationkey == nation.n_nationkey).select(
        "c_custkey", F.col("n_name").alias("true_nation")
    )
    mode0 = df.filter(F.col("c_custkey") % 3 == 0).join(truth, "c_custkey")
    n = mode0.count()
    assert n > 0
    wrong = mode0.filter(F.col("matched_nation") != F.col("true_nation"))
    assert wrong.count() == 0


def test_bloom_semi_join_parity(spark):
    compare_query(spark, REGISTRY["bloom_semi_join_lineitem"], SF_ORACLE)


def test_bloom_filter_runs_before_join_exchange(spark):
    """The whole point of the bloom stage: the probe filter must sit in
    the fact scan stage, BELOW the semi-join's shuffle exchange (Catalyst
    happily reorders it above when the bitset arrives via a cross join —
    see operators/bloom.py)."""
    from masd_spark.plans.explain import physical_plan
    from tests.conftest import SF_SMOKE

    plan = physical_plan(REGISTRY["bloom_semi_join_lineitem"].fn(spark, SF_SMOKE))
    lines = plan.splitlines()
    idx_join = next(i for i, l in enumerate(lines) if "LeftSemi" in l)
    idx_exch = next(
        i for i, l in enumerate(lines)
        if i > idx_join and "Exchange hashpartitioning(l_orderkey" in l
    )
    idx_bloom = next(
        i for i, l in enumerate(lines)
        if "Filter" in l and "element_at" in l and "xxhash64" in l
    )
    idx_scan = next(
        i for i, l in enumerate(lines) if "FileScan" in l and "lineitem" in l
    )
    assert idx_join < idx_exch < idx_bloom < idx_scan, plan[:2000]


def test_bloom_no_false_negatives_and_selective(spark):
    """Every true member passes the bit test (no false negatives — the
    exactness guarantee); non-members mostly fail (selectivity sanity,
    deterministic given xxhash64)."""
    from masd_spark.operators.bloom import (
        _WORDS_COL, bloom_build, bloom_might_contain,
    )
    from pyspark.sql import functions as F

    n_bits, k = 1 << 14, 3
    members = spark.range(0, 1000).withColumnRenamed("id", "key")
    words = bloom_build(members, "key", n_bits, k).collect()[0][0]
    probe = (
        spark.range(0, 10000)
        .withColumnRenamed("id", "key")
        .withColumn(_WORDS_COL, F.lit(words))
    )
    passed = probe.filter(bloom_might_contain("key", n_bits, k))
    n_members_passed = passed.filter(F.col("key") < 1000).count()
    assert n_members_passed == 1000  # zero false negatives
    fp = passed.filter(F.col("key") >= 1000).count()
    # load factor 3*1000/16384 -> fpp ~ (1-e^-0.183)^3 ~ 0.5%; allow 4x
    assert fp <= 0.02 * 9000, fp


def test_bloom_saturated_filter_keeps_all_members(spark):
    """Round-6 SF1 regression: a SATURATED filter (dim outgrew the
    bitset; dense words like -1 all fit int32) made PySpark's lit()
    infer array<int>, and shiftright(int, bit) masks the shift mod 32 —
    probing the wrong bit and dropping TRUE keys (26 urgent orders at
    SF1). The semi-join contract is exactness at ANY load factor:
    saturation may cost selectivity, never rows."""
    from pyspark.sql import functions as F

    from masd_spark.operators.bloom import bloom_build, bloom_semi_join

    # 4096 bits, 3 hashes, 20k keys -> load factor ~15: every word dense
    members = spark.range(0, 20000).withColumnRenamed("id", "key")
    words = bloom_build(members, "key", 1 << 12, 3).collect()[0][0]
    assert all(-(2**31) <= w < 2**31 for w in words), (
        "fixture drift: saturation no longer produces int32-range words, "
        "so this test would no longer reproduce the lit() inference trap"
    )
    fact = spark.range(0, 40000).withColumnRenamed("id", "fkey")
    dim = members.withColumnRenamed("key", "dkey")
    out = bloom_semi_join(fact, dim, "fkey", "dkey", n_bits=1 << 12, n_hashes=3)
    assert out.count() == 20000  # every true member survives


def test_dq_audit_parity(spark):
    compare_query(spark, REGISTRY["dq_audit_core"], SF_ORACLE)


def test_dq_audit_shape_and_counts(spark):
    rows = {r.check_name: r for r in REGISTRY["dq_audit_core"].fn(spark, SF_ORACLE).collect()}
    assert set(rows) == {
        "orders_fk_customer",
        "lineitem_fk_orders",
        "customer_pk_unique",
        "events_user_not_null",
        "documents_text_nonempty",
    }
    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    assert rows["orders_fk_customer"].n_checked == orders.count()
    for r in rows.values():
        assert 0 <= r.n_violations <= r.n_checked


def test_dq_fk_check_detects_planted_orphans(spark):
    """The anti-join check shape actually fires: planting orphan FKs in a
    synthetic child table yields exactly that violation count."""
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    child = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 99), (13, 98)], "id long, fk long"
    )
    orphans = child.join(parent, child.fk == parent.pk, "left_anti")
    assert orphans.count() == 2
    assert {r.fk for r in orphans.collect()} == {98, 99}


def test_scd2_single_shuffle_two_windows(spark):
    """The docstring's scale claim, asserted: both window passes reuse
    ONE exchange on the dimension key."""
    from masd_spark.plans.explain import count_exchanges, physical_plan
    from tests.conftest import SF_SMOKE

    df = REGISTRY["scd2_customer_priority"].fn(spark, SF_SMOKE)
    assert count_exchanges(df) == 1, physical_plan(df)
    assert physical_plan(df).count("Window") == 2


def test_fuzzy_join_is_partial_agg_not_window(spark):
    """Argmin must plan as partial+final min(struct), never a full-row
    sort window."""
    from masd_spark.plans.explain import physical_plan
    from tests.conftest import SF_SMOKE

    plan = physical_plan(REGISTRY["fuzzy_join_nations"].fn(spark, SF_SMOKE))
    assert "partial_min" in plan
    assert "Window" not in plan


MERGE_PIT = ["merge_upsert_latest_order", "pit_scd2_priority_at_ship"]


@pytest.mark.parametrize("name", MERGE_PIT)
def test_merge_pit_oracle_parity(spark, name):
    compare_query(spark, REGISTRY[name], SF_ORACLE)


def test_merge_upsert_branch_semantics(spark):
    """All three MERGE branches on a tiny frame: matched key updated,
    new key inserted, untouched key kept; in-feed duplicates resolved by
    the version columns."""
    from masd_spark.operators.merge import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10)], "k int, v string, ver int"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 20), (2, "b3", 30), (3, "c", 20)], "k int, v string, ver int"
    )
    out = {
        r.k: (r.v, r.ver)
        for r in merge_upsert(base, updates, ["k"], ["ver"]).collect()
    }
    assert out == {1: ("a", 10), 2: ("b3", 30), 3: ("c", 20)}


def test_merge_upsert_updates_beat_base_on_version_ties(spark):
    """MERGE semantics: a matched source row overrides the target even at
    an equal (or lower) version — source wins, not max-version."""
    from masd_spark.operators.merge import merge_upsert

    base = spark.createDataFrame([(1, "old", 99)], "k int, v string, ver int")
    updates = spark.createDataFrame([(1, "new", 1)], "k int, v string, ver int")
    rows = merge_upsert(base, updates, ["k"], ["ver"]).collect()
    assert [(r.k, r.v, r.ver) for r in rows] == [(1, "new", 1)]


def test_pit_lookup_is_interval_consistent(spark):
    """Each enriched lineitem's (priority, version) must equal the SCD2
    interval that CONTAINS its ship time — the as-of composition and a
    direct interval-predicate join are two routes to the same answer."""
    pit = REGISTRY["pit_scd2_priority_at_ship"].fn(spark, SF_ORACLE)
    hist = REGISTRY["scd2_customer_priority"].fn(spark, SF_ORACLE)
    joined = pit.filter(F.col("version_at_ship").isNotNull()).join(
        hist.select(
            F.col("custkey"),
            F.col("priority").alias("h_priority"),
            F.col("version").alias("h_version"),
            "valid_from_ms",
            "valid_to_ms",
        ),
        ["custkey"],
    )
    containing = joined.filter(
        (F.col("ship_ms") >= F.col("valid_from_ms"))
        & (F.col("valid_to_ms").isNull() | (F.col("ship_ms") < F.col("valid_to_ms")))
    )
    bad = containing.filter(
        (F.col("h_priority") != F.col("priority_at_ship"))
        | (F.col("h_version") != F.col("version_at_ship"))
    ).count()
    assert bad == 0


CDC_IVM = ["cdc_snapshot_diff", "ivm_monthly_revenue_merge"]


@pytest.mark.parametrize("name", CDC_IVM)
def test_cdc_ivm_oracle_parity(spark, name):
    compare_query(spark, REGISTRY[name], SF_ORACLE)


def test_cdc_diff_branch_consistency(spark):
    """Each key appears once; inserts have no old image, deletes no new
    image, updates both — and at least one column actually differs."""
    df = REGISTRY["cdc_snapshot_diff"].fn(spark, SF_ORACLE).cache()
    try:
        assert df.groupBy("custkey").count().filter(F.col("count") > 1).count() == 0
        bad_insert = df.filter(
            (F.col("change_type") == "insert") & F.col("old_orderkey").isNotNull()
        ).count()
        bad_delete = df.filter(
            (F.col("change_type") == "delete") & F.col("new_orderkey").isNotNull()
        ).count()
        bad_update = df.filter(
            (F.col("change_type") == "update")
            & (
                F.col("old_orderkey").isNull()
                | F.col("new_orderkey").isNull()
                | (
                    F.col("old_orderkey").eqNullSafe(F.col("new_orderkey"))
                    & F.col("old_status").eqNullSafe(F.col("new_status"))
                    & F.col("old_total").eqNullSafe(F.col("new_total"))
                )
            )
        ).count()
        assert bad_insert == 0 and bad_delete == 0 and bad_update == 0
    finally:
        df.unpersist()


def test_ivm_merge_equals_direct_rebuild(spark):
    """The incremental (partial + delta) refresh must equal a one-shot
    groupBy over all raw rows, computed independently in Spark."""
    from masd_spark.sources.tables import load_table

    merged = REGISTRY["ivm_monthly_revenue_merge"].fn(spark, SF_ORACLE)
    orders = load_table(spark, SF_ORACLE, "orders")
    direct = (
        orders.groupBy(
            F.unix_millis(F.date_trunc("month", "o_orderdate")).alias("month_ms"),
            "o_orderstatus",
        )
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double"), 6
            ).alias("revenue"),
            F.count("*").alias("n_orders"),
            F.max("o_totalprice").alias("max_price"),
        )
    )
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


RETENTION_DIM = ["warehouse_retention_keep_n", "dim_date_generate"]


@pytest.mark.parametrize("name", RETENTION_DIM)
def test_retention_dim_oracle_parity(spark, name):
    compare_query(spark, REGISTRY[name], SF_ORACLE)


def test_retention_keeps_exactly_n_live_per_key(spark):
    df = REGISTRY["warehouse_retention_keep_n"].fn(spark, SF_ORACLE)
    live = df.filter(~F.col("is_expired")).groupBy("custkey").count()
    assert live.filter(F.col("count") > 3).count() == 0
    # every customer with >3 orders has exactly 3 live versions
    totals = df.groupBy("custkey").count().filter(F.col("count") > 3)
    j = totals.join(live.withColumnRenamed("count", "n_live"), "custkey")
    assert j.filter(F.col("n_live") != 3).count() == 0


def test_date_dim_is_contiguous(spark):
    rows = sorted(
        r.date_ms for r in REGISTRY["dim_date_generate"].fn(spark, SF_ORACLE).collect()
    )
    assert all(b - a == 86_400_000 for a, b in zip(rows, rows[1:]))
