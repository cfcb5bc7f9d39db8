"""Oracle parity, bounds, merge, and accuracy checks for sketches."""

import pytest
from pyspark.sql import functions as F

from masd_spark.operators.sketches import cms_build, cms_estimate
from masd_spark.queries import load_all
from masd_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE
from tests.oracle import compare_query

REGISTRY = load_all()


def test_cms_oracle_parity(spark):
    compare_query(spark, REGISTRY["sketch_cms_user_counts"], SF_ORACLE)


def test_cms_never_underestimates(spark):
    out = REGISTRY["sketch_cms_user_counts"].fn(spark, SF_ORACLE)
    assert out.filter(F.col("cms_n") < F.col("exact_n")).count() == 0
    # with 150 keys in 128 buckets some collision must overestimate —
    # proves the estimate is a real sketch read, not exact counting
    assert out.filter(F.col("cms_n") > F.col("exact_n")).count() > 0


def test_cms_sketches_merge_by_cell_sum(spark):
    """Sketch(half A) + Sketch(half B), summed cell-wise, must equal
    Sketch(all) — the property that lets shards sketch independently."""
    ev = load_table(spark, SF_ORACLE, "events")
    a = cms_build(ev.filter(F.col("event_id") % 2 == 0), "user_id")
    b = cms_build(ev.filter(F.col("event_id") % 2 == 1), "user_id")
    merged = (
        a.unionAll(b)
        .groupBy("sketch_row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(ev, "user_id")
    diff = (
        merged.join(whole, ["sketch_row", "bucket"], "full")
        .filter(
            (merged["cnt"].isNull())
            | (whole["cnt"].isNull())
            | (merged["cnt"] != whole["cnt"])
        )
        .count()
    )
    assert diff == 0


def test_cms_estimate_broadcasts_sketch(spark):
    from masd_spark.plans.explain import physical_plan

    ev = load_table(spark, SF_ORACLE, "events")
    sketch = cms_build(ev, "user_id")
    est = cms_estimate(sketch, ev.select("user_id").distinct(), "user_id")
    assert "BroadcastHashJoin" in physical_plan(est)


def test_hll_estimates_accurate_and_merge_consistent(spark):
    """Each per-type estimate within 5% of exact distinct; the 'ALL' row
    (union of per-type sketches) within 5% of global exact distinct and
    equal to a directly-built global sketch's estimate."""
    ev = load_table(spark, SF_ORACLE, "events")
    out = {
        r["event_type"]: r["hll_users"]
        for r in REGISTRY["sketch_hll_user_distinct"].fn(spark, SF_ORACLE).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for t, n in exact.items():
        assert abs(out[t] - n) <= max(1, 0.05 * n), (t, out[t], n)
    n_all = ev.select("user_id").distinct().count()
    assert abs(out["ALL"] - n_all) <= max(1, 0.05 * n_all)
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n")
    ).collect()[0]["n"]
    assert out["ALL"] == direct


def test_hll_error_bound_parity_and_all_true(spark):
    """The oracled bound query (VERDICT r6 item 7): hash parity vs the
    DuckDB exact-distinct oracle, and every within_bound is TRUE — a
    broken estimator flips a boolean and fails the hash."""
    compare_query(spark, REGISTRY["sketch_hll_error_bound"], SF_ORACLE)
    rows = REGISTRY["sketch_hll_error_bound"].fn(spark, SF_ORACLE).collect()
    assert rows and all(r["within_bound"] for r in rows)
    assert any(r["event_type"] == "ALL" for r in rows)


def test_mg_oracle_parity(spark):
    compare_query(spark, REGISTRY["sketch_mg_heavy_users"], SF_ORACLE)


def test_mg_candidates_bounded_and_recall(spark):
    """Per-partition candidate count <= k, and every truly-heavy key is
    in the candidate set (the MG guarantee) on a skewed synthetic input
    with k far below the distinct cardinality."""
    from masd_spark.operators.sketches import heavy_keys, mg_candidates

    # 3 hot keys (1000 each) drowned in 500 singleton keys; k=8
    rows = [(k,) for k in (0, 1, 2) for _ in range(1000)]
    rows += [(100 + i,) for i in range(500)]
    df = spark.createDataFrame(rows, "user_id long").repartition(7)
    k = 8
    cands = mg_candidates(df, "user_id", k)
    import pyspark.sql.functions as SF

    per_part = (
        cands.withColumn("p", SF.spark_partition_id())
        .groupBy("p").count().agg(SF.max("count")).first()[0]
    )
    assert per_part <= k
    got = {r["user_id"] for r in cands.collect()}
    assert {0, 1, 2} <= got  # freq 1000 > 3500/8


def test_mg_heavy_keys_partitioning_independent(spark):
    """Final output is exact on ANY partitioning even though the
    intermediate candidate sets differ — 1 partition vs 13."""
    from masd_spark.operators.sketches import heavy_keys

    rows = [(k,) for k in (0, 1, 2) for _ in range(200)]
    rows += [(100 + i,) for i in range(300)]
    base = spark.createDataFrame(rows, "user_id long")
    k = 8  # threshold 900/8 = 112.5 -> exactly keys 0,1,2
    expect = [(0, 200), (1, 200), (2, 200)]
    for parts in (1, 13):
        out = sorted(
            map(tuple, heavy_keys(base.repartition(parts), "user_id", k).collect())
        )
        assert out == expect, parts


def test_cms_join_size_parity(spark):
    compare_query(spark, REGISTRY["sketch_cms_join_size"], SF_ORACLE)


def test_cms_join_size_bounds(spark):
    """The CM inner product never underestimates, and the overshoot is
    within the analytic slack (expected excess ~ nA*nB/width per row;
    allow 3x for variance)."""
    r = REGISTRY["sketch_cms_join_size"].fn(spark, SF_ORACLE).first()
    n_a, n_b, width = 15000, 1500, 1024
    assert r["est_join_size"] >= r["true_join_size"]
    assert r["est_join_size"] <= r["true_join_size"] + 3 * n_a * n_b / width
