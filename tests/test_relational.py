"""Oracle parity for the relational query family."""

import pytest
from pyspark.sql import functions as F

from masd_spark.queries import load_all
from tests.conftest import SF_ORACLE
from tests.oracle import compare_query

REGISTRY = load_all()

RELATIONAL = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "join_semi_customers_with_orders",
    "join_anti_customers_without_orders",
    "join_left_order_counts",
    "orderby_limit_top_orders",
    "topk_orders_per_segment",
    "distinct_segment_nation",
    "set_ops_nation_overlap",
    "rollup_lineitem_flags",
    "cube_order_status_priority",
    "window_customer_order_stats",
    "scalar_string_math",
    "scalar_datetime",
    "json_extract_events",
    "sessionize_events",
    "asof_join_purchases",
    "range_join_clicks_purchases",
    "subquery_exists_filter",
    "subquery_scalar_above_avg",
    "orderby_nulls_last_limit",
    "join_full_outer_period_reconcile",
    "variant_extract_events",
    "sql_pipe_order_counts",
]


def test_variant_extract_semantics(spark):
    """Every event has $.k (the fixture writes it), none has $.missing,
    and the variant-typed extraction agrees with the string-path one."""
    v = REGISTRY["variant_extract_events"].fn(spark, SF_ORACLE)
    rows = v.collect()
    assert all(r["has_k"] and not r["has_missing"] for r in rows)
    j = {
        r["event_id"]: r["k_num"]
        for r in REGISTRY["json_extract_events"].fn(spark, SF_ORACLE).collect()
    }
    for r in rows:
        assert r["k_num"] == j[r["event_id"]]


def test_full_outer_exercises_all_branches(spark):
    """The reconciliation fixture must hit both null sides, or the full
    outer join degenerates into a left/inner test."""
    df = REGISTRY["join_full_outer_period_reconcile"].fn(spark, SF_ORACLE)
    counts = {
        r["presence"]: r["n"]
        for r in df.groupBy("presence").agg(F.count("*").alias("n")).collect()
    }
    assert counts.get("both", 0) > 0
    assert counts.get("a_only", 0) > 0
    assert counts.get("b_only", 0) > 0


@pytest.mark.parametrize("name", RELATIONAL)
def test_oracle_parity(spark, name):
    compare_query(spark, REGISTRY[name], SF_ORACLE)


def test_ratio_to_parent_parity(spark):
    from tests.conftest import SF_ORACLE as _sf

    compare_query(spark, REGISTRY["bi_ratio_to_parent"], _sf)


def test_ratio_to_parent_shares_sum_to_one(spark):
    from tests.conftest import SF_ORACLE as _sf

    df = REGISTRY["bi_ratio_to_parent"].fn(spark, _sf).cache()
    try:
        per_region = df.groupBy("region").agg(F.sum("share_of_region").alias("s"))
        assert per_region.filter(F.abs(F.col("s") - 1.0) > 1e-4).count() == 0
        total = df.agg(F.sum("share_of_total")).collect()[0][0]
        assert abs(total - 1.0) < 1e-4
    finally:
        df.unpersist()
