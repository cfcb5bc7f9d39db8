"""Oracle parity + plan assertions for the extended TPC-H family."""

import pytest

from masd_spark.queries import load_all
from tests.conftest import SF_ORACLE
from tests.oracle import compare_query

REGISTRY = load_all()

QUERIES = [
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    # tpch_full.py — the sweep-completing 13
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q12_shipping_delay_priority",
    "q13_customer_order_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q20_promo_part_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
]


@pytest.mark.parametrize("name", QUERIES)
def test_oracle_parity(spark, name):
    compare_query(spark, REGISTRY[name], SF_ORACLE)


def test_queries_nonempty(spark):
    """Guard against predicates that silently select nothing (a green
    hash over an empty result proves little)."""
    for name in QUERIES:
        df = REGISTRY[name].fn(spark, SF_ORACLE)
        rows = df.collect()
        assert rows, name
        assert all(v is not None for v in rows[0]), (name, rows[0])


def test_q6_filters_pushed_to_scan(spark):
    """Q6 is the pushdown benchmark: shipdate/discount/quantity predicates
    must reach the parquet scan, and the scan must be pruned to the
    referenced columns (no l_returnflag etc.)."""
    from masd_spark.plans.explain import has_pushed_filter, scan_read_schema

    df = REGISTRY["q6_forecast_revenue"].fn(spark, SF_ORACLE)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert has_pushed_filter(df, col), col
    (cols,) = scan_read_schema(df)
    assert "l_extendedprice" in cols
    assert "l_returnflag" not in cols  # pruned


def test_q4_exists_becomes_semi_join(spark):
    """The EXISTS must execute as one LEFT SEMI join on the order key —
    never a per-row subquery or an inner join + distinct."""
    from masd_spark.plans.explain import physical_plan

    plan = physical_plan(REGISTRY["q4_order_priority"].fn(spark, SF_ORACLE))
    assert "LeftSemi" in plan, plan


def test_q21_decorrelation_scans_fact_twice_not_four_times(spark):
    """Canonical Q21 has THREE lineitem references (l1, l2-exists,
    l3-not-exists). The per-order aggregate decorrelation must not
    multiply fact scans: at most two lineitem scan nodes in the physical
    plan (lines + late_pairs branches), not one per quantifier."""
    from masd_spark.plans.explain import physical_plan

    plan = physical_plan(REGISTRY["q21_waiting_suppliers"].fn(spark, SF_ORACLE))
    n_scans = plan.count("lineitem.parquet")
    assert n_scans <= 2, f"{n_scans} lineitem scans\n{plan}"


def test_q17_avg_join_reuses_part_key_partitioning(spark):
    """The decorrelated per-part AVG joins back on the same key it
    aggregated on — Catalyst must not insert an extra exchange between
    the agg and the probe beyond the initial key shuffle."""
    from masd_spark.plans.explain import count_exchanges

    df = REGISTRY["q17_small_quantity_revenue"].fn(spark, SF_ORACLE)
    # partkey shuffle (x2 branches collapse via reuse), final 1-row agg
    assert count_exchanges(df) <= 4


def test_q19_disjunction_pushes_implied_predicates(spark):
    """The OR-of-ANDs must still yield pushed filters on the lineitem scan
    (the disjunction's implied quantity bounds), not a bare full scan."""
    from masd_spark.plans.explain import physical_plan

    plan = physical_plan(REGISTRY["q19_disjunctive_revenue"].fn(spark, SF_ORACLE))
    pushed_lines = [
        line for line in plan.splitlines() if "PushedFilters: [" in line
    ]
    assert len(pushed_lines) >= 2, plan  # both scans
    assert any("Or(" in line or "In(" in line for line in pushed_lines), plan
