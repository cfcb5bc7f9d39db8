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
