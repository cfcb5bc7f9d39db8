"""SQL front-door family: recursive CTE, LATERAL top-k, ordered-set
aggregates — oracle parity plus the plan shapes their docstrings claim."""

import pytest

from masd_spark.plans.explain import physical_plan
from masd_spark.queries import load_all
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle import compare_query

REGISTRY = load_all()

ORACLE_QUERIES = [
    "hierarchy_rollup_recursive",
    "agg_ordered_set_profile",
    "lateral_topk_customers",
    "agg_percentile_within_group",
]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    compare_query(spark, REGISTRY[name], SF_ORACLE)


def test_lateral_decorrelates_to_group_limit(spark):
    """The correlated LATERAL (ORDER BY + LIMIT 2 per nation) must NOT
    execute as a per-row nested-loop re-scan: Catalyst decorrelates it to
    WindowGroupLimit — per-group top-k pruned map-side BEFORE the
    exchange — plus one broadcast of the 25-row nation side."""
    plan = physical_plan(REGISTRY["lateral_topk_customers"].fn(spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_lateral_emits_at_most_k_per_group(spark):
    rows = REGISTRY["lateral_topk_customers"].fn(spark, SF_SMOKE).collect()
    per_nation: dict[str, int] = {}
    for r in rows:
        per_nation[r["n_name"]] = per_nation.get(r["n_name"], 0) + 1
    assert per_nation and all(v <= 2 for v in per_nation.values()), per_nation


def test_recursive_cte_runs_as_union_loop(spark):
    """WITH RECURSIVE executes via the UnionLoop physical operator (not a
    driver-side loop), and the final rollup keeps map-side partial
    aggregation."""
    plan = physical_plan(REGISTRY["hierarchy_rollup_recursive"].fn(spark, SF_SMOKE))
    assert "UnionLoop" in plan, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_recursive_chain_lengths_match_key_width(spark):
    """Every customer's chain length is exactly the number of decimal-digit
    parent hops to a single-digit root: len(str(custkey)) - 1."""
    df = REGISTRY["hierarchy_rollup_recursive"].fn(spark, SF_SMOKE)
    rows = {r["root"]: r for r in df.collect()}
    assert rows and set(rows) <= set(range(0, 10))
    from masd_spark.sources.tables import load_table

    keys = [r[0] for r in load_table(spark, SF_SMOKE, "customer").select("c_custkey").collect()]
    assert sum(r["n_customers"] for r in rows.values()) == len(keys)
    expected_max = max(len(str(k)) - 1 for k in keys)
    assert max(r["max_chain"] for r in rows.values()) == expected_max


def test_recursive_cte_row_limit_raised(spark):
    """Scale-ceiling regression: Spark 4.1 aborts a recursive CTE once its
    cumulative output crosses ``spark.sql.cteRecursionRowLimit`` (default
    1,000,000) — the hierarchy walk's O(n * depth) rows cross that around
    SF1. The query must (a) raise the ceiling itself even in a plain
    session, and (b) actually survive a walk that exceeds the default —
    proven here with a 300k-key 7-digit walk (~2.4M rows) that ABORTS
    under the default limit and completes under the raised one."""
    walk_sql = """
        WITH RECURSIVE walk AS (
            SELECT id AS node, 0 AS depth FROM range(1000000, 1300000)
            UNION ALL
            SELECT node DIV 10 AS node, depth + 1 AS depth
            FROM walk WHERE node >= 10
        )
        SELECT count(*) FROM walk
    """
    saved = spark.conf.get("spark.sql.cteRecursionRowLimit", None)
    try:
        # under the 4.1 default the same walk must abort — this is the
        # failure the raised conf exists to prevent
        spark.conf.set("spark.sql.cteRecursionRowLimit", "1000000")
        with pytest.raises(Exception, match="(?i)recursion.*limit|limit.*recursion"):
            spark.sql(walk_sql).collect()

        # running the registered query restores the raised ceiling as a
        # side effect (self-sufficient in the driver's plain session)...
        REGISTRY["hierarchy_rollup_recursive"].fn(spark, SF_SMOKE).collect()
        assert spark.conf.get("spark.sql.cteRecursionRowLimit") == "100000000"
        # ...after which the >1M-row walk completes
        n = spark.sql(walk_sql).collect()[0][0]
        assert n > 1_000_000, n
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.cteRecursionRowLimit")
        else:
            spark.conf.set("spark.sql.cteRecursionRowLimit", saved)


def test_ordered_set_profile_mode_margin(spark):
    """mode(least(l_linenumber, 5)) must be 5 in every group, and the
    winning bucket must lead the runner-up by >= 2x — the decisiveness
    the query docstring relies on to make builtin mode() hash-stable.
    Fixture drift toward a thin margin fails HERE before the oracle can
    flake."""
    from pyspark.sql import functions as F

    from masd_spark.sources.tables import load_table

    rows = REGISTRY["agg_ordered_set_profile"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["mode_linebucket"] == 5, r
        assert r["statuses"] == ",".join(sorted(r["statuses"].split(",")))

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", F.least(F.col("l_linenumber"), F.lit(5)).alias("bucket")
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    counts = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority", "bucket")
        .count()
        .collect()
    )
    by_prio: dict[str, list[tuple[int, int]]] = {}
    for r in counts:
        by_prio.setdefault(r["o_orderpriority"], []).append((r["bucket"], r["count"]))
    for prio, pairs in by_prio.items():
        ranked = sorted(pairs, key=lambda p: -p[1])
        assert ranked[0][0] == 5, (prio, ranked)
        assert ranked[0][1] >= 2 * ranked[1][1], (prio, ranked)
