"""Spark 4 SQL front-door surface: recursive CTEs, LATERAL correlated
subqueries, and ordered-set aggregates (listagg WITHIN GROUP / mode /
median), each oracle-checked against DuckDB at value level.

These queries exist to prove the engine's SQL entry point covers the
modern ANSI surface a warehouse user expects, with the SAME logical
plans the DataFrame API would build. Reference parity note: the
reference system (/root/reference/spark-app/consumer.py) exposes no SQL
front door at all — this family is harness-required breadth, not a port.

Determinism/portability conventions follow the registry docstring
(masd_spark/queries/__init__.py): BIGINT surfaces, DECIMAL-quantized
money, 6-dp rounded float aggregates, total orderings under every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from masd_spark.queries import register
from masd_spark.sources.tables import load_table


def _view(spark: SparkSession, sf_dir: str, table: str, view: str) -> None:
    load_table(spark, sf_dir, table).createOrReplaceTempView(view)


@register(
    "hierarchy_rollup_recursive",
    oracle="""
    WITH RECURSIVE walk AS (
        SELECT c_custkey AS custkey, c_custkey AS node, 0 AS depth
        FROM customer
        UNION ALL
        SELECT custkey, node // 10 AS node, depth + 1 AS depth
        FROM walk WHERE node >= 10
    ),
    tops AS (
        SELECT custkey, CAST(max(depth) AS BIGINT) AS chain_len
        FROM walk GROUP BY custkey
    ),
    rooted AS (
        SELECT w.custkey, w.node AS root, t.chain_len
        FROM walk w JOIN tops t ON w.custkey = t.custkey AND w.depth = t.chain_len
    )
    SELECT CAST(r.root AS BIGINT) AS root,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(max(r.chain_len) AS BIGINT) AS max_chain,
           ROUND(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS sum_acctbal
    FROM rooted r JOIN customer c ON r.custkey = c.c_custkey
    GROUP BY r.root
    """,
)
def hierarchy_rollup_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE hierarchy walk (Spark 4.1 ``WITH RECURSIVE``): every
    customer key climbs its decimal-digit parent chain (parent = key div
    10) to its single-digit root, then account balances roll up per root.

    Spark's recursive CTEs support UNION ALL recursion only (set-semantics
    UNION raises UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE as of 4.1), so the
    recursion here is a parent-POINTER walk — each row has exactly one
    successor per step and the chain strictly shrinks, so UNION ALL
    enumerates each (custkey, depth) exactly once and terminates at the
    key-width bound (~7 steps) with O(n * depth) total rows. That is the
    shape recursive CTEs scale at: bounded-fanout DAG walks (org charts,
    BOM explosions, folder trees), NOT graph saturation — cyclic
    reachability needs the iterative frontier operator
    (operators/graph.py:bfs_distances) whose per-round dedup gives set
    semantics. Each recursion step is one shuffle-free projection; the
    rollup is a single partial+final agg on ~9 roots.

    Row-limit guard: Spark 4.1 caps recursive-CTE output at
    ``spark.sql.cteRecursionRowLimit`` (default 1,000,000 rows) — the
    O(n * depth) walk crosses that around SF1 (~790k rows at SF1, ~1.7M at
    SF2). RUNTIME_CONFS (session.py) raises the ceiling to 100M, good to
    ~SF60; past that, keep the guard proportional or switch to the
    iterative operator.
    """
    _view(spark, sf_dir, "customer", "rc_customer")
    # Self-sufficient in a PLAIN session (the driver's): the ceiling must
    # not depend on the caller having applied session.RUNTIME_CONFS.
    spark.conf.set("spark.sql.cteRecursionRowLimit", "100000000")
    return spark.sql(
        """
        WITH RECURSIVE walk AS (
            SELECT c_custkey AS custkey, c_custkey AS node, 0 AS depth
            FROM rc_customer
            UNION ALL
            SELECT custkey, node DIV 10 AS node, depth + 1 AS depth
            FROM walk WHERE node >= 10
        ),
        tops AS (
            SELECT custkey, CAST(max(depth) AS BIGINT) AS chain_len
            FROM walk GROUP BY custkey
        ),
        rooted AS (
            SELECT w.custkey, w.node AS root, t.chain_len
            FROM walk w
            JOIN tops t ON w.custkey = t.custkey AND w.depth = t.chain_len
        )
        SELECT CAST(r.root AS BIGINT) AS root,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(max(r.chain_len) AS BIGINT) AS max_chain,
               ROUND(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
                   AS sum_acctbal
        FROM rooted r JOIN rc_customer c ON r.custkey = c.c_custkey
        GROUP BY r.root
        """
    )


@register(
    "agg_ordered_set_profile",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_rows,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
               AS statuses,
           ROUND(median(o_totalprice), 6) AS med_price,
           CAST(mode(least(l_linenumber, 5)) AS BIGINT) AS mode_linebucket
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def agg_ordered_set_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set / positional aggregates new in Spark 4:
    ``listagg(DISTINCT ..) WITHIN GROUP (ORDER BY ..)`` (= DuckDB
    string_agg), exact ``median``, and ``mode`` — one pass over the
    order|x|lineitem join grain per priority class.

    Determinism notes (what makes builtin mode/median/listagg
    hash-checkable): listagg is ordered AND distinct, so its string is a
    function of the value SET; median over an identical multiset is the
    same exact order statistic on both engines (both average the two
    middle values — one IEEE add, no order dependence); mode() is
    UNSPECIFIED under frequency ties on both engines, so it targets
    least(l_linenumber, 5) — the fixture's linenumbers are ~uniform on
    1..7, so the 5-bucket absorbs three of seven values and wins by a
    ~3:1 expected margin; tests/test_sql_front.py asserts the realized
    margin stays >= 2x so fixture drift fails loudly before the oracle
    could flake. At scale this is one shuffle on the join key
    plus a partial+final agg on 5 groups; listagg stays bounded because
    its input is the distinct 3-value status set, never raw rows.
    """
    _view(spark, sf_dir, "orders", "osp_orders")
    _view(spark, sf_dir, "lineitem", "osp_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_rows,
               listagg(DISTINCT o_orderstatus, ',')
                   WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
               ROUND(median(o_totalprice), 6) AS med_price,
               CAST(mode(least(l_linenumber, 5)) AS BIGINT) AS mode_linebucket
        FROM osp_orders JOIN osp_lineitem ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        """
    )


@register(
    "lateral_topk_customers",
    oracle="""
    SELECT n.n_name, x.c_custkey, ROUND(x.c_acctbal, 2) AS acctbal
    FROM nation n
    CROSS JOIN LATERAL (
        SELECT c_custkey, c_acctbal
        FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 2
    ) x
    """,
)
def lateral_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT: the two
    richest customers of every nation. The SQL-standard spelling of
    top-k-per-group — Catalyst decorrelates the lateral subquery into a
    join + per-key limit over one customer shuffle (NO nested-loop
    per-nation re-scan; asserted in tests/test_plans.py), the same
    physical shape as the window-function operator behind
    topk_orders_per_segment. Total order under the LIMIT (balance desc,
    key asc) per registry convention.
    """
    _view(spark, sf_dir, "nation", "lat_nation")
    _view(spark, sf_dir, "customer", "lat_customer")
    return spark.sql(
        """
        SELECT n.n_name, x.c_custkey, ROUND(x.c_acctbal, 2) AS acctbal
        FROM lat_nation n,
        LATERAL (
            SELECT c_custkey, c_acctbal
            FROM lat_customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) x
        """
    )


@register(
    "agg_percentile_within_group",
    oracle="""
    SELECT o_orderpriority,
           ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice), 6)
               AS price_p25,
           ROUND(percentile_cont(0.75) WITHIN GROUP (ORDER BY o_totalprice), 6)
               AS price_p75,
           ROUND(percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice), 6)
               AS price_p50_disc
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_percentile_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard inverse-distribution aggregates: exact
    ``percentile_cont`` (linear interpolation between adjacent order
    statistics) and ``percentile_disc`` (an actual data value) WITHIN
    GROUP. Both are exact order statistics over the group's multiset —
    deterministic on any engine; the single interpolation is one IEEE
    expression whose last-ulp slack the 6-dp surface rounding absorbs
    (registry convention). The exact ground-truth twin of
    ``approx_aggregates``' t-digest quantiles: at 100 TB the sort per
    group makes THIS the expensive form, which is exactly why the
    approximate variant exists alongside it.
    """
    _view(spark, sf_dir, "orders", "pwg_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice), 6)
                   AS price_p25,
               ROUND(percentile_cont(0.75) WITHIN GROUP (ORDER BY o_totalprice), 6)
                   AS price_p75,
               ROUND(percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice), 6)
                   AS price_p50_disc
        FROM pwg_orders
        GROUP BY o_orderpriority
        """
    )
