"""Wider TPC-H-shaped relational coverage (Q6/Q7/Q10/Q14/Q18/Q19 shapes).

The reference has no relational surface at all (SURVEY.md §2.3); these
queries extend the q1/q3/q5 family with the remaining canonical OLAP
shapes — selective single-table scan, bi-dimensional volume join,
returned-items top-k, conditional-ratio agg, HAVING-subquery, and a
disjunctive multi-column pushdown — each adapted to the fixture's
trimmed columns (no shipmode/commitdate/partsupp).

Scale notes: only nation (25 rows, constant) is explicitly broadcast;
part/supplier/customer all grow with SF, so their joins stay shuffle
equi-joins for AQE to re-plan (at sf0.01 AQE broadcasts them at
runtime — asserted in tests/test_plans.py for q3/q5; same machinery
here). Parity conventions per masd_spark/queries/__init__.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from masd_spark.queries import register
from masd_spark.sources.tables import load_table


def _dec_sum(expr: Column) -> Column:
    """Engine-portable exact money sum; same chain and rationale as
    queries/relational.py:_dec_sum (round to scale 2 before the double
    cast so the conversion stays exact below unscaled 2^53 — the SF1
    one-ulp divergence fix)."""
    return (
        F.round(F.sum(expr.cast("decimal(18,6)")), 2)
        .cast("decimal(28,2)")
        .cast("double")
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _ts(lit: str) -> Column:
    return F.lit(lit).cast("timestamp")


_REVENUE = "CAST(CAST(round(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DECIMAL(28,2)) AS DOUBLE)"


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(CAST(round(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DECIMAL(28,2)) AS DOUBLE)
               AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue (TPC-H Q6 shape): the pure-pushdown query. All
    four predicates and the 3-column projection reach the parquet scan
    (PushedFilters); the agg collapses to one row — at 100 TB this is
    scan-bandwidth-bound with near-zero shuffle.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        _dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue")
    )


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           {_REVENUE} AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bi-nation volume (TPC-H Q7 shape): 5-way join, revenue between a
    nation pair in both directions by ship year. The two nation copies
    are explicitly broadcast (constant 25 rows); supplier/customer/orders
    joins stay shuffle equi-joins — AQE may demote them to broadcast at
    runtime where a side proves small, which is the right call at any SF.
    The nation filter applies BEFORE the fact joins, so only the pair's
    rows shuffle.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
        )
    )
    supp = _t(spark, sf_dir, "supplier").join(
        n1, F.col("s_nationkey") == F.col("s_nk")
    ).select("s_suppkey", "supp_nation")
    cust = _t(spark, sf_dir, "customer").join(
        n2, F.col("c_nationkey") == F.col("c_nk")
    ).select("c_custkey", "cust_nation")
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(_t(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {_REVENUE} AS revenue,
           c_acctbal
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): which customers returned
    the most revenue in a quarter. Both fact filters (order quarter,
    returnflag) push to the scans before the order-key shuffle; nation is
    broadcast; top-20 is TakeOrderedAndProject (per-partition heaps, no
    global sort).
    """
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1999-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1999-04-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        _t(spark, sf_dir, "customer")
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nation, F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(
        100.0 * CAST(CAST(round(SUM(CAST(CASE WHEN p_type = 'PROMO'
                    THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                    AS DECIMAL(18,6))), 2) AS DECIMAL(28,2)) AS DOUBLE)
              / CAST(CAST(round(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,6))), 2) AS DECIMAL(28,2)) AS DOUBLE), 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (TPC-H Q14 shape): conditional-ratio aggregate —
    % of one month's revenue from PROMO parts. The month filter pushes to
    the fact scan, so the part join only sees one month of rows; both
    sums ride one partial+final agg (no second pass for the ratio).
    Decimal sums make numerator/denominator order-independent; only the
    final ratio is a rounded double.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-10-01 00:00:00"))
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.join(
            _t(spark, sf_dir, "part"), F.col("p_partkey") == F.col("l_partkey")
        )
        .agg(
            F.round(100.0 * _dec_sum(promo) / _dec_sum(disc), 6).alias(
                "promo_revenue_pct"
            )
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 300
    )
    SELECT c_custkey, c_name, o_orderkey,
           epoch_ms(o_orderdate) AS o_orderdate_ms,
           o_totalprice,
           CAST(CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DECIMAL(28,2)) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18 shape): HAVING-subquery filter.
    The big-order keyset is computed with one partial+final agg over the
    fact and SEMI-joined back on the same key — Catalyst reuses the
    l_orderkey partitioning, so the probe adds no extra fact shuffle, and
    the keyset (selective by construction) never leaves the cluster.
    """
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 300)
        .select("l_orderkey")
    )
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(_t(spark, sf_dir, "customer"), F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_dec_sum(F.col("l_quantity")).alias("sum_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_millis("o_orderdate").alias("o_orderdate_ms"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {_REVENUE} AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted-revenue OR-of-ANDs (TPC-H Q19 shape). Catalyst splits
    the disjunction: per-side implied predicates (p_brand IN (...),
    l_quantity <= 30) push to each scan even though the full condition
    needs both tables, so the join probes a fraction of each side.
    """
    def band(brand: str, size_hi: int, q_lo: int, q_hi: int) -> Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    cond = (
        band("Brand#12", 5, 1, 11)
        | band("Brand#23", 10, 10, 20)
        | band("Brand#24", 15, 20, 30)
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .join(_t(spark, sf_dir, "part"), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )
