"""Completion of the TPC-H sweep: the 13 query shapes not yet covered by
queries/relational.py (q1/q3/q5) and queries/tpch_extra.py (q6/q7/q10/
q14/q18/q19) — q2, q4, q8, q9, q11, q12, q13, q15, q16, q17, q20, q21,
q22.

The fixture trims the canonical schema (no partsupp, l_shipmode,
l_commitdate/receiptdate, c_phone, comments), so the queries that
reference those columns are ADAPTED: each keeps the canonical PLAN SHAPE
(the thing that matters at 100 TB — correlated-min decorrelation,
EXISTS/NOT-EXISTS on the same fact, scalar-subquery HAVING, NOT-IN
anti-join, two-level re-aggregation) with documented stand-in predicates:

- q2: lineitem's (part, supplier) unit-price pairs stand in for partsupp
- q4/q12/q21: shipping delay (datediff orderdate->shipdate) stands in for
  the commit/receipt lateness columns
- q9: 0.5 * p_retailprice stands in for ps_supplycost
- q11: observed supply value from lineitem stands in for availqty*cost
- q16: s_acctbal < 0 stands in for the supplier-complaints NOT IN list
- q22: nationkey set + "no order since 2000-06" stand in for phone
  country codes + the empty-order anti-join (every fixture customer has
  SOME order)

Parity conventions per masd_spark/queries/__init__.py: decimal-quantized
double sums, epoch-ms timestamps, deterministic tiebreakers on every
LIMIT, avg derived from decimal sum / count so scalar-subquery
comparisons cannot flip between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from masd_spark.queries import register
from masd_spark.queries.tpch_extra import _dec_sum, _t, _ts
from masd_spark.sources.tables import load_table  # noqa: F401  (re-export habit)

_REVENUE = "CAST(CAST(round(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DECIMAL(28,2)) AS DOUBLE)"


def _nation_of_region(spark: SparkSession, sf_dir: str, r_name: str) -> DataFrame:
    """Broadcast-able (n_nationkey, n_name) dim restricted to one region."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == r_name)
    return F.broadcast(
        nation.join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
        ).select("n_nationkey", "n_name")
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH eu_supp AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
    ),
    cost AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem
        WHERE l_suppkey IN (SELECT s_suppkey FROM eu_supp)
        GROUP BY 1, 2
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           ROUND(unit_cost, 6) AS unit_cost
    FROM cost
    JOIN part ON p_partkey = partkey
    JOIN eu_supp ON s_suppkey = suppkey
    WHERE p_size <= 5 AND p_type = 'LARGE'
      AND unit_cost = (SELECT min(c2.unit_cost) FROM cost c2
                       WHERE c2.partkey = cost.partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape): the correlated-min
    subquery, decorrelated the way an optimizer must at scale — per-pair
    unit costs aggregate once, the per-part MIN is a second partial+final
    agg on the SAME key (no re-shuffle), and the equality probe is an
    equi-join, never a per-row subquery. Region/nation dims broadcast;
    the part filter prunes before the final join. lineitem's (part,
    supplier) unit prices stand in for the fixture's missing partsupp.
    """
    eu = _nation_of_region(spark, sf_dir, "EUROPE")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(eu, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        _t(spark, sf_dir, "lineitem")
        .join(
            supp.select("s_suppkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = cost.groupBy("partkey").agg(F.min("unit_cost").alias("best_cost"))
    parts = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 5) & (F.col("p_type") == "LARGE")
    )
    return (
        cost.join(best, "partkey")
        .filter(F.col("unit_cost") == F.col("best_cost"))
        .join(parts, F.col("p_partkey") == F.col("partkey"))
        .join(supp, F.col("s_suppkey") == F.col("suppkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND date_diff('day', o_orderdate, l_shipdate) > 90)
    GROUP BY 1
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape): EXISTS against the fact,
    executed as a LEFT SEMI join on the order key — the quarter filter
    pushes to the orders scan first, so only one quarter's keys shuffle;
    the lateness predicate (shipdate > orderdate + 90d stands in for the
    missing commit/receipt columns) rides the join condition.
    """
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-07-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-10-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q8_market_share",
    oracle=f"""
    WITH vol AS (
        SELECT year(o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n1.n_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           ROUND(
             CAST(CAST(round(SUM(CAST(CASE WHEN supp_nation = 'NATION_7' THEN volume
                                ELSE 0 END AS DECIMAL(18,6))), 2) AS DECIMAL(28,2)) AS DOUBLE)
           / CAST(CAST(round(SUM(CAST(volume AS DECIMAL(18,6))), 2) AS DECIMAL(28,2)) AS DOUBLE), 6)
               AS mkt_share
    FROM vol GROUP BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): NATION_7's share of ASIA's
    ECONOMY-part revenue per order year. Both share terms ride ONE
    partial+final agg (conditional numerator, no second pass); nation and
    region dims broadcast; the customer-region restriction prunes before
    the fact shuffle.
    """
    asia = _nation_of_region(spark, sf_dir, "ASIA")
    cust = (
        _t(spark, sf_dir, "customer")
        .join(asia, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    supp_n = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    parts = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        _t(spark, sf_dir, "lineitem")
        .join(parts, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(supp_n, F.col("s_suppkey") == F.col("l_suppkey"))
    )
    return base.groupBy(
        F.year("o_orderdate").cast("bigint").alias("o_year")
    ).agg(
        F.round(
            _dec_sum(F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(F.lit(0.0)))
            / _dec_sum(vol),
            6,
        ).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
           CAST(CAST(round(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - 0.5 * p_retailprice * l_quantity
                    AS DECIMAL(18,6))), 2) AS DECIMAL(28,2)) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 shape): profit by supplier nation
    and ship year for parts matching a name pattern. The LIKE filter
    prunes part BEFORE its join (the only predicate in canonical Q9), and
    0.5*p_retailprice stands in for the missing ps_supplycost. One fact
    shuffle on the part key, supplier/nation dims broadcast.
    """
    parts = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp_n = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .join(parts, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp_n, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("nation", F.year("l_shipdate").cast("bigint").alias("o_year"))
        .agg(_dec_sum(profit).alias("profit"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH supply AS (
        SELECT l_partkey AS partkey,
               CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DECIMAL(28,2)) AS DOUBLE)
                   AS value
        FROM lineitem
        WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                            JOIN nation ON n_nationkey = s_nationkey
                            WHERE n_name = 'NATION_2')
        GROUP BY 1
    )
    SELECT partkey, value FROM supply
    WHERE value > (SELECT 0.001 * CAST(CAST(round(SUM(CAST(value AS DECIMAL(18,6)))
                                      , 2) AS DECIMAL(28,2)) AS DOUBLE)
                   FROM supply)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock (TPC-H Q11 shape): per-part supply value for one
    nation's suppliers, kept only when above a FRACTION OF THE GLOBAL
    TOTAL — the scalar-subquery HAVING. The threshold is a 1-row
    broadcast cross join (never a driver round-trip); the per-part agg is
    localCheckpoint'ed so the threshold pass reuses it instead of
    recomputing the join lineage (the repo's measured cache-bypass rule).
    Observed lineitem value stands in for availqty*supplycost.
    """
    nat2 = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    supply = (
        _t(spark, sf_dir, "lineitem")
        .join(nat2, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(_dec_sum(F.col("l_extendedprice")).alias("value"))
        .localCheckpoint(eager=True)
    )
    threshold = supply.agg(
        (0.001 * _dec_sum(F.col("value"))).alias("_thresh")
    )
    return (
        supply.crossJoin(F.broadcast(threshold))
        .filter(F.col("value") > F.col("_thresh"))
        .select("partkey", "value")
    )


@register(
    "q12_shipping_delay_priority",
    oracle="""
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
                THEN 'FAST'
                WHEN date_diff('day', o_orderdate, l_shipdate) <= 90
                THEN 'NORMAL' ELSE 'SLOW' END AS delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q12_shipping_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-mode priority (TPC-H Q12 shape): conditional counts of
    high/low-priority lines per derived shipping-delay bucket (the
    fixture has no l_shipmode — delay buckets stand in). The year filter
    pushes to the fact scan; both counts ride one partial+final agg.
    """
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "FAST").when(delay <= 90, "NORMAL").otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    return (
        _t(spark, sf_dir, "orders")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON o_custkey = c_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY 1
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           count(*) AS custdist
    FROM per_cust GROUP BY 1
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): LEFT join
    with the filter ON THE JOIN CONDITION (not a WHERE — customers whose
    every order is filtered away must still appear with count 0), then a
    second aggregation over the first's output. The non-urgent predicate
    stands in for the canonical o_comment NOT LIKE. Two shuffles total:
    custkey, then the tiny c_count histogram.
    """
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        _t(spark, sf_dir, "customer")
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy(F.col("c_count").cast("bigint").alias("c_count"))
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {_REVENUE} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15 shape, the revenue 'view'): quarter
    revenue per supplier, keep the max. Decimal sums make the max
    comparison engine-stable; the scalar max is a 1-row broadcast; the
    revenue agg is localCheckpoint'ed so max and probe reuse one
    computation. Supplier dim joins AFTER the reduction — only winners
    reach it.
    """
    rev = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("total_revenue")
        )
        .localCheckpoint(eager=True)
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(
            _t(spark, sf_dir, "supplier"),
            F.col("s_suppkey") == F.col("supplier_no"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13)
      -- NOT EXISTS, not NOT IN: one NULL s_suppkey in the blacklist
      -- makes NOT IN return UNKNOWN for EVERY row (empty result); the
      -- anti-join semantics ("exclude suppliers KNOWN blacklisted") is
      -- the engine contract, and NOT EXISTS is its null-sane SQL twin
      AND NOT EXISTS (SELECT 1 FROM supplier
                      WHERE s_suppkey = l_suppkey AND s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship (TPC-H Q16 shape): distinct suppliers
    per (brand, type, size) excluding a NOT-IN supplier list — executed
    as a broadcast ANTI join (the blacklist is tiny and null-free by
    construction; negative acctbal stands in for the complaints comment
    scan). Part filters prune before the fact join.
    """
    parts = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13)
    )
    blacklist = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .join(blacklist, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(parts, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH target AS (
        SELECT p_partkey FROM part
        WHERE p_brand = 'Brand#3' AND p_size <= 10
    ),
    li AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM target)
    ),
    avg_q AS (
        SELECT l_partkey AS partkey,
               CAST(CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DECIMAL(28,2)) AS DOUBLE)
                   / count(*) AS avg_qty
        FROM li GROUP BY 1
    )
    SELECT ROUND(CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                     , 2) AS DECIMAL(28,2)) AS DOUBLE) / 7.0, 6) AS avg_yearly
    FROM li JOIN avg_q ON partkey = l_partkey
    WHERE l_quantity < 0.2 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): the correlated AVG
    subquery, decorrelated into a per-part aggregate joined back on the
    part key — same-key shuffle reuse, no per-row subquery. The average
    is decimal-sum / count so the 0.2*avg comparison lands identically in
    every engine (quantities are integral doubles; a last-ULP avg
    difference WOULD flip rows). Brand+size stand in for brand+container.
    """
    target = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(target, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    avg_q = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("avg_qty")
    )
    return (
        li.join(avg_q, F.col("partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double")
                / 7.0,
                6,
            ).alias("avg_yearly")
        )
    )


@register(
    "q20_promo_part_suppliers",
    oracle="""
    WITH promo_parts AS (
        SELECT p_partkey FROM part WHERE p_type = 'PROMO'
    ),
    heavy AS (
        SELECT l_suppkey
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM promo_parts)
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 30
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (SELECT l_suppkey FROM heavy)
    ORDER BY s_name
    """,
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion (TPC-H Q20 shape): the nested-IN chain —
    parts IN a type filter, (supplier, part) pairs HAVING a year's
    shipped quantity over threshold, suppliers IN the surviving pair set
    — each level decorrelated to a SEMI join, so nothing ever expands:
    the fact reduces to pairs, pairs reduce to supplier keys, and only
    the region's suppliers surface. Shipped quantity stands in for the
    missing availqty.
    """
    promo = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    heavy = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
        )
        .join(promo, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 30)
        .select("l_suppkey")
    )
    eu = _nation_of_region(spark, sf_dir, "EUROPE")
    return (
        _t(spark, sf_dir, "supplier")
        .join(eu, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
          AND date_diff('day', o_orderdate, l_shipdate) > 90
        GROUP BY 1, 2
    )
    SELECT s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'EUROPE'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY 1
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape): the
    EXISTS + NOT-EXISTS pair on the same fact. Executed as ONE per-order
    aggregation — distinct supplier count and distinct LATE supplier
    count — so both quantified predicates become scalar comparisons
    (n_supp > 1, n_late_supp == 1) instead of two more fact joins; the
    oracle states the literal EXISTS form, pinning the decorrelation
    correct. Late = shipped >90 days after ordering (stand-in for
    receipt>commit); region dims broadcast.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders_f = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    lines = li.join(
        orders_f.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90).alias("_late"),
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    late_pairs = (
        lines.filter(F.col("_late")).select("l_orderkey", "l_suppkey").distinct()
    )
    eu_supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            _nation_of_region(spark, sf_dir, "EUROPE"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        late_pairs.join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(eu_supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@register(
    "q22_idle_customers",
    oracle="""
    WITH pool AS (
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer WHERE c_nationkey IN (2, 5, 7, 11, 17)
    ),
    cutoff AS (
        SELECT CAST(CAST(round(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DECIMAL(28,2)) AS DOUBLE)
               / count(*) AS avg_bal
        FROM pool WHERE c_acctbal > 0.0
    )
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
           count(*) AS numcust,
           CAST(CAST(round(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DECIMAL(28,2)) AS DOUBLE)
               AS totacctbal
    FROM pool
    WHERE c_acctbal > (SELECT avg_bal FROM cutoff)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
    GROUP BY 1
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity (TPC-H Q22 shape): well-funded customers
    gone idle. Scalar-subquery cutoff (decimal-exact average, so the
    comparison cannot flip between engines) + ANTI join against recent
    orders (every fixture customer has SOME order, so 'idle since
    2000-06' stands in for the canonical no-orders-at-all; nationkey set
    stands in for phone country codes). The anti probe pushes its date
    filter to the orders scan.
    """
    pool = _t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(2, 5, 7, 11, 17)
    )
    cutoff = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("2000-06-01 00:00:00")
    )
    return (
        pool.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("bigint").alias("c_nationkey"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )
