"""Advanced relational coverage: distinct/approx/statistical aggregates,
pivot, grouping sets, range window frames, ntile/percentiles, regex,
array and conditional scalar functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from masd_spark.queries import finite_events, finite_values, register
from masd_spark.sources.tables import load_table, register_views

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregates (SURVEY.md §2.4 marks these ABSENT in the
    reference). Spark plans multi-distinct via expand — one extra shuffle
    per distinct key set.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register("approx_aggregates")
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL distinct, t-digest percentiles) — the
    scale substitutes for exact distinct/median. Rows-only: HLL/t-digest
    implementations differ by engine, so there is no cross-engine oracle;
    accuracy is asserted against exact values in tests.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.percentile_approx("l_quantity", 0.25).alias("qty_q25"),
        F.percentile_approx("l_quantity", 0.75).alias("qty_q75"),
    )


# approx_count_distinct's default relative standard deviation is 0.05;
# 3x that (15%) is a >99.7% envelope a healthy HLL++ never leaves at
# these cardinalities. percentile_approx guarantees rank error
# <= 1/accuracy (default 1e-4); a +/-0.01 rank margin is 100x that, so
# the returned element's exact-quantile bracket check is deterministic
# for any conformant sketch while still failing on a broken one.
_ACD_BOUND = 3 * 0.05
_PCT_MARGIN = 0.01


@register(
    "approx_error_bounds",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS cd_within_bound,
           TRUE AS p50_within_bound,
           TRUE AS q25_within_bound,
           TRUE AS q75_within_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_error_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hash-checked error contract for ``approx_aggregates`` — the
    sketch_hll_error_bound pattern applied to Spark's HLL++ distinct and
    t-digest percentiles (estimates are engine-specific; their BOUNDS are
    portable facts). Per group: the exact distinct count plus booleans
    asserting (a) approx_count_distinct within 3x its documented rsd of
    exact, (b) each percentile_approx result inside the exact-quantile
    bracket [pct(p-0.01), pct(p+0.01)] — 100x the sketch's rank-error
    guarantee. The exact baselines are computed Spark-side and never
    emitted (interpolated floats aren't portable; booleans are), so the
    DuckDB twin states the contract and the value hash fails exactly
    when a sketch strays. The exact percentile/distinct shuffles exist
    only in this harness query — production keeps the sketches.
    """
    li = load_table(spark, sf_dir, "lineitem")

    # Optimization r8 (guide §2.3/§7.2, measured): mixing count_distinct
    # with the sketch/percentile aggregates made the planner's distinct
    # rewrite key the FIRST aggregation by (l_returnflag, l_partkey) —
    # every percentile/HLL object buffer was built per PARTKEY group
    # (~200k groups at sf0.1) and merged through a 63-column exchange of
    # serialized buffers. Splitting the exact distinct count into its own
    # codegen'd pre-aggregation keeps the object aggregation at 3 groups
    # with one buffer each; the exact percentile brackets collapse to one
    # sorted buffer per column via the array form (identical per-element
    # results — same Percentile aggregate, same input multiset). The
    # join is null-safe so a NULL returnflag group would survive exactly
    # as the single-aggregation form kept it.
    def bracket(col: str, p: float) -> tuple[float, float]:
        return (max(p - _PCT_MARGIN, 0.0), min(p + _PCT_MARGIN, 1.0))

    p50 = bracket("l_extendedprice", 0.5)
    q25 = bracket("l_quantity", 0.25)
    q75 = bracket("l_quantity", 0.75)
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("_acd"),
        F.percentile_approx("l_extendedprice", 0.5).alias("_a50"),
        F.expr(
            f"percentile(l_extendedprice, array({p50[0]}, {p50[1]}))"
        ).alias("_bp"),
        F.percentile_approx("l_quantity", 0.25).alias("_a25"),
        F.percentile_approx("l_quantity", 0.75).alias("_a75"),
        F.expr(
            f"percentile(l_quantity, "
            f"array({q25[0]}, {q25[1]}, {q75[0]}, {q75[1]}))"
        ).alias("_bq"),
    )
    exact_parts = (
        li.select("l_returnflag", "l_partkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count("l_partkey").alias("exact_parts"))
    )
    s, e = sketches.alias("s"), exact_parts.alias("e")
    joined = s.join(
        e,
        F.col("s.l_returnflag").eqNullSafe(F.col("e.l_returnflag")),
    )
    ex = F.col("e.exact_parts")
    return joined.select(
        F.col("s.l_returnflag").alias("l_returnflag"),
        ex.alias("exact_parts"),
        ((F.abs(F.col("_acd") - ex) / ex) <= F.lit(_ACD_BOUND)).alias(
            "cd_within_bound"
        ),
        (
            (F.col("_a50") >= F.col("_bp")[0])
            & (F.col("_a50") <= F.col("_bp")[1])
        ).alias("p50_within_bound"),
        (
            (F.col("_a25") >= F.col("_bq")[0])
            & (F.col("_a25") <= F.col("_bq")[1])
        ).alias("q25_within_bound"),
        (
            (F.col("_a75") >= F.col("_bq")[2])
            & (F.col("_a75") <= F.col("_bq")[3])
        ).alias("q75_within_bound"),
    )


@register(
    "agg_statistics",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates. Rounded coarsely (4 decimals for the
    price-scaled moments): both engines use streaming moment updates whose
    last bits differ with partitioned execution.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("covar_qty_disc"),
    )


@register(
    "pivot_value_by_event_type",
    oracle="""
    SELECT user_id,
           ROUND(AVG(CASE WHEN event_type = 'click' THEN value END), 6) AS click,
           ROUND(AVG(CASE WHEN event_type = 'error' THEN value END), 6) AS error,
           ROUND(AVG(CASE WHEN event_type = 'purchase' THEN value END), 6) AS purchase,
           ROUND(AVG(CASE WHEN event_type = 'signup' THEN value END), 6) AS signup,
           ROUND(AVG(CASE WHEN event_type = 'view' THEN value END), 6) AS view
    FROM events GROUP BY user_id
    """,
)
def pivot_value_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation) with an explicit value list — explicit
    lists keep the plan a single pass (no values-discovery job) and are
    mandatory for determinism at scale.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.round(F.avg("value"), 6))
    )


@register(
    "grouping_sets_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DECIMAL(28,2)) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (same Catalyst plan as the
    DataFrame rollup/cube family).

    Same empty-input-only grand-total divergence as
    rollup_lineitem_flags (see its docstring; pinned in
    tests/test_empty_inputs.py)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               CAST(CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DECIMAL(28,2)) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "window_trailing_range",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(count(*) OVER w AS BIGINT) AS n_trailing_90d,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
               AS spend_trailing_90d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate)
                 RANGE BETWEEN 7776000000 PRECEDING AND CURRENT ROW)
    """,
)
def window_trailing_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window: trailing-90-day order count and spend per
    customer (value-based frame over epoch-ms, identical in both engines;
    ties inside the frame don't affect frame membership).
    """
    o = load_table(spark, sf_dir, "orders").withColumn(
        "_ms", F.unix_millis("o_orderdate")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("_ms")
        .rangeBetween(-90 * 24 * 3600 * 1000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count("*").over(w).cast("bigint").alias("n_trailing_90d"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("spend_trailing_90d"),
    )


@register(
    "window_ntile_percentiles",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume
    FROM customer
    WHERE c_custkey IS NOT NULL
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal NULLS LAST, c_custkey)
    """,
)
def window_ntile_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist per segment with a unique
    tiebreaker in the ordering (c_acctbal has duplicate values).

    Null contract: a null c_acctbal ranks LAST in its segment — pinned
    explicitly on both sides because the engines' defaults disagree
    (Spark NULLS FIRST asc, DuckDB NULLS LAST asc). A null c_custkey is
    excluded: it is the unique tiebreaker, and two equal-balance rows
    both lacking it would take ntile's bucket split in arbitrary order.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey").isNotNull()
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.asc_nulls_last("c_acctbal"), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "scalar_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           regexp_matches(p_name, 'w.dget') AS is_widget,
           CAST(regexp_extract(p_brand, '(\\d+)', 1) AS BIGINT) AS brand_num
    FROM part
    """,
)
def scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar functions (extract/replace/match). Spark's
    regexp_replace is global by default; DuckDB needs the 'g' flag."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike("w.dget").alias("is_widget"),
        F.regexp_extract("p_brand", r"(\d+)", 1).cast("bigint").alias("brand_num"),
    )


@register(
    "scalar_arrays",
    oracle="""
    SELECT p_partkey,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
           string_split(p_name, ' ')[1] AS first_word,
           list_sort(string_split(p_name, ' '))[-1] AS max_word,
           array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_words,
           list_contains(string_split(p_name, ' '), 'widget') AS has_widget
    FROM part
    """,
)
def scalar_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar functions over split words — output scalars (joined
    strings / flags), since raw array columns don't hash portably across
    engines."""
    p = load_table(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.size(words).cast("bigint").alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(F.array_sort(words), -1).alias("max_word"),
        F.array_join(F.array_sort(words), ",").alias("sorted_words"),
        F.array_contains(words, "widget").alias("has_widget"),
    )


@register(
    "skew_salted_join",
    oracle="""
    SELECT s_name, count(*) AS n,
           CAST(CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DECIMAL(28,2)) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join (operators/skew.py): the hot-key mitigation must be
    result-identical to the plain join — so the plain join IS the oracle.
    """
    from masd_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_quantity"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    joined = salted_join(li, supp, ["s_suppkey"], n_salts=8)
    return joined.groupBy("s_name").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("sum_qty"),
    )


@register(
    "scalar_conditionals",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'O') AS status_or_null,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
           CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS size_bucket,
           least(o_totalprice, 100000.0) AS capped,
           greatest(o_totalprice - 100000.0, 0.0) AS excess
    FROM orders
    """,
)
def scalar_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null scalar functions: nullif, coalesce, CASE buckets,
    least/greatest."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")
        ).alias("status_label"),
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
        .alias("size_bucket"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("capped"),
        F.greatest(F.col("o_totalprice") - 100000.0, F.lit(0.0)).alias("excess"),
    )


@register(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
           l_quantity AS measure_value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long reshaping): three measure columns melt into
    (measure, value) rows — a single-pass Expand node, no shuffle, 3x the
    rows map-side. The inverse of pivot_value_by_event_type.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "measure_value",
    ).withColumn(
        "measure",
        F.regexp_replace("measure", "^l_", ""),
    )


@register(
    "scalar_higher_order",
    oracle="""
    WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
    SELECT p_partkey,
           array_to_string(list_transform(words, w -> upper(w)), ',') AS upper_words,
           CAST(len(list_filter(words, w -> length(w) > 5)) AS BIGINT) AS n_long_words,
           CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT) AS total_chars
    FROM w
    """,
)
def scalar_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — transform / filter / aggregate
    lambdas evaluated JVM-side per row (interpreted but no Python, no
    shuffle). Outputs joined strings / scalars per the repo's
    portable-hash convention.
    """
    p = load_table(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.array_join(F.transform(words, lambda w: F.upper(w)), ",").alias(
            "upper_words"
        ),
        F.size(F.filter(words, lambda w: F.length(w) > 5))
        .cast("bigint")
        .alias("n_long_words"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    )


@register(
    "agg_collect_sorted_orders",
    oracle="""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
               AS order_keys
    FROM orders GROUP BY o_custkey
    """,
)
def agg_collect_sorted_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list surfaced portably: per-customer order keys gathered,
    sorted NUMERICALLY, then joined to one string (raw arrays don't hash
    across engines; sorting after collect makes the result order-
    independent of partitioning). The grouped-gather every feature
    pipeline uses for sequence construction.
    """
    o = load_table(spark, sf_dir, "orders")
    keys_sorted = F.array_sort(F.collect_list("o_orderkey"))
    joined = F.array_join(F.transform(keys_sorted, lambda x: x.cast("string")), ",")
    return o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        # a group whose every o_orderkey is NULL gathers an empty list;
        # string_agg's no-input result is NULL, array_join('')'s is '' —
        # surface NULL on both engines
        F.when(F.size(keys_sorted) > 0, joined).alias("order_keys"),
    )


@register(
    "agg_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(median(l_quantity), 6) AS median_qty,
           ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
           ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median / continuous percentiles (vs the approx_aggregates
    t-digest path): both engines interpolate linearly, so values agree to
    rounding. Exact percentiles need a full sort per group — the approx
    variant is the 100 TB default; this is the ground truth.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 6).alias("p25_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 6).alias("p95_price"),
    )


@register(
    "histogram_event_values",
    oracle=finite_events("""
    SELECT event_type,
           CAST(CASE WHEN value < 0.0 THEN 0
                     WHEN value >= 400.0 THEN 11
                     ELSE floor((value - 0.0) / ((400.0 - 0.0) / 10)) + 1
                END AS BIGINT) AS bucket,
           count(*) AS n,
           min(value) AS lo,
           max(value) AS hi
    FROM events GROUP BY 1, 2
    """),
)
def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram per event type: width_bucket over [0, 400) in
    10 bins plus the under/overflow buckets (0 and 11; the fixture's
    value range [0.01, 490] exercises overflow). One partial+final agg —
    the profile-every-column primitive that runs over raw data before any
    pipeline decisions. The oracle spells out width_bucket's arithmetic
    (DuckDB lacks it); bin width 40 is float-exact so the bucket math
    cannot straddle engines.
    """
    ev = finite_values(load_table(spark, sf_dir, "events"))
    return (
        ev.groupBy(
            "event_type",
            F.width_bucket("value", F.lit(0.0), F.lit(400.0), F.lit(10))
            .cast("bigint")
            .alias("bucket"),
        )
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


@register(
    "agg_mad_robust",
    oracle=finite_events("""
    WITH med AS (
        SELECT event_type, median(value) AS med FROM events GROUP BY 1
    ),
    d AS (
        SELECT e.event_type, m.med, abs(e.value - m.med) AS ad
        FROM events e JOIN med m USING (event_type)
    )
    SELECT event_type,
           ROUND(min(med), 6) AS median_value,
           ROUND(median(ad), 6) AS mad
    FROM d GROUP BY 1
    """),
)
def agg_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event type — the outlier-robust
    spread statistic (a z-score built on mean/std is itself dragged by
    the outliers it should flag; median/MAD is not). Inherently two
    passes (the second median is over deviations from the first): two
    group-aggs + one broadcastable join of per-group medians back onto
    the fact rows. Exact interpolated medians on both engines.
    """
    ev = finite_values(load_table(spark, sf_dir, "events")).select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    d = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
    )
    return d.groupBy("event_type").agg(
        F.round(F.min("med"), 6).alias("median_value"),
        F.round(F.median("ad"), 6).alias("mad"),
    )


@register(
    "agg_bitmap_exact_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'ALL', CAST(count(DISTINCT user_id) AS BIGINT) FROM events
    """,
)
def agg_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting with mergeable state: per-(type, bucket)
    roaring-style bitmaps via bitmap_construct_agg — unlike HLL this is
    exact, and unlike count(DISTINCT) the state merges associatively
    (bitmap_or_agg), so per-shard partials combine without a re-shuffle
    of raw keys; per-key state is bits, not a hash set. The 'ALL' row is
    the OR-merge of the per-type bitmaps — the same few-KB-state
    mergeability story as the HLL query, but hash-checkable against
    DuckDB's plain count(DISTINCT).
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    buckets = ev.groupBy(
        "event_type", F.expr("bitmap_bucket_number(user_id)").alias("bn")
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("b")
    )
    per_type = buckets.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(b)")).alias("n_users")
    )
    merged = (
        buckets.groupBy("bn")
        .agg(F.expr("bitmap_or_agg(b)").alias("b"))
        # coalesce: count-distinct of an EMPTY input is 0, but a global
        # SUM over zero bucket rows is NULL — without it the 'ALL' row
        # diverges from count(DISTINCT) semantics on empty input
        .agg(
            F.coalesce(F.sum(F.expr("bitmap_count(b)")), F.lit(0))
            .cast("long")
            .alias("n_users")
        )
        .select(F.lit("ALL").alias("event_type"), "n_users")
    )
    return per_type.unionAll(merged)


_SESSION_GAP_MS = 21_600_000


@register(
    "session_window_native",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, epoch_ms(ts) AS ts_ms,
               CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                         OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w
                            >= {_SESSION_GAP_MS}
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WHERE ts IS NOT NULL  -- F.session_window drops null event times
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts))
    ),
    sess AS (
        SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS sid
        FROM marked
    )
    SELECT user_id, count(*) AS n_events,
           min(ts_ms) AS session_start_ms,
           max(ts_ms) + {_SESSION_GAP_MS} AS session_end_ms
    FROM sess GROUP BY user_id, sid
    """,
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window in BATCH mode (the same operator the
    streaming pipeline uses, so batch backfills and live sessions share
    one definition). Event times are ms-truncated before windowing so
    the engine's µs gap comparisons match the oracle's ms math; note the
    boundary semantics differ from the hand-rolled sessionize operator:
    half-open windows [t, t+gap) make diff == gap START a new session
    (oracle condition >=, vs > in sessionize_events) — both definitions
    are legitimate; pinning both here makes the difference explicit.
    window.end is last-event + gap by definition.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.timestamp_millis(F.expr("ts div 1000000")).alias("event_time"),
    )
    s = ev.groupBy(
        "user_id",
        F.session_window("event_time", f"{_SESSION_GAP_MS} milliseconds"),
    ).agg(F.count("*").alias("n_events"))
    return s.select(
        "user_id",
        "n_events",
        F.unix_millis("session_window.start").alias("session_start_ms"),
        F.unix_millis("session_window.end").alias("session_end_ms"),
    )


@register(
    "clean_winsorize_values",
    oracle=finite_events("""
    WITH pct AS (
        SELECT event_type,
               quantile_disc(value, 0.05) AS p05,
               quantile_disc(value, 0.95) AS p95
        FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND(least(greatest(e.value, p.p05), p.p95), 6)
               AS value_winsorized,
           (e.value < p.p05 OR e.value > p.p95) AS was_clipped
    FROM events e JOIN pct p USING (event_type)
    """),
)
def clean_winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clip each event's value into its type's empirical
    [p05, p95] band — outlier suppression before model features. The
    per-type thresholds are a tiny aggregate (one sort per group)
    broadcast back onto the stream, so the clip itself is map-side
    codegen over the full table; the fact table is never shuffled.

    Thresholds are DISCRETE percentiles (actual data values), not
    interpolated ones — a round-6 SF1 finding: the engines' linear
    interpolation arithmetic differs in the last ulp, and once a
    threshold lands within an ulp of a real data value the strict
    `value < p05` clip flag FLIPS between engines (at SF1 the p05 of one
    type hit a value exactly). An order statistic is selected, never
    computed, so it is bit-identical on any engine at any scale — and
    clipping to an observed value is the textbook definition of
    winsorization anyway.
    """
    ev = finite_values(load_table(spark, sf_dir, "events")).select(
        "event_id", "event_type", "value"
    )
    pct = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY value)").alias("p05"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias("p95"),
    )
    return ev.join(F.broadcast(pct), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.round(
            F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95")), 6
        ).alias("value_winsorized"),
        ((F.col("value") < F.col("p05")) | (F.col("value") > F.col("p95"))).alias(
            "was_clipped"
        ),
    )


@register(
    "histogram_equidepth_deciles",
    oracle="""
    WITH t AS (
        SELECT event_type, value, event_id,
               ntile(10) OVER (PARTITION BY event_type
                               ORDER BY value, event_id NULLS LAST) AS decile
        FROM events
        WHERE value IS NOT NULL  -- a null value has no place in the CDF
    )
    SELECT event_type, CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n,
           min(value) AS lo,
           max(value) AS hi
    FROM t GROUP BY 1, 2
    """,
)
def histogram_equidepth_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram per event type — the profiling
    complement to the fixed-bin histogram: bucket EDGES adapt to the
    distribution, counts stay balanced. ntile over a total order
    (value, event_id) makes bucket membership deterministic under
    duplicate values, and both engines define ntile identically
    (remainder rows go to the leading buckets). One sort exchange per
    type feeds both the tiling and the per-bucket agg. At 100 TB the
    exact sort gives way to approx_percentile edges — registered here as
    the ground-truth variant, like exact-vs-approx percentiles.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy(
        "value", F.asc_nulls_last("event_id")
    )
    return (
        ev.select("event_type", "value", F.ntile(10).over(w).alias("decile"))
        .groupBy("event_type", "decile")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .select(
            "event_type",
            F.col("decile").cast("long").alias("decile"),
            "n",
            "lo",
            "hi",
        )
    )
