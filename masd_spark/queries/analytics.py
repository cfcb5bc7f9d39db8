"""Product-analytics query shapes over the events stream: ordered
funnels and cohort retention. Pure relational compositions (conditional
min-aggregates + joins), so both are fully oracle-checked; the scale
notes are in each docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from masd_spark.queries import finite_events, finite_values, register
from masd_spark.sources.tables import load_table

_DAY_MS = 86_400_000


def _events_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts div 1000000").alias("ts_ms")
    )


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events
    ),
    v AS (
        SELECT user_id, min(ts_ms) AS t1
        FROM e WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, min(ts_ms) AS t2
        FROM e JOIN v USING (user_id)
        WHERE event_type = 'click' AND ts_ms > t1 GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, min(ts_ms) AS t3
        FROM e JOIN c USING (user_id)
        WHERE event_type = 'purchase' AND ts_ms > t2 GROUP BY 1
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_view_click_purchase
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a user counts
    at step N only with an event strictly after their step-N-1 entry
    time. Each step is one filtered aggregation joined to the previous
    step's per-user entry times — per-step state is one row per
    surviving user, shuffled on user_id (the same partitioning every
    step, so at scale the exchanges after step 1 are reusable); no
    window over full event history, no self-join of events x events.
    """
    e = _events_ms(spark, sf_dir)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_ms") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_ms") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t3"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_view_click_purchase")))
    )


@register(
    "cohort_retention_daily",
    oracle=f"""
    WITH e AS (
        SELECT user_id, epoch_ms(ts) // {_DAY_MS} AS day FROM events
    ),
    firstday AS (
        SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1
    ),
    act AS (
        SELECT DISTINCT e.user_id, cohort_day, day - cohort_day AS day_offset
        FROM e JOIN firstday USING (user_id)
    )
    SELECT cohort_day, day_offset, CAST(count(*) AS BIGINT) AS n_users
    FROM act GROUP BY 1, 2
    """,
)
def cohort_retention_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active day,
    counted once per (cohort, day-offset) they return on. Day indexes
    are integer epoch-day math (no timezone/calendar dependence). Two
    shuffles on user_id (first-day agg + the distinct) and a final
    small-key agg; the events-to-cohort join is user-keyed, reusing the
    first aggregation's partitioning — no date dimension table needed.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"(ts div 1000000) div {_DAY_MS}").alias("day")
    )
    first = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = (
        e.join(first, "user_id")
        .select(
            "user_id", "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .distinct()
    )
    return act.groupBy("cohort_day", "day_offset").agg(
        F.count("*").alias("n_users")
    )


@register(
    "streak_longest_daily",
    oracle=f"""
    WITH days AS (
        SELECT DISTINCT user_id, epoch_ms(ts) // {_DAY_MS} AS day FROM events
    ),
    grp AS (
        SELECT user_id, day,
               day - row_number() OVER (PARTITION BY user_id ORDER BY day)
                   AS island
        FROM days
    ),
    streaks AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS len,
               min(day) AS start_day
        FROM grp GROUP BY user_id, island
    )
    SELECT user_id, len AS longest_streak_days, start_day AS streak_start_day
    FROM streaks
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY len DESC, start_day) = 1
    """,
)
def streak_longest_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands shape (day minus per-user day-rank is constant
    within a run of consecutive days). One distinct + two windows over
    the SAME user partitioning (exchange reused) + one agg: no
    self-join against a calendar, output one row per user regardless of
    history length. Earliest streak wins length ties (deterministic).
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"(ts div 1000000) div {_DAY_MS}").alias("day")
    )
    days = e.distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.withColumn("island", F.col("day") - F.row_number().over(w))
    streaks = grp.groupBy("user_id", "island").agg(
        F.count("*").alias("len"), F.min("day").alias("start_day")
    )
    w2 = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), F.col("start_day")
    )
    return (
        streaks.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            F.col("len").alias("longest_streak_days"),
            F.col("start_day").alias("streak_start_day"),
        )
    )


# 2024-01-15T00:00:00Z — splits the fixture's 30-day window in half.
_PSI_SPLIT_MS = 1_705_276_800_000


@register(
    "drift_psi_value_dist",
    oracle=f"""
    WITH e AS (
        SELECT event_type,
               CASE WHEN value < 0 THEN 0
                    WHEN value >= 400 THEN 11
                    ELSE CAST(floor(value / 40) AS BIGINT) + 1 END AS bucket,
               (epoch_ms(ts) < {_PSI_SPLIT_MS}) AS in_a
        FROM events
    ),
    counts AS (
        SELECT event_type, bucket,
               sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS cb
        FROM e GROUP BY 1, 2
    ),
    probs AS (
        SELECT event_type, bucket, ca, cb,
               sum(ca) OVER (PARTITION BY event_type) AS na,
               sum(cb) OVER (PARTITION BY event_type) AS nb,
               count(*) OVER (PARTITION BY event_type) AS nbuckets
        FROM counts
    ),
    terms AS (
        SELECT event_type,
               CAST(((ca + 1.0) / (na + nbuckets) - (cb + 1.0) / (nb + nbuckets))
                    * ln(((ca + 1.0) / (na + nbuckets))
                         / ((cb + 1.0) / (nb + nbuckets)))
                    AS DECIMAL(18,8)) AS term
        FROM probs
    )
    SELECT event_type, ROUND(CAST(sum(term) AS DOUBLE), 6) AS psi
    FROM terms GROUP BY 1
    """,
)
def drift_psi_value_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor: the value distribution
    of each event type in the first half of the window vs the second
    (fixed bins, Laplace-smoothed over buckets observed in either
    period). PSI is THE production gate for 'did this feed silently
    change' — cheap enough to run on every ingest batch: one
    partial+final agg to a 12-bucket-per-type grid, window sums over
    that tiny grid, nothing else touches the fact table. Per-bucket
    terms are decimal-quantized so the fold is order-independent
    (cross-engine exact).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "CASE WHEN value < 0 THEN 0 WHEN value >= 400 THEN 11 "
            "ELSE CAST(floor(value / 40) AS BIGINT) + 1 END"
        ).alias("bucket"),
        (F.expr("ts div 1000000") < _PSI_SPLIT_MS).alias("in_a"),
    )
    counts = ev.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).alias("cb"),
    )
    wt = Window.partitionBy("event_type")
    probs = counts.select(
        "event_type",
        "ca",
        "cb",
        F.sum("ca").over(wt).alias("na"),
        F.sum("cb").over(wt).alias("nb"),
        F.count("*").over(wt).alias("nbuckets"),
    )
    pa = (F.col("ca") + 1.0) / (F.col("na") + F.col("nbuckets"))
    pb = (F.col("cb") + 1.0) / (F.col("nb") + F.col("nbuckets"))
    terms = probs.select(
        "event_type",
        ((pa - pb) * F.log(pa / pb)).cast("decimal(18,8)").alias("term"),
    )
    return terms.groupBy("event_type").agg(
        F.round(F.sum("term").cast("double"), 6).alias("psi")
    )


@register(
    "diag_key_skew",
    oracle="""
    WITH per_key AS (
        SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(max(cnt) AS BIGINT) AS max_per_key,
           ROUND(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS top1_share,
           ROUND(quantile_cont(cnt, 0.99), 6) AS p99,
           ROUND(quantile_cont(cnt, 0.50), 6) AS p50
    FROM per_key
    """,
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic for the lineitem order key — the number
    you check BEFORE picking a join strategy at 100 TB (a top1_share
    near 1/n_partitions means one reducer owns a partition's worth of
    one key -> salt or AQE skew-join; a flat p99/p50 means plain hash
    partitioning is fine). One partial+final count per key, then a
    six-number summary — cost is one shuffle of key counts, output is
    one row regardless of scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count("*").alias("cnt"))
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_per_key"),
        F.round(F.max("cnt").cast("double") / F.sum("cnt"), 6).alias("top1_share"),
        F.round(F.percentile("cnt", F.lit(0.99)), 6).alias("p99"),
        F.round(F.percentile("cnt", F.lit(0.50)), 6).alias("p50"),
    )


@register(
    "stat_daily_value_correlation",
    oracle=finite_events(f"""
    WITH e AS (
        SELECT epoch_ms(ts) // {_DAY_MS} AS day, event_type,
               CAST(value AS DECIMAL(18,6)) AS vq
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    daily AS (
        SELECT day, event_type,
               CAST(round((CAST(sum(vq) AS DOUBLE) / count(*)) * 1000000)
                    AS BIGINT) AS m6
        FROM e GROUP BY 1, 2
    ),
    pairs AS (
        SELECT day,
               max(CASE WHEN event_type = 'click' THEN m6 END) AS x,
               max(CASE WHEN event_type = 'purchase' THEN m6 END) AS y
        FROM daily GROUP BY 1
        HAVING max(CASE WHEN event_type = 'click' THEN m6 END) IS NOT NULL
           AND max(CASE WHEN event_type = 'purchase' THEN m6 END) IS NOT NULL
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM pairs
    )
    SELECT n AS n_days,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                 6) AS pearson_r
    FROM s
    """),
)
def stat_daily_value_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between the daily mean values of two event
    series (click vs purchase), paired by day. Portable-numerics
    construction: daily means come from decimal-quantized sums (exact),
    are snapped to integer micro-units, and the five correlation sums
    are exact BIGINTs — the only floating point is the final closed-form
    ratio over identical integer inputs, so both engines emit identical
    bits. Two aggs + a 30-row reduction; the fact table is touched once.
    """
    e = finite_values(load_table(spark, sf_dir, "events")).filter(
        F.col("event_type").isin("click", "purchase")
    ).select(
        F.expr(f"(ts div 1000000) div {_DAY_MS}").alias("day"),
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("vq"),
    )
    daily = e.groupBy("day", "event_type").agg(
        F.round((F.sum("vq").cast("double") / F.count("*")) * 1e6)
        .cast("bigint")
        .alias("m6")
    )
    pairs = (
        daily.groupBy("day")
        .agg(
            F.max(F.when(F.col("event_type") == "click", F.col("m6"))).alias("x"),
            F.max(F.when(F.col("event_type") == "purchase", F.col("m6"))).alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    s = pairs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n").cast("double"), F.col("sx").cast("double"), F.col("sy").cast("double")
    num = n * F.col("sxy") - sx * F.col("sy")
    den = F.sqrt(
        (n * F.col("sxx") - sx * F.col("sx")) * (n * F.col("syy") - sy * F.col("sy"))
    )
    return s.select(
        F.col("n").alias("n_days"), F.round(num / den, 6).alias("pearson_r")
    )


@register(
    "stat_chi2_type_by_dow",
    oracle=f"""
    WITH obs AS (
        SELECT event_type, (epoch_ms(ts) // {_DAY_MS}) % 7 AS dow,
               count(*) AS o
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, dow, o,
               sum(o) OVER (PARTITION BY event_type) AS row_t,
               sum(o) OVER (PARTITION BY dow) AS col_t,
               sum(o) OVER () AS grand
        FROM obs
    ),
    terms AS (
        SELECT CAST(round(
                   power(o - CAST(row_t AS DOUBLE) * col_t / grand, 2)
                   / (CAST(row_t AS DOUBLE) * col_t / grand) * 100000000)
               AS BIGINT) AS t8,
               event_type, dow
        FROM tot
    )
    SELECT ROUND(CAST(sum(t8) AS DOUBLE) / 100000000, 6) AS chi2,
           CAST((count(DISTINCT event_type) - 1)
                * (count(DISTINCT dow) - 1) AS BIGINT) AS dof
    FROM terms
    """,
)
def stat_chi2_type_by_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic for event type x day-of-week
    (integer epoch-day mod 7 — calendar-free). Cell terms are computed
    in double from exact integer marginals (identical bits both
    engines), snapped to 1e-8 integer units, and summed exactly — the
    order-independent fold recipe. One count-grid agg over the fact
    table, window sums over the 35-cell grid, one-row output: the
    'is this feed's weekly mix drifting' test at any scale.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"((ts div 1000000) div {_DAY_MS}) % 7").alias("dow"),
    )
    obs = ev.groupBy("event_type", "dow").agg(F.count("*").alias("o"))
    tot = obs.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("row_t"),
        F.sum("o").over(Window.partitionBy("dow")).alias("col_t"),
        F.sum("o").over(Window.partitionBy()).alias("grand"),
    )
    exp = F.col("row_t").cast("double") * F.col("col_t") / F.col("grand")
    t8 = F.round(F.pow(F.col("o") - exp, 2) / exp * 1e8).cast("bigint")
    terms = tot.select("event_type", "dow", t8.alias("t8"))
    return terms.agg(
        F.round(F.sum("t8").cast("double") / 1e8, 6).alias("chi2"),
        (
            (F.count_distinct("event_type") - 1) * (F.count_distinct("dow") - 1)
        ).cast("bigint").alias("dof"),
    )


# --------------------------------------------------------------------------
# Market-basket affinity: brand co-occurrence within orders
# --------------------------------------------------------------------------

@register(
    "basket_brand_affinity",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
    brand AS (SELECT p_brand, count(*) AS n_b FROM items GROUP BY 1),
    pair AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               count(*) AS n_pair
        FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
        WHERE a.p_brand < b.p_brand
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b,
           CAST(n_pair AS BIGINT) AS n_pair,
           CAST(ba.n_b AS BIGINT) AS n_a,
           CAST(bb.n_b AS BIGINT) AS n_b,
           ROUND(CAST(n_pair AS DOUBLE) / n.n_orders, 6) AS support,
           ROUND(CAST(n_pair AS DOUBLE) / ba.n_b, 6) AS confidence_a_to_b,
           ROUND(CAST(n_pair AS DOUBLE) * n.n_orders
                 / (CAST(ba.n_b AS DOUBLE) * bb.n_b), 6) AS lift
    FROM pair
    JOIN brand ba ON brand_a = ba.p_brand
    JOIN brand bb ON brand_b = bb.p_brand
    CROSS JOIN n
    """,
)
def basket_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket analysis: support / confidence / lift for every pair
    of part brands co-occurring in an order. Baskets are DISTINCT
    (order, brand) rows — the brand dimension joins in via broadcast, the
    pair enumeration is an equi-self-join on the order key (work bounded
    by basket_size^2 per order, never brands^2 globally), and the margins
    attach via two broadcast joins plus a broadcast scalar for the basket
    total — no driver-side math. At 100 TB the only big shuffle is the
    distinct on (order, brand), which AQE coalesces; hot brands don't skew
    the pair join because it's keyed on the ORDER, not the brand.
    """
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .join(
            load_table(spark, sf_dir, "part").select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    total = items.agg(
        F.count_distinct("l_orderkey").cast("double").alias("n_orders")
    )
    brand = items.groupBy("p_brand").agg(F.count("*").alias("n_b"))
    a = items.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_a"))
    b = items.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_b"))
    pair = (
        a.join(b, "l_orderkey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_pair"))
    )
    ba = brand.select(F.col("p_brand").alias("brand_a"), F.col("n_b").alias("n_a"))
    bb = brand.select(F.col("p_brand").alias("brand_b"), F.col("n_b").alias("n_b2"))
    return (
        pair.join(F.broadcast(ba), "brand_a")
        .join(F.broadcast(bb), "brand_b")
        .crossJoin(F.broadcast(total))
        .select(
            "brand_a",
            "brand_b",
            "n_pair",
            F.col("n_a"),
            F.col("n_b2").alias("n_b"),
            F.round(F.col("n_pair") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("n_pair") / F.col("n_a"), 6).alias("confidence_a_to_b"),
            F.round(
                F.col("n_pair") * F.col("n_orders") / (F.col("n_a") * F.col("n_b2")),
                6,
            ).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# Marketing attribution: last touch before each purchase
# --------------------------------------------------------------------------

@register(
    "attribution_last_touch",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, epoch_ms(ts) AS ts_ms
        FROM events WHERE event_type = 'purchase'
          AND user_id IS NOT NULL AND ts IS NOT NULL  -- asof_join contract
    ),
    t AS (
        SELECT user_id, epoch_ms(ts) AS touch_ms, max(event_type) AS touch_type
        FROM events WHERE event_type IN ('view', 'click')
          AND user_id IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT p.event_id, p.user_id, p.ts_ms,
           t.touch_type, t.touch_ms,
           p.ts_ms - t.touch_ms AS ms_since_touch
    FROM p
    ASOF LEFT JOIN t
        ON p.user_id = t.user_id AND p.ts_ms >= t.touch_ms
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent preceding view/click. The as-of composition (union +
    carry-forward over one user-keyed shuffle) replaces the naive
    purchases x touches range join, which is quadratic per user; left
    semantics keep purchases with no prior touch (NULL credit). At scale
    both event classes come off the SAME scan partitioning — this is one
    shuffle of the filtered event stream, independent of how many touches
    precede each purchase. Tie at the same millisecond credits the touch
    (p.ts >= t.ts), matching DuckDB ASOF semantics on both sides.

    Caveat pinned by the oracle: DuckDB's ASOF picks the latest touch_ms
    but is tie-UNSTABLE on duplicate (user, touch_ms) rows, so touches
    are deduplicated to one row per (user, ms) by a deterministic rule
    (max event_type, i.e. 'view' over 'click') on BOTH sides before the
    as-of join.
    """
    from masd_spark.operators.relational import asof_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("ts div 1000000").alias("ts_ms"),
        "event_type",
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_ms"
    )
    touches = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .groupBy("user_id", F.col("ts_ms").alias("touch_ms"))
        .agg(F.max("event_type").alias("touch_type"))
    )
    out = asof_join(
        purchases,
        touches,
        key_col="user_id",
        left_time="ts_ms",
        right_time="touch_ms",
        value_cols=["touch_type", "touch_ms"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_ms",
        F.col("asof_touch_type").alias("touch_type"),
        F.col("asof_touch_ms").alias("touch_ms"),
        (F.col("ts_ms") - F.col("asof_touch_ms")).alias("ms_since_touch"),
    )


# --------------------------------------------------------------------------
# Sequence modeling: first-order Markov transitions between event types
# --------------------------------------------------------------------------

@register(
    "seq_event_transitions",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id
        FROM events
        WHERE ts IS NOT NULL  -- a null time has no sequence position
    ),
    seq AS (
        SELECT user_id, event_type AS next_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts_ms, event_id NULLS LAST,
                                              event_type NULLS LAST)
                   AS prev_type
        FROM e
    ),
    trans AS (
        SELECT prev_type, next_type, count(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ),
    margin AS (SELECT prev_type, sum(n) AS n_prev FROM trans GROUP BY 1)
    SELECT t.prev_type, t.next_type,
           CAST(t.n AS BIGINT) AS n_transitions,
           ROUND(CAST(t.n AS DOUBLE) / m.n_prev, 6) AS p_next_given_prev
    FROM trans t JOIN margin m USING (prev_type)
    """,
)
def seq_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: count (prev -> next) adjacencies and normalize per source
    state. One user-keyed shuffle for the lag window; the transition agg
    then collapses to |types|^2 rows, and the row-normalizing margin
    attaches via broadcast. The sequence order is total (ts, event_id),
    so the matrix is deterministic under same-ms events — at any scale
    the output is 25 cells here, |A|^2 generally, independent of n.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.expr("ts div 1000000").alias("ts_ms"),
            "event_id",
        )
    )
    # event_type joins the order as a final tiebreak: on dirty data two
    # same-ms rows can both lack event_id, and a (A,B)-vs-(B,A) flip
    # changes the transition counts
    w = Window.partitionBy("user_id").orderBy(
        "ts_ms", F.asc_nulls_last("event_id"), F.asc_nulls_last("event_type")
    )
    seq = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", "next_type").agg(
        F.count("*").alias("n_transitions")
    )
    margin = trans.groupBy("prev_type").agg(F.sum("n_transitions").alias("n_prev"))
    return trans.join(F.broadcast(margin), "prev_type").select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(F.col("n_transitions") / F.col("n_prev"), 6).alias(
            "p_next_given_prev"
        ),
    )


# --------------------------------------------------------------------------
# Two-sample Welch t-test: click vs purchase value distributions
# --------------------------------------------------------------------------

@register(
    "stat_welch_ttest",
    oracle=finite_events("""
    WITH s AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
               CAST(sum(CAST(value * value AS DECIMAL(24,6))) AS DOUBLE) AS sxx
        FROM events
        WHERE event_type IN ('click', 'purchase')
        GROUP BY 1
    ),
    m AS (
        SELECT event_type, n, sx / n AS mean,
               (sxx - sx * sx / n) / (n - 1) AS var
        FROM s
    ),
    w AS (
        SELECT a.n AS n_a, a.mean AS mean_a, a.var AS var_a,
               b.n AS n_b, b.mean AS mean_b, b.var AS var_b
        FROM m a JOIN m b
          ON a.event_type = 'click' AND b.event_type = 'purchase'
    )
    SELECT n_a, ROUND(mean_a, 6) AS mean_a,
           n_b, ROUND(mean_b, 6) AS mean_b,
           ROUND((mean_a - mean_b)
                 / sqrt(var_a / n_a + var_b / n_b), 6) AS t_stat,
           ROUND(pow(var_a / n_a + var_b / n_b, 2)
                 / (pow(var_a / n_a, 2) / (n_a - 1)
                    + pow(var_b / n_b, 2) / (n_b - 1)), 6) AS df_welch
    FROM w
    """),
)
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between click and purchase value
    distributions: one grouped aggregation produces (n, sum, sum-of-
    squares) per class — decimal-quantized so the moments are addition-
    order-independent — and the t statistic plus Welch-Satterthwaite
    degrees of freedom are closed-form ratios over those identical
    inputs (the portable-numerics recipe the Pearson/chi-square queries
    established). One partial+final agg over the filtered scan; output
    is a single row at any scale.
    """
    ev = finite_values(load_table(spark, sf_dir, "events")).filter(
        F.col("event_type").isin("click", "purchase")
    )
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(24,6)"))
        .cast("double")
        .alias("sxx"),
    )
    m = s.select(
        "event_type",
        "n",
        (F.col("sx") / F.col("n")).alias("mean"),
        ((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)).alias("var"),
    )
    a = m.filter(F.col("event_type") == "click").select(
        F.col("n").alias("n_a"), F.col("mean").alias("mean_a"), F.col("var").alias("var_a")
    )
    b = m.filter(F.col("event_type") == "purchase").select(
        F.col("n").alias("n_b"), F.col("mean").alias("mean_b"), F.col("var").alias("var_b")
    )
    se2 = F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    return a.crossJoin(b).select(
        "n_a",
        F.round("mean_a", 6).alias("mean_a"),
        "n_b",
        F.round("mean_b", 6).alias("mean_b"),
        F.round((F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("var_a") / F.col("n_a"), 2) / (F.col("n_a") - 1)
                + F.pow(F.col("var_b") / F.col("n_b"), 2) / (F.col("n_b") - 1)
            ),
            6,
        ).alias("df_welch"),
    )


# --------------------------------------------------------------------------
# Session path mining: most common event-type journeys
# --------------------------------------------------------------------------

_PATH_GAP_MS = 21_600_000  # 6h session gap, matching sessionize_events
_PATH_TOPK = 20


@register(
    "seq_top_session_paths",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_type, epoch_ms(ts) AS ts_ms,
               event_id AS eid
        FROM events
        -- null contract: no timeline position / no type -> no journey step
        WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ),
    marked AS (
        SELECT *,
               CASE WHEN lag(ts_ms) OVER w IS NULL
                         OR ts_ms - lag(ts_ms) OVER w > {_PATH_GAP_MS}
                    THEN 1 ELSE 0 END AS is_new
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, eid NULLS FIRST, event_type)
    ),
    sess AS (
        SELECT *,
               sum(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts_ms, eid NULLS FIRST, event_type
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS session_id
        FROM marked
    ),
    paths AS (
        SELECT user_id, session_id,
               string_agg(event_type, '>' ORDER BY ts_ms, eid NULLS FIRST, event_type)
                   AS path
        FROM sess GROUP BY 1, 2
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY 1
    ORDER BY n_sessions DESC, path
    LIMIT {_PATH_TOPK}
    """,
)
def seq_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session journeys: events sessionize (6h gap, the engine's
    sessionize boundary), each session folds into an ordered
    type-sequence string, and paths rank by frequency. The fold is
    string_agg/concat_ws over collect_list sorted INSIDE the aggregation
    domain — the window partitioning from sessionization carries through
    both the gap detection and the path fold (one user-keyed exchange),
    and the path table is then a tiny key space. Total order
    (ts, event_id) everywhere, so paths are byte-identical across
    engines; ties in the ranking break on the path string.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.expr("ts div 1000000").alias("ts_ms"),
            F.col("event_id").alias("eid"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        "ts_ms", F.asc_nulls_first("eid"), "event_type"
    )
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts_ms").over(w).isNull()
            | (F.col("ts_ms") - F.lag("ts_ms").over(w) > _PATH_GAP_MS),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    paths = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts_ms", "eid", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(_PATH_TOPK)
    )


# --------------------------------------------------------------------------
# Robust trend: Theil-Sen slope over daily means
# --------------------------------------------------------------------------

@register(
    "stat_theil_sen_trend",
    oracle=finite_events("""
    WITH daily AS (
        SELECT event_type, epoch_ms(ts) // 86400000 AS day,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(*) AS m
        FROM events GROUP BY 1, 2
    ),
    slopes AS (
        SELECT a.event_type,
               (b.m - a.m) / (b.day - a.day) AS slope
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day
    )
    SELECT event_type,
           ROUND(median(slope), 6) AS theil_sen_slope,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM slopes GROUP BY 1
    """),
)
def stat_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type: the median of all pairwise
    slopes of the DAILY-MEAN series. Pairwise enumeration is quadratic —
    which is exactly why it runs on the aggregated series (bounded by
    days^2 per type, ~500 pairs here), never on raw events; the daily
    collapse is the one fact-sized shuffle. Up to 29% outlier-corrupted
    days cannot move the estimate (the point of Theil-Sen vs OLS).
    Slopes are ratios of identical decimal-derived doubles; the median
    interpolates identically in both engines.
    """
    ev = finite_values(load_table(spark, sf_dir, "events")).select(
        "event_type",
        F.expr("(ts div 1000000) div 86400000").alias("day"),
        "value",
    )
    daily = ev.groupBy("event_type", "day").agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double") / F.count("*")
        ).alias("m")
    ).localCheckpoint(eager=True)  # tiny; feeds both self-join sides
    a = daily.select("event_type", F.col("day").alias("day_a"), F.col("m").alias("m_a"))
    b = daily.select("event_type", F.col("day").alias("day_b"), F.col("m").alias("m_b"))
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("day_a") < F.col("day_b"))
        .select(
            "event_type",
            ((F.col("m_b") - F.col("m_a")) / (F.col("day_b") - F.col("day_a"))).alias(
                "slope"
            ),
        )
    )
    return slopes.groupBy("event_type").agg(
        F.round(F.median("slope"), 6).alias("theil_sen_slope"),
        F.count("*").alias("n_pairs"),
    )


# --------------------------------------------------------------------------
# Sequence pattern matching: ordered event patterns within sessions
# --------------------------------------------------------------------------

_SEQ_PATTERN = "view(>[a-z]+)*>click(>[a-z]+)*>purchase"


@register(
    "seq_sessions_matching_pattern",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_type, epoch_ms(ts) AS ts_ms,
               event_id AS eid
        FROM events
        -- null contract: no timeline position / no type -> no journey step
        WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ),
    marked AS (
        SELECT *,
               CASE WHEN lag(ts_ms) OVER w IS NULL
                         OR ts_ms - lag(ts_ms) OVER w > {_PATH_GAP_MS}
                    THEN 1 ELSE 0 END AS is_new
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, eid NULLS FIRST, event_type)
    ),
    sess AS (
        SELECT *,
               sum(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts_ms, eid NULLS FIRST, event_type
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS session_id
        FROM marked
    ),
    paths AS (
        SELECT user_id, session_id,
               string_agg(event_type, '>' ORDER BY ts_ms, eid NULLS FIRST, event_type)
                   AS path
        FROM sess GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN regexp_matches(path, '{_SEQ_PATTERN}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_matching
    FROM paths
    GROUP BY 1
    """,
)
def seq_sessions_matching_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence detection without the syntax: a
    session matches if its ordered event chain contains view -> ... ->
    click -> ... -> purchase (gaps allowed). The session path string IS
    the sequence encoding — after the one user-keyed sessionize exchange,
    pattern detection is a map-side regex over |sessions| short strings,
    which scales with sessions (bounded per user) rather than events and
    needs no per-row state machine. Pattern semantics pin down: both
    engines run the same RE2-class regex on the same byte-identical
    strings.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.expr("ts div 1000000").alias("ts_ms"),
            F.col("event_id").alias("eid"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        "ts_ms", F.asc_nulls_first("eid"), "event_type"
    )
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts_ms").over(w).isNull()
            | (F.col("ts_ms") - F.lag("ts_ms").over(w) > _PATH_GAP_MS),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts_ms", "eid", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return paths.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum(
            F.when(F.col("path").rlike(_SEQ_PATTERN), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_matching"),
    )


# --------------------------------------------------------------------------
# RFM customer segmentation
# --------------------------------------------------------------------------

_RFM_SEGMENT_CASE = """
    CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
         WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
         WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
         WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
         ELSE 'core' END
"""


@register(
    "bi_rfm_segments",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey AS custkey,
               max(epoch_ms(o_orderdate)) AS last_order_ms,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
                   AS monetary
        FROM orders GROUP BY 1
    ),
    scored AS (
        SELECT custkey, frequency,
               CAST(ntile(5) OVER (ORDER BY last_order_ms NULLS LAST,
                                            custkey NULLS LAST)
                    AS BIGINT) AS r_score,
               CAST(ntile(5) OVER (ORDER BY frequency NULLS LAST,
                                            custkey NULLS LAST)
                    AS BIGINT) AS f_score,
               CAST(ntile(5) OVER (ORDER BY monetary NULLS LAST,
                                            custkey NULLS LAST)
                    AS BIGINT) AS m_score
        FROM per_cust
    )
    SELECT custkey, r_score, f_score, m_score,
           {_RFM_SEGMENT_CASE} AS segment
    FROM scored
    """,
)
def bi_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, quintile scores for Recency (last
    order time — later is better), Frequency (order count), Monetary
    (DECIMAL-quantized revenue), plus the standard 2-axis segment label
    (champion / new / at_risk / hibernating / core). ntile runs over a
    TOTAL order (metric, custkey) so scores are deterministic; the
    ntile input is the per-customer AGGREGATE (|customers| rows), never
    the fact table. At 100 TB the quintile edges swap to
    approx_percentile over the same aggregate (the equidepth-histogram
    justification); the exact ntile is the oracle-checkable ground
    truth.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.unix_millis("o_orderdate")).alias("last_order_ms"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    # NULLS LAST pinned on every ntile ordering: a null metric (or the
    # null-custkey group) otherwise lands at opposite ends of the two
    # engines' sorts and shifts EVERY later customer's quintile edge
    scored = per_cust.select(
        "custkey",
        F.ntile(5)
        .over(
            Window.orderBy(
                F.asc_nulls_last("last_order_ms"), F.asc_nulls_last("custkey")
            )
        )
        .cast("bigint")
        .alias("r_score"),
        F.ntile(5)
        .over(
            Window.orderBy(
                F.asc_nulls_last("frequency"), F.asc_nulls_last("custkey")
            )
        )
        .cast("bigint")
        .alias("f_score"),
        F.ntile(5)
        .over(
            Window.orderBy(
                F.asc_nulls_last("monetary"), F.asc_nulls_last("custkey")
            )
        )
        .cast("bigint")
        .alias("m_score"),
    )
    return scored.select(
        "custkey", "r_score", "f_score", "m_score",
        F.expr(_RFM_SEGMENT_CASE).alias("segment"),
    )
