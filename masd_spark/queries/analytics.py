"""Product-analytics query shapes over the events stream: ordered
funnels and cohort retention. Pure relational compositions (conditional
min-aggregates + joins), so both are fully oracle-checked; the scale
notes are in each docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from masd_spark.queries import register
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
