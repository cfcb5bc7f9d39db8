"""Sketch harness queries: oracle-exact CMS, accuracy-pinned HLL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from masd_spark.operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_bucket_sql,
    cms_build,
    cms_estimate,
)
from masd_spark.queries import register
from masd_spark.sources.tables import load_table

_UID = "CAST(user_id AS VARCHAR)"
_BUCKET_CASE = (
    "CASE i "
    + " ".join(
        f"WHEN {i} THEN {cms_bucket_sql(_UID, i, CMS_WIDTH)}"
        for i in range(CMS_DEPTH)
    )
    + " END"
)


@register(
    "sketch_cms_user_counts",
    oracle=f"""
    WITH seeds(i) AS (VALUES (0), (1), (2)),
    probes AS (
        SELECT user_id, i, {_BUCKET_CASE} AS bucket
        FROM events, seeds
    ),
    cells AS (
        SELECT i, bucket, count(*) AS cnt FROM probes GROUP BY 1, 2
    ),
    keys AS (SELECT DISTINCT user_id FROM events),
    kp AS (
        SELECT user_id, i, {_BUCKET_CASE} AS bucket
        FROM keys, seeds
    ),
    est AS (
        SELECT user_id, min(cnt) AS cms_n
        FROM kp JOIN cells USING (i, bucket) GROUP BY 1
    ),
    exact AS (SELECT user_id, count(*) AS exact_n FROM events GROUP BY 1)
    SELECT e.user_id, e.exact_n, CAST(est.cms_n AS BIGINT) AS cms_n
    FROM exact e JOIN est USING (user_id)
    """,
)
def sketch_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch ({d}x{w}, md5 hashes) over event user_ids, point
    estimates vs exact counts per user. The sketch state is {d}x{w}
    counters regardless of input size — cell-wise additive, so per-shard
    partial sketches merge by sum (Spark's partial+final agg does this
    for free); the estimate join broadcasts the tiny sketch. Estimates
    upper-bound exact counts; collisions show as cms_n > exact_n. DuckDB
    recomputes the identical grid — value-checked, not statistically
    checked.
    """.format(d=CMS_DEPTH, w=CMS_WIDTH)
    ev = load_table(spark, sf_dir, "events")
    sketch = cms_build(ev, "user_id")
    keys = ev.select("user_id").distinct()
    est = cms_estimate(sketch, keys, "user_id")
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_n"))
    return exact.join(est, "user_id").select(
        "user_id", "exact_n", F.col("cms_estimate").alias("cms_n")
    )


@register("sketch_hll_user_distinct", oracle=None)
def sketch_hll_user_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via Spark's native Apache
    DataSketches HLL bindings, plus an 'ALL' row whose sketch is the
    hll_union_agg MERGE of the per-type sketches — the few-KB mergeable
    state that replaces exact distinct at 100 TB (exact needs a full
    key shuffle; sketches ship partial state). Estimates are
    engine-specific (no DuckDB twin): accuracy vs exact distinct and
    merge-consistency are pinned in tests/test_sketches.py.
    """
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sk"))
    typed = per.select(
        "event_type", F.hll_sketch_estimate("sk").alias("hll_users")
    )
    merged = per.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("hll_users"),
    )
    return typed.unionAll(merged)


# DataSketches HLL at Spark's default lgConfigK=12: relative standard
# error ~ 1.04/sqrt(2^12) = 1.63%. The bound query asserts 3x that
# (4.88%) — wide enough that a healthy sketch NEVER trips it (at the
# fixture's cardinalities HLL runs in exact sparse mode; at 100 TB
# cardinalities 3x RSE is a >99.7% envelope), tight enough that a broken
# estimator (wrong column, lost merge, truncated state) fails the hash.
_HLL_RSE_BOUND = 3 * 1.04 / (2**12) ** 0.5


@register(
    "sketch_hll_error_bound",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_bound
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_bound
    FROM events
    """,
)
def sketch_hll_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL estimate vs exact distinct IN ONE RESULT, hash-checked
    (VERDICT r6 item 7 — upgrades ``sketch_hll_user_distinct`` from
    rows-only): per event type and for the hll_union_agg MERGE of all
    types, emit the exact count(DISTINCT user_id) and a boolean asserting
    the sketch estimate lies within 3x the documented RSE of it. The
    estimate itself is engine-specific (DataSketches internals), but the
    BOUND is a portable fact both engines can state — DuckDB returns TRUE
    unconditionally, so the value hash fails exactly when Spark's sketch
    strays outside its error contract. The merge row checks the property
    that matters at 100 TB: per-shard sketches unioned lose nothing vs a
    single pass. Exactness of the comparison baseline costs a distinct
    shuffle here, which is precisely what the sketch avoids in production
    — the bound query is the harness, not the scale path.
    """
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )

    def bounded(est, exact):
        return F.when(exact == 0, est == F.lit(0.0)).otherwise(
            (F.abs(est - exact) / exact) <= F.lit(_HLL_RSE_BOUND)
        )

    typed = per.select(
        "event_type",
        "exact_users",
        bounded(F.hll_sketch_estimate("sk"), F.col("exact_users")).alias(
            "within_bound"
        ),
    )
    merged = per.agg(F.hll_union_agg("sk").alias("sk"))
    allex = ev.agg(F.count_distinct("user_id").alias("exact_users"))
    allrow = merged.crossJoin(allex).select(
        F.lit("ALL").alias("event_type"),
        "exact_users",
        bounded(F.hll_sketch_estimate("sk"), F.col("exact_users")).alias(
            "within_bound"
        ),
    )
    return typed.unionAll(allrow)


_MG_K = 128


@register(
    "sketch_mg_heavy_users",
    oracle=f"""
    SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
    FROM events
    WHERE user_id IS NOT NULL  -- heavy_keys' invalid-input contract
    GROUP BY user_id
    HAVING count(*) * {_MG_K}
           > (SELECT count(*) FROM events WHERE user_id IS NOT NULL)
    """,
)
def sketch_mg_heavy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (users with > n/{k} of all events, k=128) via
    the bounded-state two-pass shape: per-partition Misra-Gries candidate
    summaries (O(k) state each, Arrow-batched — the mergeable-summaries
    merge) unioned, then an exact recount of candidates only. The
    fixture's 150 distinct users exceed the 128 counters, so evictions
    genuinely happen, yet the result equals the plain GROUP BY HAVING
    oracle on any partitioning — the MG guarantee (every key above n/k
    survives some partition's summary) makes the candidate set a certain
    superset, and the recount makes the final answer exact. At 100 TB:
    pass 1 never shuffles (map-side summaries), pass 2 shuffles only
    candidate-key rows. (operators/sketches.py:heavy_keys)
    """
    from masd_spark.operators.sketches import heavy_keys

    ev = load_table(spark, sf_dir, "events")
    return heavy_keys(ev, "user_id", _MG_K)


_JS_WIDTH = 1024  # 1500 distinct custkeys: width >= keys keeps collisions rare
_JS_CK = "CAST(o_custkey AS VARCHAR)"
_JS_CK_B = "CAST(c_custkey AS VARCHAR)"
_JS_CASE_A = (
    "CASE i "
    + " ".join(
        f"WHEN {i} THEN {cms_bucket_sql(_JS_CK, i, _JS_WIDTH)}"
        for i in range(CMS_DEPTH)
    )
    + " END"
)
_JS_CASE_B = (
    "CASE i "
    + " ".join(
        f"WHEN {i} THEN {cms_bucket_sql(_JS_CK_B, i, _JS_WIDTH)}"
        for i in range(CMS_DEPTH)
    )
    + " END"
)


@register(
    "sketch_cms_join_size",
    oracle=f"""
    WITH seeds(i) AS (VALUES (0), (1), (2)),
    cells_a AS (
        SELECT i, {_JS_CASE_A} AS bucket, CAST(count(*) AS BIGINT) AS cnt_a
        FROM orders, seeds GROUP BY 1, 2
    ),
    cells_b AS (
        SELECT i, {_JS_CASE_B} AS bucket, CAST(count(*) AS BIGINT) AS cnt_b
        FROM customer, seeds GROUP BY 1, 2
    ),
    per_row AS (
        SELECT i, CAST(sum(cnt_a * cnt_b) AS BIGINT) AS ip
        FROM cells_a JOIN cells_b USING (i, bucket) GROUP BY 1
    ),
    est AS (SELECT CAST(min(ip) AS BIGINT) AS est_join_size FROM per_row),
    tru AS (
        SELECT CAST(count(*) AS BIGINT) AS true_join_size
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT est.est_join_size, tru.true_join_size
    FROM est CROSS JOIN tru
    """,
)
def sketch_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from two count-min sketches: the CM
    inner-product estimate |A join B| <= min over sketch rows of
    sum_bucket cntA[b]*cntB[b] (Cormode-Muthukrishnan) — the classic
    sketch a planner consults BEFORE committing to a join strategy.
    Both sketches build map-side (partial+final agg, no key shuffle of
    either table); the inner product runs on two <= depth x width cell
    tables. The true size rides along for calibration. All counters are
    exact integers — the estimate is deterministic, value-checked by
    DuckDB recomputing the identical grids.
    """
    from masd_spark.operators.sketches import cms_build

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    ska = cms_build(orders.select(F.col("o_custkey").alias("k")), "k", width=_JS_WIDTH)
    skb = cms_build(customer.select(F.col("c_custkey").alias("k")), "k", width=_JS_WIDTH)
    per_row = (
        ska.withColumnRenamed("cnt", "cnt_a")
        .join(skb.withColumnRenamed("cnt", "cnt_b"), ["sketch_row", "bucket"])
        .groupBy("sketch_row")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("ip"))
    )
    est = per_row.agg(F.min("ip").cast("bigint").alias("est_join_size"))
    tru = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .agg(F.count("*").cast("bigint").alias("true_join_size"))
    )
    return est.crossJoin(F.broadcast(tru))
