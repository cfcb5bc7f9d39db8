"""Time-series harness queries: dense-grid resampling + gap detection,
value-checked against DuckDB recomputing the identical grids."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from masd_spark.functions.quantize import qround6, qround6_sql
from masd_spark.operators.timeseries import detect_gaps, resample_gap_fill
from masd_spark.queries import finite_events, finite_values, register
from masd_spark.sources.tables import load_table

_HOUR_MS = 3_600_000

# Bar mean: exact decimal sum -> one double division -> IEEE-only
# quantization. SF1 caught ROUND(double, 6) here: a replicated bar mean
# landing exactly on 43.4728125 split the engines' round-tie rules (the
# precise failure mode functions/quantize.py documents).
_MEAN_Q = qround6_sql("CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*)")
_GAP_MS = 6 * _HOUR_MS


@register(
    "ts_resample_ffill_hourly",
    oracle=f"""
    WITH e AS (SELECT event_type, epoch_ms(ts) AS ts_ms, value FROM events),
    obs AS (
        SELECT event_type,
               ts_ms - (ts_ms % {_HOUR_MS}) AS bucket_ms,
               avg(value) AS v
        FROM e GROUP BY 1, 2
    ),
    spans AS (
        SELECT event_type, min(bucket_ms) AS mn, max(bucket_ms) AS mx
        FROM obs GROUP BY 1
    ),
    grid AS (
        SELECT event_type,
               unnest(generate_series(mn, mx, {_HOUR_MS})) AS bucket_ms
        FROM spans
    ),
    j AS (
        SELECT g.event_type, g.bucket_ms, o.v
        FROM grid g LEFT JOIN obs o USING (event_type, bucket_ms)
    )
    SELECT event_type, bucket_ms,
           {qround6_sql('''last_value(v IGNORE NULLS)
                 OVER (PARTITION BY event_type ORDER BY bucket_ms
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')}
               AS value_filled,
           v IS NOT NULL AS is_observed
    FROM j
    """,
)
def ts_resample_ffill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample of event values per type with forward fill — the
    densification the reference's windowed agg never does (it emits
    nothing for silent windows). Grid rows are generated per key from a
    3-column span agg (never a calendar cross join); fill is one window
    pass. ~5% of this fixture's hours are genuinely empty, so the
    forward-fill path is exercised, not vacuous.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("ts div 1000000").alias("ts_ms"), "value"
    )
    return resample_gap_fill(
        ev, ["event_type"], "ts_ms", "value", step_ms=_HOUR_MS
    ).select("event_type", "bucket_ms", "value_filled", "is_observed")


@register(
    "ts_detect_gaps",
    oracle=f"""
    WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
    g AS (
        SELECT user_id, ts_ms AS gap_start_ms,
               lead(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms)
                   AS gap_end_ms
        FROM e
    )
    SELECT user_id, gap_start_ms, gap_end_ms,
           gap_end_ms - gap_start_ms AS gap_ms
    FROM g WHERE gap_end_ms - gap_start_ms >= {_GAP_MS}
    """,
)
def ts_detect_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence detection: every >=6h hole between consecutive events of a
    user ('sensor went dark'). Single lead() window pass over the
    key-partitioned sort — one shuffle, no self-join.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000000").alias("ts_ms")
    )
    return detect_gaps(ev, ["user_id"], "ts_ms", min_gap_ms=_GAP_MS)


_ZS_WINDOW_MS = 6 * _HOUR_MS


@register(
    "ts_interpolate_linear_hourly",
    oracle=f"""
    WITH e AS (SELECT event_type, epoch_ms(ts) AS ts_ms, value FROM events),
    obs AS (
        SELECT event_type,
               ts_ms - (ts_ms % {_HOUR_MS}) AS bucket_ms,
               {qround6_sql('avg(value)')} AS v
        FROM e GROUP BY 1, 2
    ),
    spans AS (
        SELECT event_type, min(bucket_ms) AS mn, max(bucket_ms) AS mx
        FROM obs GROUP BY 1
    ),
    grid AS (
        SELECT event_type,
               unnest(generate_series(mn, mx, {_HOUR_MS})) AS bucket_ms
        FROM spans
    ),
    j AS (
        SELECT g.event_type, g.bucket_ms, o.v
        FROM grid g LEFT JOIN obs o USING (event_type, bucket_ms)
    ),
    a AS (
        SELECT event_type, bucket_ms, v, v IS NOT NULL AS is_observed,
               last_value(v IGNORE NULLS) OVER wprev AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN bucket_ms END
                          IGNORE NULLS) OVER wprev AS pt,
               first_value(v IGNORE NULLS) OVER wnext AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN bucket_ms END
                           IGNORE NULLS) OVER wnext AS nt
        FROM j
        WINDOW wprev AS (PARTITION BY event_type ORDER BY bucket_ms
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wnext AS (PARTITION BY event_type ORDER BY bucket_ms
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, bucket_ms,
           {qround6_sql('''CASE WHEN is_observed THEN v
                      WHEN nv IS NULL THEN pv
                      ELSE pv + (nv - pv) *
                           ((bucket_ms - pt) / (nt - pt))
                 END''')} AS value_interp,
           is_observed
    FROM a
    """,
)
def ts_interpolate_linear_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample of event values per type with LINEAR interpolation
    across silent hours — the continuous-signal twin of
    ``ts_resample_ffill_hourly`` (hold-last draws staircases through real
    slopes). Anchors are 6-dp-rounded bucket averages and the lerp is
    written with the identical operation order in the oracle, so parity
    is structural. Same scale shape: span-agg-bounded grid explode, two
    window passes over ONE key-partitioned sort, no self-join.
    """
    from masd_spark.operators.timeseries import resample_interpolate

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("ts div 1000000").alias("ts_ms"), "value"
    )
    return resample_interpolate(
        ev, ["event_type"], "ts_ms", "value", step_ms=_HOUR_MS
    ).select("event_type", "bucket_ms", "value_interp", "is_observed")


@register(
    "ts_rolling_zscore",
    oracle=finite_events(f"""
    WITH e AS (
        SELECT event_type, epoch_ms(ts) AS ts_ms, min(value) AS value
        FROM events GROUP BY 1, 2
    ),
    q AS (
        SELECT event_type, ts_ms, value,
               CAST(value AS DECIMAL(18,6)) AS vq
        FROM e
    ),
    w AS (
        SELECT event_type, ts_ms, value,
               count(*) OVER fr AS n,
               CAST(sum(vq) OVER fr AS DOUBLE) AS s1,
               CAST(sum(vq * vq) OVER fr AS DOUBLE) AS s2
        FROM q
        WINDOW fr AS (PARTITION BY event_type ORDER BY ts_ms
                      RANGE BETWEEN {_ZS_WINDOW_MS} PRECEDING
                            AND 1 PRECEDING)
    )
    SELECT event_type, ts_ms, value,
           CASE WHEN n >= 10
                THEN CASE WHEN (s2 - s1 * s1 / n) / (n - 1) > 0
                          THEN ROUND((value - s1 / n)
                               / sqrt((s2 - s1 * s1 / n) / (n - 1)), 6)
                     END
           END AS z
    FROM w
    """),
)
def ts_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly score: each event's z-score against the
    prior 6h of its own event_type series (frame excludes the current
    row). Ties on (type, ms) are collapsed with an exact min() first so
    the series — and therefore every engine's fold order — is
    deterministic; the portable-numerics mode derives mean/std from
    decimal-quantized sums for bit-exact cross-engine parity. One
    groupBy + one RANGE-frame window pass, no self-join.
    """
    from masd_spark.operators.timeseries import rolling_zscore

    ev = (
        finite_values(load_table(spark, sf_dir, "events"))
        .select("event_type", F.expr("ts div 1000000").alias("ts_ms"), "value")
        .groupBy("event_type", "ts_ms")
        .agg(F.min("value").alias("value"))
    )
    out = rolling_zscore(
        ev, ["event_type"], "ts_ms", "value",
        window_ms=_ZS_WINDOW_MS, min_obs=10, numerics="portable",
    )
    return out.select("event_type", "ts_ms", "value", F.round("z", 6).alias("z"))


@register(
    "ts_ohlc_hourly_bars",
    oracle=finite_events(f"""
    WITH e AS (
        SELECT event_type, epoch_ms(ts) AS ts_ms, event_id, value
        FROM events
    ),
    w AS (
        SELECT event_type,
               ts_ms - (ts_ms % {_HOUR_MS}) AS bar_ms, ts_ms, event_id, value,
               row_number() OVER (PARTITION BY event_type,
                                               ts_ms - (ts_ms % {_HOUR_MS})
                                  ORDER BY ts_ms, event_id) AS rn_a,
               row_number() OVER (PARTITION BY event_type,
                                               ts_ms - (ts_ms % {_HOUR_MS})
                                  ORDER BY ts_ms DESC, event_id DESC) AS rn_d
        FROM e
    )
    SELECT event_type, bar_ms,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(count(*) AS BIGINT) AS n_events,
           {_MEAN_Q} AS mean_value
    FROM w GROUP BY 1, 2
    """),
)
def ts_ohlc_hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type: open/close are the first/last
    value by (time, event_id) — a total order, so bars are deterministic
    under ties — plus high/low/count and a decimal-quantized mean.

    Plan: ONE shuffle on (event_type, bar) feeds both window passes and
    the final aggregation (same partitioning, Spark reuses the exchange).
    Open/close never collect per-bar arrays: first/last fall out of
    row_number over the shared sort. Bars are time-bucketed, so at 100 TB
    the shuffle keys are (type x hour) — naturally bounded and uniform;
    the raw double values cross engines bit-exactly, only the mean needs
    the decimal-sum parity recipe.
    """
    ev = finite_values(load_table(spark, sf_dir, "events")).select(
        "event_type",
        F.expr("ts div 1000000").alias("ts_ms"),
        "event_id",
        "value",
    )
    bar = (F.col("ts_ms") - F.col("ts_ms") % _HOUR_MS).alias("bar_ms")
    keyed = ev.select("event_type", bar, "ts_ms", "event_id", "value")
    wa = Window.partitionBy("event_type", "bar_ms").orderBy("ts_ms", "event_id")
    wd = Window.partitionBy("event_type", "bar_ms").orderBy(
        F.col("ts_ms").desc(), F.col("event_id").desc()
    )
    marked = keyed.select(
        "event_type",
        "bar_ms",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return marked.groupBy("event_type", "bar_ms").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("n_events"),
        qround6(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("mean_value"),
    )


_DEBOUNCE_MS = 7_200_000


@register(
    "clean_event_debounce",
    oracle=f"""
    WITH e AS (
        SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms, value
        FROM events
        WHERE ts IS NOT NULL  -- no timeline position -> cannot debounce
    ),
    marked AS (
        SELECT *,
               CASE WHEN lag(ts_ms) OVER w IS NULL
                         OR ts_ms - lag(ts_ms) OVER w > {_DEBOUNCE_MS}
                    THEN 1 ELSE 0 END AS is_burst_head
        FROM e
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts_ms, event_id NULLS LAST,
                              event_type NULLS LAST, value NULLS LAST)
    )
    SELECT event_id, user_id, event_type, ts_ms, value
    FROM marked WHERE is_burst_head = 1
    """,
)
def clean_event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event debouncing: per user, collapse activity bursts — runs of
    events each within 2h of their predecessor — down to the burst's
    FIRST event (the fixture's streams are sparse, so the 2h gap is what
    makes the operator actually bite: ~17% of rows drop at sf0.01). The
    batch twin of streaming ``dropDuplicatesWithinWatermark``-style noise
    suppression: one user-keyed shuffle, lag over a total order
    (ts, event_id), keep the gap-opening rows. Burst-collapse semantics
    (islands chain through consecutive close events) rather than
    fixed-window-from-head: it's the one SQL expresses with a single
    window pass on both engines, and the one that kills retry storms of
    any length.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.expr("ts div 1000000").alias("ts_ms"),
            "value",
        )
    )
    # event_id is the unique tiebreaker, but on dirty data two same-ms
    # rows can BOTH lack it — extend the order over every emitted column
    # so any remaining ties are between interchangeable rows
    w = Window.partitionBy("user_id").orderBy(
        "ts_ms",
        F.asc_nulls_last("event_id"),
        F.asc_nulls_last("event_type"),
        F.asc_nulls_last("value"),
    )
    return (
        ev.withColumn("_prev", F.lag("ts_ms").over(w))
        .filter(
            F.col("_prev").isNull()
            | (F.col("ts_ms") - F.col("_prev") > _DEBOUNCE_MS)
        )
        .drop("_prev")
    )


_CUSUM_K = 2.0


@register(
    "ts_cusum_changepoints",
    oracle=finite_events(f"""
    WITH daily AS (
        SELECT event_type, epoch_ms(ts) // 86400000 AS day,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(*) AS m
        FROM events
        WHERE ts IS NOT NULL  -- a null time belongs to no day
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               avg(m) AS mu,
               stddev_samp(m) AS sigma
        FROM daily GROUP BY 1
    ),
    c AS (
        SELECT d.event_type, d.day, d.m, s.mu, s.sigma,
               sum(d.m - s.mu) OVER (PARTITION BY d.event_type ORDER BY d.day
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cusum
        FROM daily d JOIN stats s USING (event_type)
    )
    SELECT event_type, day,
           ROUND(m, 6) + 0.0 AS daily_mean,
           ROUND(cusum, 6) + 0.0 AS cusum,
           abs(cusum) > {_CUSUM_K} * sigma AS is_changepoint
    FROM c
    """),
)
def ts_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change detection on the daily-mean series per event type:
    cumulative sum of deviations from the series mean, flagged where
    |CUSUM| exceeds k=2 daily-mean standard deviations. Three stages over
    ONE event_type partitioning (daily agg -> tiny per-type stats joined
    back -> running-sum window), so the exchange is reused; the CUSUM
    itself is a rows-unbounded running frame — the streaming-friendly
    form of changepoint detection (state = one partial sum per key).
    Daily means use the decimal-sum parity recipe; the running sum then
    adds doubles in day order on both engines (window order is total),
    so the surface rounds portably.
    """
    ev = (
        finite_values(load_table(spark, sf_dir, "events"))
        .filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.expr("(ts div 1000000) div 86400000").alias("day"),
            "value",
        )
    )
    daily = ev.groupBy("event_type", "day").agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double") / F.count("*")
        ).alias("m")
    ).localCheckpoint(eager=True)  # tiny (days x types); one scan feeds
    # BOTH consumers — without this the broadcast stats branch replans the
    # full scan+agg lineage (the measured broadcast-bypass pathology).
    stats = daily.groupBy("event_type").agg(
        F.avg("m").alias("mu"), F.stddev_samp("m").alias("sigma")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = daily.join(F.broadcast(stats), "event_type").withColumn(
        "cusum", F.sum(F.col("m") - F.col("mu")).over(w)
    )
    return c.select(
        "event_type",
        "day",
        (F.round("m", 6) + F.lit(0.0)).alias("daily_mean"),
        # + 0.0 collapses IEEE negative zero: ROUND can yield -0.0 on one
        # engine and 0.0 on the other, and canonicalizers repr them apart.
        (F.round("cusum", 6) + F.lit(0.0)).alias("cusum"),
        (F.abs(F.col("cusum")) > _CUSUM_K * F.col("sigma")).alias("is_changepoint"),
    )


_TRAIL_DAYS = 7


@register(
    "ts_trailing_7d_active_users",
    oracle=f"""
    WITH ud AS (
        SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    win AS (
        SELECT d.day, ud.user_id
        FROM days d
        JOIN ud ON ud.day BETWEEN d.day - {_TRAIL_DAYS - 1} AND d.day
    )
    SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS active_users_7d
    FROM win GROUP BY 1
    """,
)
def ts_trailing_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day active users per day — the rolling COUNT DISTINCT
    that a plain window frame cannot express (distinct isn't decomposable
    over frames). Scale shape: dedup to (user, day) first, then each
    active day CONTRIBUTES ITSELF to the 7 windows it falls in (explode
    of 7 integer offsets — a k-fold map-side expansion of the already-
    deduped pairs, not of raw events), and the per-window distinct is one
    aggregation. Work is k x |user-days|, independent of raw event
    volume; no day x day range join, no per-day rescan. Only days with
    >= 1 event appear (matching the oracle's day list).
    """
    ud = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.expr("(ts div 1000000) div 86400000").alias("day"))
        .distinct()
    )
    days = ud.select(F.col("day").alias("obs_day")).distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + (_TRAIL_DAYS - 1))
        ).alias("day_w"),
    )
    return (
        contrib.join(days, contrib.day_w == days.obs_day)
        .groupBy(F.col("obs_day").alias("day"))
        .agg(F.count_distinct("user_id").alias("active_users_7d"))
    )


@register(
    "ts_seasonal_residuals",
    oracle=finite_events(f"""
    WITH e AS (
        SELECT event_type, hour(ts) AS hod, event_id,
               CAST(ROUND(value, 6) AS DECIMAL(20,9)) AS v
        FROM events
    ),
    season AS (
        SELECT event_type, hod,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS DOUBLE) / count(*) AS mu,
               sqrt(greatest(
                   CAST(sum(v * v) AS DOUBLE) / count(*)
                   - (CAST(sum(v) AS DOUBLE) / count(*))
                     * (CAST(sum(v) AS DOUBLE) / count(*)), 0.0)) AS sigma
        FROM e GROUP BY 1, 2
    )
    SELECT e.event_id,
           e.event_type,
           e.hod,
           {qround6_sql("CAST(e.v AS DOUBLE) - s.mu")} AS residual,
           CASE WHEN s.sigma > 0
                AND abs(CAST(e.v AS DOUBLE) - s.mu) > 3.0 * s.sigma
                THEN true ELSE false END AS is_anomaly
    FROM e JOIN season s
      ON e.event_type = s.event_type AND e.hod = s.hod
    """),
)
def ts_seasonal_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly scoring: the (event_type, hour-of-day)
    mean is the seasonal profile; each event's residual against its
    profile cell, flagged when it exceeds 3 population sigmas — the
    deseasonalized complement of ``ts_rolling_zscore`` (which compares
    against the recent past, not the time-of-day norm). Values quantize
    to DECIMAL(20,9) so the moment sums are exact; mean/sigma then
    derive in doubles with identical expression order in the oracle.
    Scale: the profile is |types| x 24 rows built by one partial-agg
    pass and broadcast back — the fact table shuffles zero times.
    """
    ev = finite_values(load_table(spark, sf_dir, "events"))
    e = ev.select(
        "event_id",
        "event_type",
        F.hour(F.to_timestamp(F.expr("ts div 1000000") / 1000)).alias("hod"),
        F.round("value", 6).cast("decimal(20,9)").alias("v"),
    )
    mu = F.col("sv").cast("double") / F.col("n")
    season = (
        e.groupBy("event_type", "hod")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("sv"),
            F.sum(F.col("v") * F.col("v")).alias("svv"),
        )
        .select(
            "event_type",
            "hod",
            mu.alias("mu"),
            F.sqrt(
                F.greatest(
                    F.col("svv").cast("double") / F.col("n") - mu * mu,
                    F.lit(0.0),
                )
            ).alias("sigma"),
        )
    )
    res = F.col("v").cast("double") - F.col("mu")
    return e.join(F.broadcast(season), ["event_type", "hod"]).select(
        "event_id",
        "event_type",
        "hod",
        qround6(res).alias("residual"),
        F.when((F.col("sigma") > 0) & (F.abs(res) > 3.0 * F.col("sigma")), F.lit(True))
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    )


_ACF_LAGS = (1, 2, 3)


@register(
    "ts_autocorrelation",
    oracle=finite_events(f"""
    WITH e AS (
        SELECT event_type, epoch_ms(ts) // {_HOUR_MS} AS hr,
               CAST(value AS DECIMAL(18,6)) AS vq
        FROM events
    ),
    hourly AS (
        SELECT event_type, hr,
               CAST(round((CAST(sum(vq) AS DOUBLE) / count(*)) * 1000000)
                    AS BIGINT) AS m6
        FROM e GROUP BY 1, 2
    ),
    lags AS (SELECT unnest([{', '.join(str(l) for l in _ACF_LAGS)}]) AS lag),
    paired AS (
        SELECT a.event_type, l.lag, a.m6 AS x, b.m6 AS y
        FROM hourly a
        CROSS JOIN lags l
        JOIN hourly b
          ON b.event_type = a.event_type AND b.hr = a.hr + l.lag
    ),
    s AS (
        SELECT event_type, lag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM paired GROUP BY 1, 2
    )
    SELECT event_type, lag, n AS n_pairs,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                 6) AS acf
    FROM s
    """),
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation (k=1..3) of each event type's HOURLY mean
    series — the memory/periodicity diagnostic behind seasonal modeling
    (an ACF near zero at all lags says the hourly means are white noise;
    a slow decay says trend). Sample ACF via the lagged-Pearson form:
    hours pair with hour+k when both exist (gap-tolerant — no grid
    fill). Portable numerics: hourly means snap to integer micro-units
    (decimal-quantized sums), the five correlation sums are exact
    BIGINTs, and the only floating point is the final closed-form ratio
    over identical integers — bit-identical cross-engine.

    Scale: the fact table is touched ONCE (partial-agg to |types| x
    |hours| rows); the lag self-join and the Pearson reduction run on
    the tiny hourly aggregate, never on raw events.
    """
    e = finite_values(load_table(spark, sf_dir, "events")).select(
        "event_type",
        F.expr(f"(ts div 1000000) div {_HOUR_MS}").alias("hr"),
        F.col("value").cast("decimal(18,6)").alias("vq"),
    )
    hourly = e.groupBy("event_type", "hr").agg(
        F.round((F.sum("vq").cast("double") / F.count("*")) * 1e6)
        .cast("bigint")
        .alias("m6")
    )
    # materialize the tiny aggregate so BOTH self-join sides read the same
    # blocks — without this each side re-scans and re-aggregates the fact
    # table (plan-asserted in test_autocorrelation_single_fact_scan)
    hourly = hourly.localCheckpoint(eager=True)
    lags = F.explode(F.array(*[F.lit(l) for l in _ACF_LAGS])).alias("lag")
    a = hourly.select("event_type", "hr", F.col("m6").alias("x"), lags)
    b = hourly.select(
        "event_type", F.col("hr").alias("hr_b"), F.col("m6").alias("y")
    )
    paired = a.join(
        b,
        (a["event_type"] == b["event_type"]) & (F.col("hr_b") == F.col("hr") + F.col("lag")),
    ).select(a["event_type"], "lag", "x", "y")
    s = paired.groupBy("event_type", "lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = (
        F.col("n").cast("double"),
        F.col("sx").cast("double"),
        F.col("sy").cast("double"),
    )
    num = n * F.col("sxy") - sx * F.col("sy")
    den = F.sqrt(
        (n * F.col("sxx") - sx * F.col("sx")) * (n * F.col("syy") - sy * F.col("sy"))
    )
    return s.select(
        "event_type",
        "lag",
        F.col("n").alias("n_pairs"),
        F.round(num / den, 6).alias("acf"),
    )
