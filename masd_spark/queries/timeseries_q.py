"""Time-series harness queries: dense-grid resampling + gap detection,
value-checked against DuckDB recomputing the identical grids."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from masd_spark.operators.timeseries import detect_gaps, resample_gap_fill
from masd_spark.queries import register
from masd_spark.sources.tables import load_table

_HOUR_MS = 3_600_000
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
           ROUND(last_value(v IGNORE NULLS)
                 OVER (PARTITION BY event_type ORDER BY bucket_ms
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 6) AS value_filled,
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
    "ts_rolling_zscore",
    oracle=f"""
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
    """,
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
        load_table(spark, sf_dir, "events")
        .select("event_type", F.expr("ts div 1000000").alias("ts_ms"), "value")
        .groupBy("event_type", "ts_ms")
        .agg(F.min("value").alias("value"))
    )
    out = rolling_zscore(
        ev, ["event_type"], "ts_ms", "value",
        window_ms=_ZS_WINDOW_MS, min_obs=10, numerics="portable",
    )
    return out.select("event_type", "ts_ms", "value", F.round("z", 6).alias("z"))
