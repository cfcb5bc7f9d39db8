"""Queries over the Python Data Source sensor feed (sources/pyds.py).

The oracle re-derives the SOURCE ITSELF in SQL: every row of the feed is
a pure function of md5('pyds:' || i), which DuckDB computes identically —
so the correctness check covers the data source's generation, Spark's
partitioned scan of it, and the aggregation on top, end to end. (Same
oracle recipe as the md5-derived sampling family, operators/sampling.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from masd_spark.queries import register
from masd_spark.sources.pyds import SOURCE_NAME, register_sensor_source

N_ROWS = 20_000
N_PARTS = 8


def _hex_at(pos: int) -> str:
    """DuckDB: value of hex digit ``pos`` (1-based) of the row hash."""
    return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"


def _hex4_at(pos: int) -> str:
    """DuckDB: 4 hex digits starting at 1-based ``pos`` as an integer —
    the twin of Python's int(h[pos-1:pos+3], 16)."""
    return (
        f"({_hex_at(pos)} * 4096 + {_hex_at(pos + 1)} * 256 "
        f"+ {_hex_at(pos + 2)} * 16 + {_hex_at(pos + 3)})"
    )


_FEED_SQL = f"""
    WITH gen AS (
        SELECT CAST(i AS BIGINT) AS i,
               md5('pyds:' || CAST(i AS VARCHAR)) AS h
        FROM range(0, {N_ROWS}) t(i)
    ),
    readings AS (
        SELECT i AS reading_id,
               'S' || CAST({_hex_at(1)} % 8 AS VARCHAR) AS station,
               1700000000000 + i * 1000 AS ts_ms,
               CAST({_hex4_at(2)} - 32768 AS BIGINT) AS temp_c100,
               CASE WHEN {_hex_at(6)} < 2 THEN 'alert' ELSE 'ok' END AS status
        FROM gen
    )
"""


@register(
    "pyds_station_profile",
    oracle=_FEED_SQL
    + """
    SELECT station,
           CAST(count(*) AS BIGINT) AS n_readings,
           CAST(sum(CASE WHEN status = 'alert' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_alerts,
           ROUND(CAST(sum(temp_c100) AS DOUBLE) / (100 * count(*)), 6)
               AS avg_temp,
           min(ts_ms) AS first_ts_ms,
           max(ts_ms) AS last_ts_ms
    FROM readings
    GROUP BY station
    """,
)
def pyds_station_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-station rollup over the Python Data Source feed: 20k generated
    readings scanned through ``spark.read.format("masd_sensor_readings")``
    across 8 index-range partitions (no driver materialization), then one
    partial+final agg on 8 station keys. avg is exact integer
    centi-degree sums divided once at the surface — identical IEEE ops on
    both engines. sf_dir is unused: the source generates its rows.
    """
    register_sensor_source(spark)
    df = (
        spark.read.format(SOURCE_NAME)
        .option("n", N_ROWS)
        .option("partitions", N_PARTS)
        .load()
    )
    return df.groupBy("station").agg(
        F.count("*").alias("n_readings"),
        F.sum(F.when(F.col("status") == "alert", 1).otherwise(0)).alias(
            "n_alerts"
        ),
        F.round(
            F.sum("temp_c100").cast("double") / (100 * F.count("*")), 6
        ).alias("avg_temp"),
        F.min("ts_ms").alias("first_ts_ms"),
        F.max("ts_ms").alias("last_ts_ms"),
    )


@register(
    "pyds_filtered_alerts",
    oracle=_FEED_SQL
    + """
    SELECT reading_id, station, temp_c100
    FROM readings
    WHERE reading_id >= 5000 AND reading_id < 8000 AND status = 'alert'
    """,
)
def pyds_filtered_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-probe of the feed: the reading_id bounds push into the
    source's ``pushFilters`` and narrow the GENERATED range itself to
    [5000, 8000) — rows outside are never produced, the generator twin of
    partition pruning (asserted in tests/test_pyds.py via the planned
    partitions). The residual status predicate stays with Spark."""
    register_sensor_source(spark)
    df = (
        spark.read.format(SOURCE_NAME)
        .option("n", N_ROWS)
        .option("partitions", N_PARTS)
        .load()
    )
    return df.filter(
        (F.col("reading_id") >= 5000)
        & (F.col("reading_id") < 8000)
        & (F.col("status") == "alert")
    ).select("reading_id", "station", "temp_c100")
