"""Time-windowed validity metrics — the reference's core aggregation.

Reference: spark-app/consumer.py:119-139 (``compute_aggregations``):
group by (time window x key columns), computing

- total_count     = count(*)                      (includes malformed rows)
- valid_count     = count of rows where is_valid
- malformed_count = count of rows where not is_valid
- avg/min/max_val = over valid rows only (``when`` without ``otherwise``
                    yields null; null-skipping aggregates) — a group with
                    zero valid rows emits nulls, not zero.

Invariant: valid_count + malformed_count == total_count. The reference
computes valid_count then drops it from its output document
(consumer.py:134 vs consumer.py:160-163); we keep it — it's free.

Scale notes: this is a plain hash aggregation — Spark plans it as
partial (map-side) + final aggregation, so the shuffle carries one row per
(window x key) group per map task, not raw events. State in streaming mode
is bounded by the watermark. No UDFs, fully codegen'd.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def metric_columns(
    value_col: str = "value_numeric", flag_col: str = "is_valid"
) -> list[Column]:
    """The A1-A6 aggregate expressions (reference: consumer.py:133-138)."""
    valid = F.col(flag_col)
    val = F.col(value_col)
    return [
        F.count("*").alias("total_count"),
        F.sum(F.when(valid, 1).otherwise(0)).alias("valid_count"),
        F.sum(F.when(valid, 0).otherwise(1)).alias("malformed_count"),
        F.avg(F.when(valid, val)).alias("avg_val"),
        F.min(F.when(valid, val)).alias("min_val"),
        F.max(F.when(valid, val)).alias("max_val"),
    ]


def windowed_metrics(
    df: DataFrame,
    time_col: str = "event_time",
    keys: Sequence[str] = (),
    window_duration: str = "1 minute",
    slide_duration: str | None = None,
    value_col: str = "value_numeric",
    flag_col: str = "is_valid",
) -> DataFrame:
    """Tumbling (or sliding) event-time window aggregation keyed by
    (window, *keys) — reference: consumer.py:127-139. Works on both batch
    and streaming DataFrames (streaming needs an upstream watermark).
    """
    window = F.window(F.col(time_col), window_duration, slide_duration or window_duration)
    # Explicit contract: a reading without an event time cannot be
    # bucketed — it is invalid input and is EXCLUDED (F.window would drop
    # it silently anyway; the filter makes the semantics visible and
    # engine-portable — SQL bucket arithmetic would keep a NULL bucket).
    return (
        df.filter(F.col(time_col).isNotNull())
        .groupBy(window, *[F.col(k) for k in keys])
        .agg(*metric_columns(value_col, flag_col))
    )
