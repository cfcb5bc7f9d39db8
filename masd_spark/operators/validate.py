"""Parse + validity classification operators.

Reproduces the reference's "ingest everything, classify validity as a
column" semantic (reference: spark-app/consumer.py:93-116): dirty data is
in-band — a ``value`` string that fails a numeric cast is malformed, not
rejected. We use ``try_cast`` so the semantic survives ANSI mode (Spark 4
default), where a plain CAST would throw instead of yielding null.

All pure column operations — whole-stage-codegen'd, no UDFs, identical in
batch and streaming plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The reference's sensor-reading schema (reference: spark-app/consumer.py:39-45).
SENSOR_SCHEMA = T.StructType(
    [
        T.StructField("station_name", T.StringType()),
        T.StructField("station_id", T.StringType()),
        T.StructField("sensor_id", T.StringType()),
        T.StructField("timestamp", T.LongType()),  # epoch milliseconds
        T.StructField("value", T.StringType()),  # number-ish or "<<bad_data>>"
    ]
)


def parse_json_records(
    df: DataFrame, schema: T.StructType = SENSOR_SCHEMA, value_col: str = "value"
) -> DataFrame:
    """Schema-directed JSON decode of a (binary or string) message column,
    flattened to top-level columns (reference: spark-app/consumer.py:100-102).

    PERMISSIVE parse: a malformed JSON envelope yields all-null fields rather
    than failing the batch.
    """
    return df.select(
        F.from_json(F.col(value_col).cast("string"), schema).alias("data")
    ).select("data.*")


def try_cast_double(col: Column | str) -> Column:
    """Permissive string->double cast: null on non-numeric input.

    Matches the reference's non-ANSI ``CAST(value AS double)``
    (reference: spark-app/consumer.py:105-107) under any ANSI setting.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def classify_validity(
    df: DataFrame,
    value_col: str = "value",
    numeric_col: str = "value_numeric",
    flag_col: str = "is_valid",
) -> DataFrame:
    """Add ``value_numeric`` (try-cast double) and ``is_valid``
    (``value_numeric IS NOT NULL``) — reference: spark-app/consumer.py:105-111.
    """
    return df.withColumn(numeric_col, try_cast_double(value_col)).withColumn(
        flag_col, F.col(numeric_col).isNotNull()
    )


def with_event_time_ms(
    df: DataFrame, epoch_ms_col: str = "timestamp", out_col: str = "event_time"
) -> DataFrame:
    """Epoch-ms long -> TimestampType, losslessly.

    The reference computes ``to_timestamp(timestamp / 1000)`` (float seconds,
    reference: spark-app/consumer.py:115); ``timestamp_millis`` is the exact
    integer equivalent.
    """
    return df.withColumn(out_col, F.timestamp_millis(F.col(epoch_ms_col)))
