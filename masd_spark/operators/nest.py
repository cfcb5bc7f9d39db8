"""Document-shaping (struct re-nesting) operator.

Reference: spark-app/consumer.py:142-165 (``prepare_output_structure``) —
the flat aggregate row is re-nested into a 4-struct document
{window{start,end}, station{id,name}, sensor{id}, metrics{min,max,avg,
count{total,malformed}}} before the sink write. Pure projection; zero cost
at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nest_sensor_document(
    df: DataFrame,
    station_id: str = "station_id",
    station_name: str = "station_name",
    sensor_id: str = "sensor_id",
    include_valid_count: bool = True,
) -> DataFrame:
    """Build the reference's output document shape from a windowed_metrics
    result. Unlike the reference we keep ``valid`` in the count struct
    (the reference computes it then drops it — consumer.py:134,160-163).
    """
    count_fields = [
        F.col("total_count").alias("total"),
        F.col("malformed_count").alias("malformed"),
    ]
    if include_valid_count:
        count_fields.insert(1, F.col("valid_count").alias("valid"))
    return df.select(
        F.struct(
            F.col("window.start").alias("start"),
            F.col("window.end").alias("end"),
        ).alias("window"),
        F.struct(
            F.col(station_id).alias("id"),
            F.col(station_name).alias("name"),
        ).alias("station"),
        F.struct(F.col(sensor_id).alias("id")).alias("sensor"),
        F.struct(
            F.col("min_val").alias("min_value"),
            F.col("max_val").alias("max_value"),
            F.col("avg_val").alias("avg_value"),
            F.struct(*count_fields).alias("count"),
        ).alias("metrics"),
    )
