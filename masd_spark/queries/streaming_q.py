"""Streaming queries surfaced in the correctness harness.

The driver's oracle can't run a streaming query, so these are rows-only —
but the STREAM output is deterministic (seeded simulator, availableNow
file stream, update-mode last-emission reduction), and
tests/test_streaming.py proves it equals the batch twin of the same
operators.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from masd_spark.queries import register
from masd_spark.sources.simulator import SimulatorConfig, write_json_drops
from masd_spark.streaming.pipeline import (
    read_file_sensor_stream,
    sensor_pipeline,
    start_keyed_sink,
)


_KEY_COLS = ["window_start_ms", "station_id", "station_name", "sensor_id"]


@register("streaming_masd_rollup")
def streaming_masd_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference pipeline run AS A STREAM (file-drop micro-batches ->
    watermark -> windowed metrics -> foreachBatch), reduced to the last
    emission per (window, station, sensor) — i.e. the document set the
    keyed sink would hold after an upsert. The upsert reduction is itself
    Spark-side: micro-batches land in parquet stamped with ``batch_id``,
    and a window (`row_number` over batch_id desc) keeps the latest row
    per key — no driver collect() anywhere, the same pattern an upsert
    sink uses at scale. ``sf_dir`` selects nothing (input is the seeded
    simulator); kept for the harness signature.
    """
    from pyspark.sql import Window

    workdir = tempfile.mkdtemp(prefix="masd_stream_q_")
    src = os.path.join(workdir, "drops")
    sink_dir = os.path.join(workdir, "sink")
    try:
        cfg = SimulatorConfig(duration_ms=120_000, seed=13)
        write_json_drops(src, cfg, n_files=3)

        def write_batch(batch_df: DataFrame, batch_id: int, _path: str) -> None:
            (
                batch_df.select(
                    F.unix_millis("window.start").alias("window_start_ms"),
                    "station_id",
                    "station_name",
                    "sensor_id",
                    "total_count",
                    "valid_count",
                    "malformed_count",
                    "avg_val",
                    "min_val",
                    "max_val",
                )
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(sink_dir)
            )

        agg = sensor_pipeline(
            read_file_sensor_stream(spark, src),
            watermark_delay="10 minutes",
            nest=False,
        )
        q = start_keyed_sink(
            agg,
            path=sink_dir,
            checkpoint_dir=os.path.join(workdir, "ckpt"),
            available_now=True,
            write_batch=write_batch,
        )
        q.awaitTermination(600)

        w = Window.partitionBy(*_KEY_COLS).orderBy(F.col("batch_id").desc())
        latest = (
            spark.read.parquet(sink_dir)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                *_KEY_COLS,
                "total_count",
                "valid_count",
                "malformed_count",
                F.round("avg_val", 6).alias("avg_val"),
                "min_val",
                "max_val",
            )
        )
        # materialize before the tempdir (the parquet source) is removed
        return latest.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@register("streaming_heavy_hitters")
def streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-station top-3 sensors by valid-reading count via the
    custom-stateful heavy-hitters operator (GroupState twin here — the
    transformWithStateInPandas MapState version needs protobuf, absent in
    this container; tests pin both to the same batch-twin semantics).
    Last emission per station after the seeded availableNow stream
    drains, which tests prove equals the batch top-k over full history.
    """
    from masd_spark.operators.validate import classify_validity
    from masd_spark.streaming.stateful import streaming_station_heavy_hitters_gs

    workdir = tempfile.mkdtemp(prefix="masd_hh_q_")
    src = os.path.join(workdir, "drops")
    sink_dir = os.path.join(workdir, "sink")
    try:
        cfg = SimulatorConfig(duration_ms=120_000, seed=13)
        write_json_drops(src, cfg, n_files=3)

        stream = classify_validity(read_file_sensor_stream(spark, src))
        out = streaming_station_heavy_hitters_gs(stream, k=3)

        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            (
                batch_df.withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(sink_dir)
            )

        q = (
            out.writeStream.foreachBatch(write_batch)
            .outputMode("update")
            .option("checkpointLocation", os.path.join(workdir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)

        from pyspark.sql import Window

        w = Window.partitionBy("station_id", "rank").orderBy(
            F.col("batch_id").desc()
        )
        latest = (
            spark.read.parquet(sink_dir)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("station_id", "rank", "sensor_id", "n_valid")
        )
        return latest.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
