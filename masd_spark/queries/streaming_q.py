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


@register("streaming_masd_rollup")
def streaming_masd_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference pipeline run AS A STREAM (file-drop micro-batches ->
    watermark -> windowed metrics -> foreachBatch), reduced to the last
    emission per (window, station, sensor) — i.e. the document set the
    keyed sink would hold after an upsert. ``sf_dir`` selects nothing
    (input is the seeded simulator); kept for the harness signature.
    """
    workdir = tempfile.mkdtemp(prefix="masd_stream_q_")
    src = os.path.join(workdir, "drops")
    try:
        cfg = SimulatorConfig(duration_ms=120_000, seed=13)
        write_json_drops(src, cfg, n_files=3)
        collected: list = []

        def collect_batch(batch_df: DataFrame, batch_id: int, _path: str) -> None:
            collected.append((batch_id, batch_df.collect()))

        agg = sensor_pipeline(
            read_file_sensor_stream(spark, src),
            watermark_delay="10 minutes",
            nest=False,
        )
        q = start_keyed_sink(
            agg,
            path=os.path.join(workdir, "out"),
            checkpoint_dir=os.path.join(workdir, "ckpt"),
            available_now=True,
            write_batch=collect_batch,
        )
        q.awaitTermination(600)

        last: dict = {}
        for batch_id, rows in sorted(collected, key=lambda x: x[0]):
            for r in rows:
                key = (
                    r["window"]["start"],
                    r["station_id"],
                    r["station_name"],
                    r["sensor_id"],
                )
                last[key] = r
        out_rows = [
            {
                "window_start_ms": int(k[0].timestamp() * 1000),
                "station_id": k[1],
                "station_name": k[2],
                "sensor_id": k[3],
                "total_count": r["total_count"],
                "valid_count": r["valid_count"],
                "malformed_count": r["malformed_count"],
                "avg_val": None if r["avg_val"] is None else round(r["avg_val"], 6),
                "min_val": r["min_val"],
                "max_val": r["max_val"],
            }
            for k, r in last.items()
        ]
        schema = (
            "window_start_ms long, station_id string, station_name string, "
            "sensor_id string, total_count long, valid_count long, "
            "malformed_count long, avg_val double, min_val double, max_val double"
        )
        return spark.createDataFrame(out_rows, schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
