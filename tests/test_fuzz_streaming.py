"""Randomized stream==batch differential testing.

The fixed streaming tests pin one window/slide/file-split each; this
axis samples the configuration space — random simulator seed and span,
random tumbling/sliding window geometry, random micro-batch count —
and asserts the UPDATE-mode streaming aggregation's final emission per
key equals the batch twin over the same rows for EVERY sampled
configuration. The operators are shared between the two paths, so any
failure is in the streaming state plumbing itself: watermark
initialization, partial-aggregate merge across triggers, window
assignment at micro-batch boundaries.

Watermark is held at 10 minutes (beyond the generator's max disorder)
so no rows drop — late-data semantics have their own dedicated tests;
this axis isolates incremental-state correctness. Derandomized; 8
examples (each spins up a real streaming query, ~5s apiece).
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings, strategies as st

from masd_spark.sources.simulator import (
    SimulatorConfig,
    readings_df,
    write_json_drops,
)
from masd_spark.streaming.pipeline import (
    read_file_sensor_stream,
    sensor_pipeline,
    start_keyed_sink,
)

_WINDOWS = [
    ("30 seconds", None),
    ("45 seconds", None),
    ("1 minute", None),
    ("2 minutes", None),
    ("1 minute", "30 seconds"),
    ("2 minutes", "1 minute"),
    ("90 seconds", "45 seconds"),
]


def _key_rows(rows):
    out = {}
    for r in rows:
        out[(r["window"]["start"], r["station_id"], r["sensor_id"])] = (
            r["total_count"],
            r["valid_count"],
            r["malformed_count"],
            None if r["avg_val"] is None else round(r["avg_val"], 9),
        )
    return out


@settings(
    max_examples=8,
    derandomize=True,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    duration_ms=st.sampled_from([60_000, 120_000, 180_000, 240_000]),
    geometry=st.sampled_from(_WINDOWS),
    n_files=st.integers(min_value=1, max_value=5),
)
def test_random_stream_config_matches_batch_twin(
    spark, seed, duration_ms, geometry, n_files
):
    window, slide = geometry
    cfg = SimulatorConfig(duration_ms=duration_ms, seed=seed)
    work = tempfile.mkdtemp(prefix="fuzz_stream_")
    try:
        n = write_json_drops(f"{work}/drops", cfg, n_files=n_files)
        assert n > 0

        collected: list = []

        def sink(batch_df, batch_id, _path):
            collected.append((batch_id, batch_df.collect()))

        agg = sensor_pipeline(
            read_file_sensor_stream(spark, f"{work}/drops"),
            window_duration=window,
            slide_duration=slide,
            watermark_delay="10 minutes",
            nest=False,
        )
        q = start_keyed_sink(
            agg,
            path=f"{work}/out",
            checkpoint_dir=f"{work}/ckpt",
            available_now=True,
            write_batch=sink,
        )
        try:
            finished = q.awaitTermination(300)
            assert finished, (
                f"streaming query did not drain in 300s (seed={seed} "
                f"files={n_files}) — comparison below would be partial"
            )
        finally:
            q.stop()  # never rmtree under a live query

        last = {}
        for _, rows in sorted(collected, key=lambda x: x[0]):
            last.update(_key_rows(rows))

        batch = sensor_pipeline(
            readings_df(spark, cfg),
            window_duration=window,
            slide_duration=slide,
            nest=False,
        )
        expected = _key_rows(batch.collect())
        assert last == expected, (
            f"stream!=batch for seed={seed} span={duration_ms}ms "
            f"window={window} slide={slide} files={n_files}: "
            f"{len(last)} vs {len(expected)} keys"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
