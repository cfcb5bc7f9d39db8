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


# -- recovery fuzz: kill/restart at random micro-batch boundaries -----------
#
# test_checkpoint_recovery pins exactly-once resume at FIXED points (clean
# drain, then a no-new-files restart). This axis samples the space the
# claim actually covers (VERDICT r7 item 6): a query killed at an
# ARBITRARY micro-batch boundary — by injected sink failure (foreachBatch
# raises, on_error='fail' keeps the checkpoint from advancing past the
# lost batch) or by a hard q.stop() mid-run — must, after a restart from
# the same checkpoint, drain to a final per-key state equal to the batch
# twin. maxFilesPerTrigger=1 makes micro-batch boundaries deterministic
# (one file = one batch), so kill_after selects a precise boundary.


def run_recovery_example(
    spark, seed, duration_ms, geometry, n_files, kill_after, kill_mode
):
    """One kill/restart example; raises AssertionError on divergence."""
    import time as _time

    window, slide = geometry
    cfg = SimulatorConfig(duration_ms=duration_ms, seed=seed)
    work = tempfile.mkdtemp(prefix="fuzz_recov_")
    try:
        n = write_json_drops(f"{work}/drops", cfg, n_files=n_files)
        assert n > 0
        collected: list = []

        def start(sink):
            agg = sensor_pipeline(
                read_file_sensor_stream(spark, f"{work}/drops"),
                window_duration=window,
                slide_duration=slide,
                watermark_delay="10 minutes",
                nest=False,
            )
            return start_keyed_sink(
                agg,
                path=f"{work}/out",
                checkpoint_dir=f"{work}/ckpt",
                available_now=True,
                write_batch=sink,
            )

        # -- phase 1: run and kill at the sampled boundary ------------------
        if kill_mode == "exception":
            fired = {"n": 0}

            def failing_sink(batch_df, batch_id, _path):
                if fired["n"] == kill_after:
                    fired["n"] += 1
                    raise RuntimeError("injected sink failure (recovery fuzz)")
                fired["n"] += 1
                collected.append((batch_id, batch_df.collect()))

            q = start(failing_sink)
            try:
                q.awaitTermination(300)
            except Exception:
                pass  # expected: the injected failure terminates the query
            finally:
                try:
                    q.stop()
                except Exception:
                    pass
        else:  # hard stop once kill_after batches were delivered

            def sink(batch_df, batch_id, _path):
                collected.append((batch_id, batch_df.collect()))

            q = start(sink)
            deadline = _time.time() + 300
            while (
                _time.time() < deadline
                and q.isActive
                and len(collected) < kill_after
            ):
                _time.sleep(0.05)
            try:
                q.stop()
            except Exception:
                pass

        # -- phase 2: restart from the same checkpoint, drain fully ---------
        def sink2(batch_df, batch_id, _path):
            collected.append((batch_id, batch_df.collect()))

        q2 = start(sink2)
        try:
            finished = q2.awaitTermination(300)
            assert finished, "restarted query did not drain in 300s"
        finally:
            q2.stop()

        # last-update-wins over ARRIVAL order: a batch aborted mid-flight in
        # phase 1 may have been delivered once uncommitted and replayed in
        # phase 2 — the replay must win, and must equal the batch twin.
        last = {}
        for _, rows in collected:
            last.update(_key_rows(rows))
        expected = _key_rows(
            sensor_pipeline(
                readings_df(spark, cfg),
                window_duration=window,
                slide_duration=slide,
                nest=False,
            ).collect()
        )
        assert last == expected, (
            f"recovery stream!=batch for seed={seed} span={duration_ms}ms "
            f"window={window} slide={slide} files={n_files} "
            f"kill_after={kill_after} mode={kill_mode}: "
            f"{len(last)} vs {len(expected)} keys"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@settings(
    max_examples=6,
    derandomize=True,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    duration_ms=st.sampled_from([60_000, 120_000, 180_000]),
    geometry=st.sampled_from(_WINDOWS),
    n_files=st.integers(min_value=2, max_value=5),
    kill_at_frac=st.floats(min_value=0.0, max_value=1.0),
    kill_mode=st.sampled_from(["exception", "stop"]),
)
def test_random_kill_restart_resumes_exactly_once(
    spark, seed, duration_ms, geometry, n_files, kill_at_frac, kill_mode
):
    kill_after = min(int(kill_at_frac * n_files), n_files - 1)
    run_recovery_example(
        spark, seed, duration_ms, geometry, n_files, kill_after, kill_mode
    )
