"""Streaming queries surfaced in the correctness harness.

The driver's oracle can't run a streaming query, so these are rows-only —
but the STREAM output is deterministic (seeded simulator, availableNow
file stream, update-mode last-emission reduction), and
tests/test_streaming.py proves it equals the batch twin of the same
operators.
"""

from __future__ import annotations

import contextlib
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


def _scratch_dir(prefix: str) -> str:
    """Per-run scratch (drops / sink / checkpoint) for the micro-stream
    twins — on tmpfs when available (optimization r8, guide §6/§2.1).

    Every one of these queries writes its checkpoint deltas, sink parquet
    and source drops to a throwaway tempdir; on this host /tmp is the
    erratic block device the session already routes shuffle files around
    (see session.py spark.local.dir), and a 4-batch stream pays it 32+
    tiny fsynced files per trigger. Placement of scratch I/O changes no
    emitted row. ``MASD_STREAM_SCRATCH`` overrides (e.g. a real cluster
    points it at job-local SSD); without /dev/shm the behavior is exactly
    the old tempfile default."""
    base = os.getenv("MASD_STREAM_SCRATCH")
    if base is None and os.path.isdir("/dev/shm"):
        base = "/dev/shm/masd-stream-scratch"
    if base:
        os.makedirs(base, exist_ok=True)
        return tempfile.mkdtemp(prefix=prefix, dir=base)
    return tempfile.mkdtemp(prefix=prefix)


@contextlib.contextmanager
def _stream_state_partitions(spark: SparkSession):
    """Pin ``spark.sql.shuffle.partitions`` (= streaming state-store
    partition count, fixed at first start by the fresh per-run
    checkpoint) to a value sized for these fixture-scale twins
    (optimization r8, guide §2.2).

    Each stateful operator maintains one state-store instance PER shuffle
    partition PER micro-batch — at 32 partitions the 3-file streams here
    commit 32 store snapshots (32 RocksDB instances for the TWS queries)
    per trigger to hold <=400 keys, which is pure machinery. Grouping,
    watermarks, dedup, timers and join matching are all per-key and
    partitioning-independent, so the emitted row set is identical (the
    batch-twin pins in tests/test_streaming.py hold unchanged).

    Scale-parameterized, not a local constant: ``MASD_STREAM_STATE_PARTITIONS``
    sizes it (a production deployment sizes state partitions to key
    cardinality x throughput, e.g. back to cores or far above); the
    default 4 fits the <=5k-rows-per-trigger fixture streams. Restored
    after the stream drains so batch queries keep the session default."""
    n = os.getenv("MASD_STREAM_STATE_PARTITIONS", "4")
    key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(key)
    spark.conf.set(key, n)
    try:
        yield
    finally:
        spark.conf.set(key, saved)


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

    workdir = _scratch_dir("masd_stream_q_")
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

        with _stream_state_partitions(spark):
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
    custom-stateful heavy-hitters operator. The registered plan is the
    scale-right transformWithStateInPandas MapState version (point
    reads/writes per touched sensor against the RocksDB state store; the
    vendored protobuf shim satisfies the TWS state protocol where no real
    wheel exists); the GroupState full-blob twin is the fallback when TWS
    prerequisites are absent. Tests pin both to the same batch-twin
    semantics. Last emission per station after the seeded availableNow
    stream drains equals the batch top-k over full history.
    """
    from masd_spark.operators.validate import classify_validity
    from masd_spark.streaming.stateful import (
        streaming_station_heavy_hitters,
        streaming_station_heavy_hitters_gs,
    )
    from masd_spark.vendor import ensure_protobuf_on_session

    try:
        ensure_protobuf_on_session(spark)
        import google.protobuf  # noqa: F401

        use_tws = True
    except ImportError:
        use_tws = False

    workdir = _scratch_dir("masd_hh_q_")
    src = os.path.join(workdir, "drops")
    sink_dir = os.path.join(workdir, "sink")
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    saved_provider = spark.conf.get(provider_key, None)
    try:
        cfg = SimulatorConfig(duration_ms=120_000, seed=13)
        write_json_drops(src, cfg, n_files=3)

        stream = classify_validity(read_file_sensor_stream(spark, src))
        if use_tws:
            spark.conf.set(
                provider_key,
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )
            out = streaming_station_heavy_hitters(stream, k=3)
        else:
            out = streaming_station_heavy_hitters_gs(stream, k=3)

        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            (
                batch_df.withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(sink_dir)
            )

        with _stream_state_partitions(spark):
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
        if saved_provider is None:
            try:
                spark.conf.unset(provider_key)
            except Exception:
                pass
        else:
            spark.conf.set(provider_key, saved_provider)
        shutil.rmtree(workdir, ignore_errors=True)


@register("streaming_dedup_ingest")
def streaming_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once ingestion made exactly-once:
    ``dropDuplicatesWithinWatermark`` on the natural reading identity
    (station, sensor, timestamp) in front of a per-key count — the
    streaming twin of ``dedup_exact_docs`` and the standard guard when a
    source (Kafka with producer retries, file re-drops) can re-deliver.
    Re-delivery is simulated by appending a copy of the first drop file;
    the emitted per-(station, sensor) counts must equal the duplicate-free
    batch counts (pinned by test_streaming_dedup_matches_batch_twin).

    Scale: dedup state is hash-partitioned by the dedup key and expired
    by the watermark — memory is bounded by (delay window × arrival
    rate), not history; the downstream count is an ordinary incremental
    streaming agg. ``sf_dir`` selects nothing (seeded generator input).
    """
    import shutil as _shutil

    from masd_spark.operators.validate import (
        classify_validity,
        with_event_time_ms,
    )

    workdir = _scratch_dir("masd_sdq_")
    src = os.path.join(workdir, "drops")
    sink_dir = os.path.join(workdir, "sink")
    try:
        cfg = SimulatorConfig(duration_ms=60_000, seed=29)
        write_json_drops(src, cfg, n_files=3)
        # simulate at-least-once: the whole first drop arrives again
        _shutil.copyfile(
            os.path.join(src, "drop_000.json"),
            os.path.join(src, "drop_redelivered.json"),
        )

        stream = with_event_time_ms(
            classify_validity(read_file_sensor_stream(spark, src))
        )
        deduped = stream.withWatermark(
            "event_time", "10 minutes"
        ).dropDuplicatesWithinWatermark(["station_id", "sensor_id", "timestamp"])
        counts = deduped.groupBy("station_id", "sensor_id").agg(
            F.count("*").alias("n_readings"),
            F.sum(F.col("is_valid").cast("long")).alias("n_valid"),
        )

        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            (
                batch_df.withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(sink_dir)
            )

        with _stream_state_partitions(spark):
            q = (
                counts.writeStream.foreachBatch(write_batch)
                .outputMode("update")
                .option("checkpointLocation", os.path.join(workdir, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)

        from pyspark.sql import Window

        w = Window.partitionBy("station_id", "sensor_id").orderBy(
            F.col("batch_id").desc()
        )
        latest = (
            spark.read.parquet(sink_dir)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("station_id", "sensor_id", "n_readings", "n_valid")
        )
        return latest.localCheckpoint(eager=True)
    finally:
        _shutil.rmtree(workdir, ignore_errors=True)


@register("streaming_timer_sessions")
def streaming_timer_sessions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time-TIMER sessionization (transformWithStateInPandas,
    timeMode=EventTime): sessions close either inline (a later event for
    the key reveals the gap) or — the case only timers can express —
    when a key goes silent and OTHER keys advance the watermark past its
    last event + gap. Deterministic crafted drops: station 'alpha'
    bursts once then goes silent (its session emits ONLY via the timer),
    'bob' exercises cross-batch and in-batch gap closure, trailing open
    sessions never emit. Rows-only (streaming, generated input);
    tests/test_streaming.py pins the exact emission set.
    """
    import json as _json

    from masd_spark.operators.validate import with_event_time_ms
    from masd_spark.streaming.stateful import (
        TSESS_OUTPUT_SCHEMA,  # noqa: F401  (schema contract documented there)
        streaming_timer_sessions,
    )
    from masd_spark.vendor import ensure_protobuf_on_session

    ensure_protobuf_on_session(spark)

    base = 1_704_067_200_000

    def burst(station, t0, n=6, step=1000):
        return [
            {"station_name": station.title(), "station_id": station,
             "sensor_id": "0", "timestamp": t0 + i * step, "value": "1.0"}
            for i in range(n)
        ]

    files = [
        burst("alpha", base) + burst("bob", base) + burst("cara", base),
        burst("bob", base + 60_000) + burst("bob", base + 120_000)
        + burst("cara", base + 60_000),
        burst("bob", base + 180_000) + burst("cara", base + 180_000),
    ]

    workdir = _scratch_dir("masd_tsess_q_")
    src = os.path.join(workdir, "drops")
    sink_dir = os.path.join(workdir, "sink")
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    saved_provider = spark.conf.get(provider_key, None)
    try:
        os.makedirs(src)
        for i, rows in enumerate(files):
            with open(os.path.join(src, f"f{i}.json"), "w") as fh:
                for r in rows:
                    fh.write(_json.dumps(r) + "\n")
        spark.conf.set(
            provider_key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        stream = with_event_time_ms(read_file_sensor_stream(spark, src))
        out = streaming_timer_sessions(
            stream.withWatermark("event_time", "1 second"), gap_ms=30_000
        )
        with _stream_state_partitions(spark):
            q = (
                out.writeStream.foreachBatch(
                    lambda df, bid: df.write.mode("append").parquet(sink_dir)
                )
                .outputMode("append")
                .option("checkpointLocation", os.path.join(workdir, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)
        return spark.read.parquet(sink_dir).localCheckpoint(eager=True)
    finally:
        if saved_provider is None:
            try:
                spark.conf.unset(provider_key)
            except Exception:
                pass
        else:
            spark.conf.set(provider_key, saved_provider)
        shutil.rmtree(workdir, ignore_errors=True)


@register("streaming_sensor_ewma")
def streaming_sensor_ewma_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(station, sensor) EWMA of valid readings carried across
    micro-batches in GroupState (applyInPandasWithState) — the
    smoothing/denoising custom stateful operator, registered so the
    family's applyInPandasWithState leg is a first-class harness entry
    like the TWS legs. The result is the LAST emission per key (the
    running (n_valid, ewma) after the final trigger), which
    test_stateful_ewma_matches_sequential_fold pins equal to the
    sequential time-ordered fold over the full history. ewma is rounded
    to 6dp for presentation; the fold itself is float-exact per the
    chunk-concat + single-sort discipline in streaming/stateful.py.

    Scale: state per key is (count, ewma) — O(keys) total, point
    updates per trigger; emission is per-key-per-trigger in update
    mode. ``sf_dir`` selects nothing (seeded generator input).
    """
    from masd_spark.operators.validate import classify_validity
    from masd_spark.streaming.stateful import streaming_sensor_ewma

    workdir = _scratch_dir("masd_ewma_q_")
    src = os.path.join(workdir, "drops")
    sink_dir = os.path.join(workdir, "sink")
    try:
        cfg = SimulatorConfig(duration_ms=120_000, seed=13)
        write_json_drops(src, cfg, n_files=3, split="time")

        stream = classify_validity(read_file_sensor_stream(spark, src))
        out = streaming_sensor_ewma(stream, alpha=0.3)

        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            (
                batch_df.withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(sink_dir)
            )

        with _stream_state_partitions(spark):
            q = (
                out.writeStream.foreachBatch(write_batch)
                .outputMode("update")
                .option("checkpointLocation", os.path.join(workdir, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)

        from pyspark.sql import Window

        w = Window.partitionBy("station_id", "sensor_id").orderBy(
            F.col("batch_id").desc()
        )
        latest = (
            spark.read.parquet(sink_dir)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "station_id",
                "sensor_id",
                "n_valid",
                F.round("ewma", 6).alias("ewma"),
            )
        )
        return latest.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@register("streaming_interval_join")
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner interval join registered as a harness query:
    two file-drop streams (clicks, purchases from the seeded simulator's
    event split), watermarks on BOTH sides, purchase within 10 minutes
    after the click — state on each side is bounded by
    watermark-delay + interval, the property that makes stream-stream
    joins feasible at all (unbounded-state joins are rejected by Spark).
    The emitted set equals the batch twin of the identical join
    (pinned at the operator level by test_stream_stream_interval_join);
    here the deterministic seeded input makes the harness row-set
    stable. ``sf_dir`` selects nothing (generator input).
    """
    import json as _json

    workdir = _scratch_dir("masd_ssj_q_")
    cdir = os.path.join(workdir, "clicks")
    pdir = os.path.join(workdir, "purch")
    try:
        base = 1_704_067_200_000
        clicks = [
            {"user_id": u, "ts": base + i * 60_000}
            for u in range(5)
            for i in range(12)
        ]
        purchases = [
            {"user_id": u, "ts": base + i * 90_000 + 5_000,
             "amount": float(u * 100 + i)}
            for u in range(5)
            for i in range(9)
        ]
        for d, rows in [(cdir, clicks), (pdir, purchases)]:
            os.makedirs(d)
            mid = len(rows) // 2
            for i, chunk in enumerate([rows[:mid], rows[mid:]]):
                with open(os.path.join(d, f"f{i}.json"), "w") as fh:
                    for r in rows[:mid] if i == 0 else rows[mid:]:
                        fh.write(_json.dumps(r) + "\n")

        def src(d, schema, tcol):
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .json(d)
                .withColumn(tcol, F.timestamp_millis(F.col("ts")))
                .withWatermark(tcol, "1 minute")
            )

        c = src(cdir, "user_id long, ts long", "c_time").withColumnRenamed(
            "ts", "c_ts"
        )
        p = src(
            pdir, "user_id long, ts long, amount double", "p_time"
        ).withColumnRenamed("ts", "p_ts")
        joined = c.join(
            p,
            F.expr(
                "c_time <= p_time AND p_time <= c_time + interval 10 minutes"
            )
            & (c["user_id"] == p["user_id"]),
        ).select(c["user_id"], "c_ts", "p_ts", "amount")

        sink_dir = os.path.join(workdir, "sink")
        with _stream_state_partitions(spark):
            q = (
                joined.writeStream.foreachBatch(
                    lambda df, bid: df.write.mode("append").parquet(sink_dir)
                )
                .option("checkpointLocation", os.path.join(workdir, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)
        return spark.read.parquet(sink_dir).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
