"""Deterministic batch/stream twin of the reference's sensor simulator.

Mirrors the producer's semantics (reference: simulator/producer.py:67-106,
simulator/config.json:2-25) without Kafka: per-sensor Gaussian
inter-arrival (mean 250 ms, stddev 20%, clamped >= 0), per-sensor start
stagger, Bernoulli malformation replacing the numeric value with
"<<bad_data>>", valid values round(gauss(mu, mu/10), 3) clamped >= 0 with
mu = max(30, gauss(70, 20)) re-drawn per message.

Seeded ``random.Random`` -> fully reproducible fixtures for pipeline and
streaming tests. Generation happens driver-side (test-scale only); the
100 TB ingest path is the Kafka/file stream sources in sources/streams.py.
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from masd_spark.operators.validate import SENSOR_SCHEMA


@dataclass
class StationSpec:
    station_id: str
    station_name: str
    num_sensors: int


DEFAULT_STATIONS = [
    StationSpec("perugia", "Perugia", 15),
    StationSpec("foligno", "Foligno", 10),
    StationSpec("spoleto", "Spoleto", 8),
]


@dataclass
class SimulatorConfig:
    # copy, not alias: a caller mutating cfg.stations must not edit the
    # module-level default under every future SimulatorConfig()
    stations: list[StationSpec] = field(
        default_factory=lambda: list(DEFAULT_STATIONS)
    )
    mean_interval_ms: float = 250.0
    stddev_pct: float = 0.2
    malformation_pct: float = 0.05
    start_epoch_ms: int = 1_704_067_200_000  # 2024-01-01T00:00:00Z
    duration_ms: int = 60_000
    seed: int = 42


def generate_readings(cfg: SimulatorConfig | None = None) -> list[dict]:
    """All sensor readings for the configured interval, as dicts matching
    SENSOR_SCHEMA (value is a string; ~malformation_pct are bad).
    """
    cfg = cfg or SimulatorConfig()
    rng = random.Random(cfg.seed)
    out: list[dict] = []
    for st in cfg.stations:
        for sensor in range(st.num_sensors):
            # per-sensor start stagger (producer.py:92)
            t = cfg.start_epoch_ms + int(
                sensor * cfg.mean_interval_ms / st.num_sensors
            )
            while t < cfg.start_epoch_ms + cfg.duration_ms:
                if rng.random() < cfg.malformation_pct:
                    value = "<<bad_data>>"
                else:
                    mu = max(30.0, rng.gauss(70.0, 20.0))
                    value = str(max(0.0, round(rng.gauss(mu, mu / 10), 3)))
                out.append(
                    {
                        "station_name": st.station_name,
                        "station_id": st.station_id,
                        "sensor_id": str(sensor),
                        "timestamp": t,
                        "value": value,
                    }
                )
                gap = max(
                    0.0,
                    rng.gauss(
                        cfg.mean_interval_ms, cfg.mean_interval_ms * cfg.stddev_pct
                    ),
                )
                t += int(gap)
    return out


def readings_df(spark: SparkSession, cfg: SimulatorConfig | None = None) -> DataFrame:
    """Readings as a typed batch DataFrame (the stream's batch twin)."""
    return spark.createDataFrame(generate_readings(cfg), SENSOR_SCHEMA)


def write_json_drops(
    path: str, cfg: SimulatorConfig | None = None, n_files: int = 4,
    split: str = "roundrobin",
) -> int:
    """Write readings as n_files JSON-lines files (a file-source stream:
    each file becomes one micro-batch with maxFilesPerTrigger=1). Returns
    the row count. ``split='roundrobin'`` makes every file span the full
    time range — exercising multi-trigger window updates;
    ``split='time'`` cuts contiguous slices of the (stable) time-sorted
    rows — batches arrive in event-time order, as an order-sensitive
    stateful operator (streaming/stateful.py) requires.
    """
    import os

    rows = generate_readings(cfg)
    os.makedirs(path, exist_ok=True)
    buckets: list[list[dict]] = [[] for _ in range(n_files)]
    if split == "time":
        rows_sorted = sorted(rows, key=lambda r: r["timestamp"])  # stable
        chunk = (len(rows_sorted) + n_files - 1) // n_files
        for i in range(n_files):
            buckets[i] = rows_sorted[i * chunk:(i + 1) * chunk]
    else:
        for i, r in enumerate(rows):
            buckets[i % n_files].append(r)
    for i, bucket in enumerate(buckets):
        with open(os.path.join(path, f"drop_{i:03d}.json"), "w") as fh:
            for r in bucket:
                fh.write(json.dumps(r) + "\n")
    return len(rows)
