"""Sensor readings as a first-class Spark *Python Data Source* (Spark 4
``pyspark.sql.datasource``) — batch + streaming, with reading-id range
pushdown.

This is the engine's native re-expression of the reference's custom
ingest path (reference: spark-app/producer.py:67-106 generates readings
into Kafka; consumer.py:83-90 reads them back): instead of an external
broker, the generator IS a pluggable Spark source — ``spark.read
.format("masd_sensor_readings")`` for batch backfills and
``spark.readStream`` for the micro-batch path, with Spark tracking
offsets exactly like it would Kafka's.

Determinism contract: every field of row ``i`` is a pure function of
md5(f"pyds:{i}"), so ANY reader — a Spark partition, a streaming
micro-batch replay after failure, or the DuckDB oracle re-deriving the
same rows in SQL — produces identical values. That makes the source
value-oracle-checkable end to end (queries/pyds_q.py) and gives the
stream reader exact replayability (``readBetweenOffsets``) for free.

Scale design: partitions are index ranges — generation is embarrassingly
parallel, no driver materialization, no shuffle. Filter pushdown narrows
the generated range itself (reading_id bounds reach ``partitions()``
BEFORE planning, like parquet row-group pruning), so a probe query over
a huge virtual range only ever generates the rows it reads. Classes are
registered pickle-by-value (pyspark's vendored cloudpickle), so a plain
driver-provided session needs no worker PYTHONPATH setup.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence
from dataclasses import dataclass
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

SOURCE_NAME = "masd_sensor_readings"

SCHEMA = (
    "reading_id bigint, station string, ts_ms bigint, "
    "temp_c100 bigint, status string"
)

_EPOCH_MS = 1_700_000_000_000
_N_STATIONS = 8
_ALERT_CUTOFF = 2  # hex digit 6 in [0, _ALERT_CUTOFF) -> 'alert' (1/8 of rows)


def gen_row(i: int) -> tuple[int, str, int, int, str]:
    """Row ``i`` of the deterministic feed. Single source of truth for the
    batch reader, the stream reader, the tests, and (re-derived in SQL)
    the DuckDB oracle — see queries/pyds_q.py for the SQL twin of each
    expression. temp_c100 is integer centi-degrees so every aggregate
    over it is exact integer math."""
    h = hashlib.md5(f"pyds:{i}".encode()).hexdigest()
    return (
        i,
        f"S{int(h[0], 16) % _N_STATIONS}",
        _EPOCH_MS + i * 1000,
        int(h[1:5], 16) - 32768,
        "alert" if int(h[5], 16) < _ALERT_CUTOFF else "ok",
    )


def gen_rows(start: int, end: int) -> Iterator[tuple]:
    return (gen_row(i) for i in range(start, end))


@dataclass
class RangePartition(InputPartition):
    start: int
    end: int


class SensorBatchReader(DataSourceReader):
    """Batch reader over rows [0, n): ``partitions`` index ranges, range
    pushdown on reading_id (the generator analogue of parquet row-group
    pruning — unhandled predicates stay with Spark)."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", 10_000))
        self.n_parts = max(1, int(options.get("partitions", 8)))
        self.lo = 0
        self.hi = self.n

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        handled = (
            GreaterThanOrEqual,
            GreaterThan,
            LessThan,
            LessThanOrEqual,
            EqualTo,
        )
        for f in filters:
            if (
                getattr(f, "attribute", None) != ("reading_id",)
                or not isinstance(f, handled)
                or not isinstance(f.value, int)
            ):
                yield f  # unsupported shape: Spark keeps the predicate
                continue
            v = int(f.value)
            if isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, v)
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, v + 1)
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, v)
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, v + 1)
            else:  # EqualTo
                self.lo = max(self.lo, v)
                self.hi = min(self.hi, v + 1)

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        total = hi - lo
        per = max(1, -(-total // self.n_parts)) if total else 1
        parts = [
            RangePartition(s, min(s + per, hi)) for s in range(lo, hi, per)
        ]
        return parts or [RangePartition(lo, lo)]

    def read(self, partition: RangePartition) -> Iterator[tuple]:
        return gen_rows(partition.start, partition.end)


class SensorStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader: the offset is simply the next row index.
    ``read`` advances by rows_per_batch (bounded by max_rows when set);
    ``readBetweenOffsets`` regenerates any committed range bit-identically
    (deterministic replay — the property Kafka gets from retained logs,
    this source gets from the hash generator)."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 500))
        self.max_rows = int(options.get("max_rows", 0))  # 0 = unbounded
        # fail fast: rows_per_batch <= 0 would return empty batches with an
        # unchanged offset forever — a stream that silently never advances
        if self.rows_per_batch <= 0:
            raise ValueError(f"rows_per_batch must be > 0, got {self.rows_per_batch}")
        if self.max_rows < 0:
            raise ValueError(f"max_rows must be >= 0, got {self.max_rows}")

    def initialOffset(self) -> dict:  # noqa: N802
        return {"offset": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        # iter(list), not a generator: the simple-reader wrapper caches the
        # iterator driver-side AND pickles it to executors — list iterators
        # satisfy both, generators pickle-fail.
        lo = int(start["offset"])
        hi = lo + self.rows_per_batch
        if self.max_rows:
            hi = min(hi, self.max_rows)
        if hi <= lo:
            return iter([]), {"offset": lo}
        return iter(list(gen_rows(lo, hi))), {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:  # noqa: N802
        return iter(list(gen_rows(int(start["offset"]), int(end["offset"]))))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: any range can be regenerated


class SensorReadingsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SensorBatchReader:
        return SensorBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SensorStreamReader:  # noqa: N802
        return SensorStreamReader(self.options)


def register_sensor_source(spark: SparkSession) -> None:
    """Register the source on a session (idempotent). Pickle-by-value so
    executors never need this package importable — required for the
    driver's plain sessions."""
    import masd_spark.sources.pyds as _mod
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(_mod)
    spark.dataSource.register(SensorReadingsDataSource)
