"""Python Data Source sensor feed (sources/pyds.py): oracle parity,
deterministic generation, partitioning invariance, filter pushdown, and
streaming offset bookkeeping."""

import hashlib

import pytest

from masd_spark.queries import load_all
from masd_spark.sources.pyds import (
    SOURCE_NAME,
    SensorBatchReader,
    SensorStreamReader,
    gen_row,
    gen_rows,
    register_sensor_source,
)
from tests.conftest import SF_ORACLE
from tests.oracle import compare_query

REGISTRY = load_all()

ORACLE_QUERIES = ["pyds_station_profile", "pyds_filtered_alerts"]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    compare_query(spark, REGISTRY[name], SF_ORACLE)


def test_gen_row_pinned_against_independent_hash():
    """gen_row's contract re-derived from hashlib directly — the same
    derivation the DuckDB oracle performs in SQL."""
    for i in (0, 1, 4999, 19_999):
        h = hashlib.md5(f"pyds:{i}".encode()).hexdigest()
        rid, station, ts_ms, temp, status = gen_row(i)
        assert rid == i
        assert station == f"S{int(h[0], 16) % 8}"
        assert ts_ms == 1_700_000_000_000 + i * 1000
        assert temp == int(h[1:5], 16) - 32768
        assert -32768 <= temp <= 32767
        assert status == ("alert" if int(h[5], 16) < 2 else "ok")


def test_batch_read_partitioning_invariance(spark):
    """The scan's content must not depend on the partition layout, and a
    full read must produce exactly rows [0, n)."""
    register_sensor_source(spark)

    def read(parts):
        return (
            spark.read.format(SOURCE_NAME)
            .option("n", 2000)
            .option("partitions", parts)
            .load()
        )

    a = sorted(map(tuple, read(8).collect()))
    b = sorted(map(tuple, read(3).collect()))
    assert a == b
    assert a == sorted(gen_rows(0, 2000))
    assert read(8).rdd.getNumPartitions() == 8


def test_push_filters_narrow_generated_range():
    """Unit contract of pushFilters: reading_id bounds narrow the range
    (and its planned partitions); everything else is returned unhandled."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        IsNotNull,
        LessThan,
    )

    r = SensorBatchReader({"n": "20000", "partitions": "8"})
    unhandled = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("reading_id",), 5000),
                LessThan(("reading_id",), 8000),
                IsNotNull(("status",)),
                EqualTo(("station",), "S1"),
            ]
        )
    )
    assert (r.lo, r.hi) == (5000, 8000)
    assert {type(f).__name__ for f in unhandled} == {"IsNotNull", "EqualTo"}
    parts = r.partitions()
    assert parts[0].start == 5000 and parts[-1].end == 8000
    assert sum(p.end - p.start for p in parts) == 3000

    # degenerate: contradictory bounds -> empty single partition, no crash
    r2 = SensorBatchReader({"n": "100"})
    list(r2.pushFilters([GreaterThanOrEqual(("reading_id",), 90), LessThan(("reading_id",), 10)]))
    assert sum(p.end - p.start for p in r2.partitions()) == 0


def test_pushdown_visible_in_plan(spark):
    """End-to-end: the range predicates vanish from Spark's residual
    Filter (consumed by the source); the status predicate stays."""
    df = REGISTRY["pyds_filtered_alerts"].fn(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan masd_sensor_readings" in plan, plan
    assert "5000" not in plan and "8000" not in plan, plan
    assert "= alert" in plan or "alert)" in plan, plan


def test_stream_reader_offsets_and_replay():
    """Offset bookkeeping is pure arithmetic: read() advances by
    rows_per_batch, clamps at max_rows, and readBetweenOffsets replays
    any committed range bit-identically."""
    r = SensorStreamReader({"rows_per_batch": "300", "max_rows": "1000"})
    assert r.initialOffset() == {"offset": 0}
    off, seen = {"offset": 0}, []
    for _ in range(10):
        it, off2 = r.read(off)
        rows = list(it)
        if not rows:
            assert off2 == off
            break
        seen.extend(rows)
        off = off2
    assert off == {"offset": 1000}
    assert seen == list(gen_rows(0, 1000))
    assert list(r.readBetweenOffsets({"offset": 300}, {"offset": 600})) == list(
        gen_rows(300, 600)
    )


def test_stream_reader_rejects_non_advancing_config():
    """rows_per_batch=0 would loop forever returning empty batches with an
    unchanged offset; the reader must fail fast at construction instead."""
    import pytest

    for bad in ({"rows_per_batch": "0"}, {"rows_per_batch": "-5"}):
        with pytest.raises(ValueError, match="rows_per_batch"):
            SensorStreamReader(bad)
    with pytest.raises(ValueError, match="max_rows"):
        SensorStreamReader({"rows_per_batch": "10", "max_rows": "-1"})


def test_streaming_end_to_end_memory_sink(spark, tmp_path):
    """The feed through readStream: micro-batches drain into a memory
    sink; after processAllAvailable the sink holds exactly rows
    [0, max_rows) — exactly-once across whatever batch boundaries the
    engine chose."""
    register_sensor_source(spark)
    stream = (
        spark.readStream.format(SOURCE_NAME)
        .option("rows_per_batch", "300")
        .option("max_rows", "1000")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_feed")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(map(tuple, spark.sql("SELECT * FROM pyds_feed").collect()))
    assert got == sorted(gen_rows(0, 1000))
