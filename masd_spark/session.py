"""SparkSession construction and session-level configs.

The reference builds a bare session with only Mongo connector configs
(reference: spark-app/consumer.py:55-64). Our engine pins the configs that
matter for correctness parity (UTC timezone, ns-timestamp handling) and for
scale (AQE, skew-join handling, shuffle partitioning).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that must hold on ANY session running our queries, including a
# driver-provided session we did not build. All of these are runtime-settable.
RUNTIME_CONFS: dict[str, str] = {
    # fixture `events.ts` is ns-precision parquet; Spark 4 refuses
    # TIMESTAMP(NANOS) columns unless read as raw long (we convert ourselves,
    # see sources/tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # DuckDB oracle timestamps are UTC-naive; pin the session to UTC.
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-planning: partition coalescing, skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # A driver-provided session keeps Spark's default 200 shuffle
    # partitions — wrong for both this 32-core box and the fixture sizes.
    "spark.sql.shuffle.partitions": "32",
    # The Python Data Source sensor feed (sources/pyds.py) implements
    # pushFilters(); Spark refuses a reader that implements it while this
    # flag (default false in 4.1) is off.
    "spark.sql.python.filterPushdown.enabled": "true",
    # Recursive CTEs (queries/sql_front.py hierarchy walks) emit O(rows *
    # depth) intermediate rows; the 4.1 default ceiling of 1M rows trips
    # around SF1 on the customer-digit walk. 100M keeps the guard (runaway
    # recursion still errors) with ~100x headroom.
    "spark.sql.cteRecursionRowLimit": "100000000",
    # Plan strings truncate each scan-metadata entry (PushedFilters,
    # ReadSchema, Location) at 100 chars with a '...' and no closing
    # bracket; the plan-shape assertions (plans/explain.py) parse those
    # brackets, and a 3-term pushed-filter list already overflows 100.
    "spark.sql.maxMetadataStringLength": "2000",
}


def ensure_io_confs(spark: SparkSession) -> SparkSession:
    """Apply RUNTIME_CONFS to an existing session (e.g. the driver's)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build; builder path sets it instead
    return spark


def get_spark(
    app_name: str = "masd-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a session tuned for local[N] testing.

    On a real cluster the same code runs unchanged; only master/memory/
    shuffle-partition sizing comes from the environment
    (``SPARK_GRAFT_CPUS`` mirrors the driver's bench environment).
    """
    # Must precede JVM launch: local-mode Python workers inherit PYTHONPATH
    # from the JVM's environment, which copies this process's at context
    # start — the vendored protobuf fallback (TWS state protocol) rides it.
    from masd_spark.vendor import ensure_protobuf

    ensure_protobuf()

    cpus = int(os.getenv("SPARK_GRAFT_CPUS", "32"))
    master = master or os.getenv("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    driver_memory = driver_memory or os.getenv("MASD_DRIVER_MEMORY", "16g")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    # Local-mode only: shuffle/spill files on tmpfs dodge this host's
    # erratic block-device latency (observed multi-second stalls on tiny
    # shuffles). On a real cluster spark.local.dir is per-node SSD instead.
    local_dir = os.getenv("SPARK_LOCAL_DIRS")
    if local_dir is None and master.startswith("local") and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/masd-spark-local"
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # getOrCreate() may have returned a pre-existing session -> re-assert.
    return ensure_io_confs(spark)
