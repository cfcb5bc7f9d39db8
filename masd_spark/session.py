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
    # Scan-parallelism FLOOR (optimization r8, guide §6): each fixture
    # table is ONE parquet file (11 MB lineitem, 2 MB events, ...), and
    # with the default 128 MB maxPartitionBytes + 4 MB openCostInBytes
    # every scan planned into 1-3 input splits — single-digit cores doing
    # all scan+map work while 30 sat idle. minPartitionNum only FLOORS parallelism
    # (maxSplitBytes = min(maxPartitionBytes, max(openCost, bytes/N))),
    # so at cluster scale, where bytes/N >> 128 MB, splits stay 128 MB
    # and the setting is a no-op — scale-adaptive by construction, not a
    # local[32] constant. openCostInBytes must drop with it or its 4 MB
    # floor re-caps tiny files at ~3 splits; 64 KB keeps the many-small-
    # files guard (a thousand 1 KB files still pack into few splits)
    # while letting MB-scale fixture files split core-wide. Results are
    # partitioning-independent (fuzzed by scripts/determinism_sweep.py
    # regime B = 256 KB splits, and tests/test_determinism.py).
    "spark.sql.files.minPartitionNum": str(
        int(os.getenv("SPARK_GRAFT_CPUS", "32"))
    ),
    "spark.sql.files.openCostInBytes": str(64 * 1024),
    # AQE post-shuffle coalescing floor (optimization r8, guide §2.2/2.5):
    # coalescePartitions.parallelismFirst already targets default
    # parallelism, but its 1 MB minPartitionSize floor re-coalesces the
    # MB-scale fixture shuffles to 1-3 partitions — the materialized
    # shingle checkpoint came out 3-partitioned and every downstream
    # pair join ran 3 tasks wide (AQE sizes by shuffle BYTES and cannot
    # see a consumer's compute amplification: 5x candidate fan-out, 16
    # md5s/row). 64 KB keeps parallelism-first effective on small inputs;
    # at cluster scale partitions are far above 64 KB and the advisory
    # size governs exactly as before (measured here: capped jaccard pair
    # stage 3.4s -> 1.8s, minhash 2.1s -> 1.1s warm at sf0.1).
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    # Planning-cost cut (optimization r9, guide §7.3 "planning time itself
    # can become the bottleneck"): constraint propagation re-derives
    # inferred constraints over the whole expression tree on every
    # analysis, with cost superlinear in tree width — and this engine's
    # plans are wide (64-column centroid aggregates, k-way HOF argmins,
    # iterative loops that re-plan per round because literals change).
    # Measured (one JVM, on/off/on/off interleave over the 16 slowest
    # registered queries): per-query min lower with it OFF in 13/16,
    # headline q1/q5/asof ~10-25% lower, Lloyd-iteration planning
    # 0.8s -> 0.55s. The rule is semantics-preserving by construction
    # (constraints only ADD redundant filters/prune provably-true ones),
    # so results are identical — it is purely a driver-CPU trade, and
    # driver planning cost does not shrink with cluster size, so the
    # saving carries to 100 TB deployments; flip it back for workloads
    # whose join pruning relies on inferred IsNotNull constraints.
    "spark.sql.constraintPropagation.enabled": "false",
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
