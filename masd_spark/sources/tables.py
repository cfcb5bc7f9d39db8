"""Parquet fixture readers with explicit, declared schemas.

The reference declares its one input schema explicitly and never infers
(reference: spark-app/consumer.py:39-45). We keep that discipline for every
fixture table: explicit schemas mean no footer-inference job, stable column
pruning, and a deliberate decision about the one awkward column —
``events.ts``: the fixture has shipped it both as ns-physical parquet and
as µs TIMESTAMP parquet across driver regenerations, so :func:`load_table`
normalizes it to a raw long (nanoseconds since epoch) and every operator
derives times from that one contract (``event_time`` via
:func:`with_event_time`).

At 100 TB these readers change only in path layout (partitioned directories
instead of single files); explicit schemas skip schema-merge jobs across
thousands of files, and Catalyst pushes filters/projections into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # ts is µs-precision naive parquet; declared NTZ, normalized to the
    # package-wide ns-long contract inside load_table (see module docstring).
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


# Physical type of events.ts per fixture file, probed once from the parquet
# footer (metadata-only read — no data pages). Keyed by resolved path so a
# driver regeneration mid-process with a different sf_dir still re-probes.
_EVENTS_TS_PHYSICAL: dict[str, str] = {}


def _events_ts_physical(path: str) -> str:
    """'int64' (ns-since-epoch long) or 'timestamp' (µs naive) — the two
    variants the driver's generator has shipped across regenerations."""
    key = os.path.realpath(path)
    if key not in _EVENTS_TS_PHYSICAL:
        import pyarrow.parquet as pq

        arrow_type = pq.read_schema(path).field("ts").type
        kind = "int64" if str(arrow_type).startswith("int") else "timestamp"
        _EVENTS_TS_PHYSICAL[key] = kind
    return _EVENTS_TS_PHYSICAL[key]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with its declared schema.

    ``events.ts`` is normalized here — and ONLY here — to the package-wide
    contract "``ts`` is nanoseconds-since-epoch as a long". The fixture has
    shipped both as ns-physical-long and as µs TIMESTAMP parquet across
    regenerations, so the parquet FOOTER is probed (metadata-only, once per
    file) and the declared schema + cast branch on the physical type
    actually present; every downstream operator (``ts DIV 1_000_000`` → ms,
    :func:`with_event_time` → µs timestamp) is insulated from the variant
    by this one projection. The cast runs inside whole-stage codegen on
    top of the scan; column pruning still reaches the reader.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events" and _events_ts_physical(path) == "int64":
        schema = T.StructType(
            [
                T.StructField("ts", T.LongType())
                if f.name == "ts"
                else f
                for f in TABLE_SCHEMAS["events"].fields
            ]
        )
        # Already the ns-long contract — no cast needed.
        return spark.read.schema(schema).parquet(path)
    df = spark.read.schema(TABLE_SCHEMAS[name]).parquet(path)
    if name == "events":
        # NTZ → epoch under the session's pinned UTC zone, so the value is
        # the same naive instant DuckDB's epoch_ms/epoch_us read from the
        # identical column.
        df = df.withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
        )
    return df


def with_event_time(events: DataFrame, ts_col: str = "ts", out_col: str = "event_time") -> DataFrame:
    """Derive a microsecond TimestampType column from the ns-long ``ts``.

    Truncation ns->us is integer floor division (``DIV``, never ``/`` —
    double division of ~1.7e18 ns loses the low digits), matching how
    DuckDB narrows the same parquet column to its microsecond TIMESTAMP —
    so both engines see identical event times.
    """
    return events.withColumn(out_col, F.timestamp_micros(F.expr(f"{ts_col} DIV 1000")))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
