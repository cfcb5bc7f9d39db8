"""Query registry — the binding between engine operators and the driver's
correctness harness (__spark_entry__.py).

Every implemented operator family registers at least one named query here,
optionally paired with an ANSI-SQL oracle string that DuckDB runs on the
same parquet fixtures. Column names/types are aligned on both sides because
the harness compares (row count, schema, order-insensitive value hash).

Oracle-parity conventions (see tests/oracle.py for the local twin of the
driver's check):
- timestamps are surfaced as epoch-ms BIGINT (``unix_millis`` / DuckDB
  ``epoch_ms``) — never raw TIMESTAMP columns, whose sub-second precision
  differs between engines;
- order-sensitive float aggregates (avg/sum of doubles) are rounded to 6
  decimals on BOTH sides, absorbing last-ULP differences from different
  summation orders; min/max and raw column values stay exact;
- integer sums are CAST(... AS BIGINT) in DuckDB (its SUM widens to
  HUGEINT, Spark's stays LONG);
- every LIMIT/top-k has a total deterministic ordering (unique tiebreaker).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    headline: bool = False  # include in bench.py's per-round benchmark
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, headline: bool = False, doc: str = ""
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from masd_spark.session import ensure_io_confs

            ensure_io_confs(spark)  # driver-provided sessions lack our confs
            return fn(spark, sf_dir)

        REGISTRY[name] = QuerySpec(name, wrapped, oracle, headline, doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY)."""
    from masd_spark.queries import (  # noqa: F401
        masd_core,
        relational,
        text,
        dedup,
        similarity,
        multimodal,
        advanced,
        streaming_q,
        pipeline,
        sampling,
        chunking,
        tpch_extra,
        tpch_full,
        sketches,
        timeseries_q,
        warehouse,
        graph_q,
        analytics,
    )

    return REGISTRY
