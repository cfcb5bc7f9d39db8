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
    family: str = ""  # defining query module (registry_manifest.json key)


REGISTRY: dict[str, QuerySpec] = {}

# How many queries (in registration order) the driver's CORRECTNESS harness
# actually executes per round. Registration order is therefore a per-round
# *verification window*, rotated deliberately — see load_all().
DRIVER_WINDOW = 50


def register(
    name: str, oracle: str | None = None, headline: bool = False, doc: str = ""
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from masd_spark.session import ensure_io_confs

            ensure_io_confs(spark)  # driver-provided sessions lack our confs
            return fn(spark, sf_dir)

        REGISTRY[name] = QuerySpec(
            name,
            wrapped,
            oracle,
            headline,
            doc or (fn.__doc__ or ""),
            family=fn.__module__.rsplit(".", 1)[-1],
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY).

    Import order IS the driver's verification order: the external
    CORRECTNESS harness executes only the first ``DRIVER_WINDOW`` (50)
    registered queries each round, so this list is rotated per round to
    move never-driver-checked queries into the window.

    Round-4 rotation (openly stated, per VERDICT r3 item 1): ``masd_core``
    stays first (the flagship ``entry()`` query must remain registered and
    its family is the reference's core semantics); then ``similarity``
    (containing the three queries that were RED in round 2 —
    ``ann_lsh_topk``, ``ann_ivf_topk``, ``cluster_kmeans_embeddings`` —
    whose fixes were never driver-confirmed), ``multimodal``, ``advanced``
    and ``tpch_full``, none of which the driver has ever executed.
    Round-3 window occupants ``relational``/``text``/``dedup`` (all green
    in CORRECTNESS_r03.json) rotate to the back; the local oracle twin
    (tests/oracle.py) still value-checks every query regardless of order.
    """
    from masd_spark.queries import (  # noqa: F401
        masd_core,
        similarity,
        multimodal,
        advanced,
        tpch_full,
        warehouse,
        analytics,
        graph_q,
        sketches,
        timeseries_q,
        pipeline,
        sampling,
        chunking,
        streaming_q,
        tpch_extra,
        relational,
        text,
        dedup,
        sql_front,
        pyds_q,
        ann_eval,  # must import after similarity: composes its oracles
    )

    return REGISTRY


def manifest(round_checked: int = DRIVER_WINDOW) -> list[dict]:
    """Registry manifest rows: name, family, oracled?, in driver window?

    Emitted to ``registry_manifest.json`` each round so coverage drift of
    the driver's 50-query window is visible without reverse-engineering
    import order (VERDICT r3 item 8).
    """
    rows = []
    for i, spec in enumerate(load_all().values()):
        rows.append(
            {
                "name": spec.name,
                "family": spec.family,
                "oracled": spec.oracle is not None,
                "headline": spec.headline,
                "position": i,
                "driver_checked_this_round": i < round_checked,
            }
        )
    return rows


def write_manifest(path: str = "registry_manifest.json") -> None:
    import json

    with open(path, "w") as f:
        json.dump(manifest(), f, indent=1)
        f.write("\n")
