"""Local twin of the driver's DuckDB-oracle correctness check.

Runs a registered Spark query and its oracle SQL on the same fixture dir,
then compares (row count, column names, order-insensitive multiset of
values). Stricter than a hash: on mismatch it reports sample differing rows.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from masd_spark.queries import QuerySpec
from masd_spark.sources.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # duckdb's progress bar writes \r-terminated fragments to stdout on
    # slow queries; subprocess harnesses (test_local_cluster) parse stdout
    # line-markers, and a bar fragment left before the marker breaks them
    con.execute("SET enable_progress_bar=false")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    """Canonicalize one value for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr is shortest-roundtrip: bit-exact doubles compare equal,
        # anything else shows up as a readable diff.
        return repr(v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    def sort_key(row):
        return tuple((v is None, str(type(v)), str(v)) for v in row)

    out = sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows), key=sort_key
    )
    return names, out


def compare_query(spark, spec: QuerySpec, sf_dir: str, max_diff: int = 5) -> None:
    assert spec.oracle is not None, f"{spec.name} has no oracle"
    sdf = spec.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    try:
        cur = con.execute(spec.oracle)
        o_cols = [d[0] for d in cur.description]
        o_rows = cur.fetchall()
    finally:
        con.close()

    s_names, s_norm = _normalize(s_cols, s_rows)
    o_names, o_norm = _normalize(o_cols, o_rows)

    assert s_names == o_names, f"{spec.name}: column mismatch {s_names} vs {o_names}"
    assert len(s_norm) == len(o_norm), (
        f"{spec.name}: row count {len(s_norm)} (spark) vs {len(o_norm)} (oracle)"
    )
    if s_norm != o_norm:
        s_set, o_set = set(s_norm), set(o_norm)
        only_s = list(s_set - o_set)[:max_diff]
        only_o = list(o_set - s_set)[:max_diff]
        raise AssertionError(
            f"{spec.name}: value mismatch (cols={s_names})\n"
            f"  spark-only rows: {only_s}\n  oracle-only rows: {only_o}"
        )
