"""Build a null-sprinkled twin of a testdata fixture dir.

Robustness complement of the empty-fixture sweep: every column of every
table gets a deterministic ~10% of its values REPLACED WITH NULL
(row_index + column_index stride, so reruns and both engines see the
identical fixture). Null keys, null timestamps, null embedding vectors,
null document text — the dirty-lakehouse inputs a 100 TB pipeline sees
daily — must degrade to fewer rows, never to a job abort or a
cross-engine value divergence.

Usage:
    python scripts/make_null_fixture.py [src_sf_dir] [dst_dir]
    # defaults: /root/testdata/sf0.01 -> /tmp/sf_nulls
Then:
    python scripts/parity_sweep.py /tmp/sf_nulls
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = [
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

STRIDE = 10  # 1-in-10 values per column -> NULL


def null_sprinkle(table: pa.Table) -> pa.Table:
    n = table.num_rows
    cols = []
    for ci, name in enumerate(table.column_names):
        col = table.column(name).combine_chunks()
        # deterministic per-(row, column) mask; column offset staggers the
        # nulls so no row loses every field and no field loses whole rows
        mask = pa.array([(i + ci) % STRIDE == 0 for i in range(n)])
        typ = table.schema.field(name).type
        nulls = pa.nulls(n, type=typ)
        cols.append(pc.if_else(mask, nulls, col))
    return pa.table(cols, schema=pa.schema(
        [pa.field(f.name, f.type, nullable=True) for f in table.schema]
    ))


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_nulls"
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tab = pq.read_table(os.path.join(src, f"{t}.parquet"))
        out = null_sprinkle(tab)
        pq.write_table(out, os.path.join(dst, f"{t}.parquet"))
        print(f"{t}: {out.num_rows} rows, nulls sprinkled in "
              f"{out.num_columns} columns")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
