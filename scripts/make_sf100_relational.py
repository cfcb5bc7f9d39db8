"""Relational-only SF100 fixture: 10x the SF10 fixture's TPC-H tables +
events, streamed copy-by-copy so peak memory stays ~2x one source table
(600M lineitem / 100M events at the end — pa.concat of 10 copies like
make_sf1_fixture does would need ~50 GB).

SCOPE WARNING — relational probes only: ``documents`` and
``embeddings`` are copied VERBATIM from the source (no md5 re-shuffle /
isometric roll), because the Python-level perturbation is O(minutes per
100k docs) and the SF100 probe only exercises the relational/events
families (q1, rollups, joins, windows, sketches). A verbatim document
copy plants a 10-way near-duplicate clique behind every doc, so NO
dedup/ANN query result on this fixture is meaningful — those families'
scale evidence lives at SF1/SF10, where the content-perturbed fixtures
are valid.

Usage: python scripts/make_sf100_relational.py [src] [dst]
       # defaults: /tmp/masd_sf10 -> /tmp/masd_sf100
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_sf1_fixture import (  # noqa: E402
    COPIES,
    COPY_UNCHANGED,
    KEY_STRIDES,
    _shift_copy,
)

RELATIONAL = ["customer", "orders", "lineitem", "part", "supplier", "events"]
VERBATIM = ["documents", "embeddings"]


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/masd_sf10"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/masd_sf100"
    os.makedirs(dst, exist_ok=True)

    counts = {
        t: pq.read_metadata(os.path.join(src, f"{t}.parquet")).num_rows
        for t in RELATIONAL + COPY_UNCHANGED
    }
    import pyarrow.compute as pc

    users = pq.read_table(os.path.join(src, "events.parquet"), columns=["user_id"])
    counts["__events_users__"] = int(pc.max(users.column("user_id")).as_py()) + 1

    for t in COPY_UNCHANGED + VERBATIM:
        shutil.copyfile(
            os.path.join(src, f"{t}.parquet"), os.path.join(dst, f"{t}.parquet")
        )
        print(f"{t}: copied verbatim", flush=True)

    for t in RELATIONAL:
        base = pq.read_table(os.path.join(src, f"{t}.parquet"))
        strides = {col: counts[ref] for col, ref in KEY_STRIDES[t].items()}
        out_path = os.path.join(dst, f"{t}.parquet")
        writer = pq.ParquetWriter(out_path, base.schema)
        try:
            for c in range(COPIES):
                writer.write_table(_shift_copy(base, strides, c))
        finally:
            writer.close()
        print(
            f"{t}: {base.num_rows} -> {base.num_rows * COPIES} rows, "
            f"strides {strides}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
