"""Third decade of the documents/embeddings ladder: 5M docs / 2M vectors.

VERDICT r7 item 5: the relational ladder reaches SF100 (600M-row
lineitem) but the docs/embeddings evidence stops at SF10 (500k docs).
This tool applies the SAME deterministic 10x upscale recipe as
make_sf1_fixture.py (stacked key-shifted copies; token md5-reshuffle for
documents, np.roll for embeddings — see that module's docstring for why
verbatim copies would be degenerate) to ONLY the two LLM-pipeline tables,
reading /tmp/masd_sf10 and writing /tmp/masd_sf100docs:

    documents   500k -> 5M rows
    embeddings  200k -> 2M rows

The other eight tables are symlinked from the SF10 fixture unchanged —
the doc/emb queries never scan them, but the DuckDB oracle harness
creates views over every fixture table at connect time, so the files
must exist. Copies are written incrementally (one row-group per copy)
so the 5M-doc table never materializes in RAM.

Usage: python scripts/make_sf100_docs.py [src] [dst]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

from make_sf1_fixture import (  # noqa: E402
    COPIES,
    _perturb_documents,
    _perturb_embeddings,
    _shift_copy,
)

SYMLINK_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
]


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/masd_sf10"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/masd_sf100docs"
    os.makedirs(dst, exist_ok=True)

    for t in SYMLINK_TABLES:
        link = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(src, f"{t}.parquet"), link)
        print(f"{t}: symlinked")

    counts = {
        t: pq.read_metadata(os.path.join(src, f"{t}.parquet")).num_rows
        for t in ("documents", "embeddings")
    }
    specs = {
        "documents": ({"doc_id": counts["documents"]}, _perturb_documents),
        "embeddings": ({"vec_id": counts["embeddings"]}, _perturb_embeddings),
    }
    for t, (strides, perturb) in specs.items():
        base = pq.read_table(os.path.join(src, f"{t}.parquet"))
        out = os.path.join(dst, f"{t}.parquet")
        writer = None
        total = 0
        for c in range(COPIES):
            tab = _shift_copy(base, strides, c)
            tab = perturb(tab, c)
            if writer is None:
                writer = pq.ParquetWriter(out, tab.schema)
            writer.write_table(tab)
            total += tab.num_rows
            print(f"{t}: copy {c + 1}/{COPIES} written")
        writer.close()
        print(f"{t}: {base.num_rows} -> {total} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
