"""Build a non-finite-float twin of a testdata fixture dir.

Third leg of the robustness trilogy (empty fixture -> null fixture ->
THIS): the MEASUREMENT columns — ``events.value`` and the embedding
vectors — get a deterministic sprinkle of NaN, +Inf and -Inf, the values
a 100 TB pipeline actually sees from sensor glitches and
feature-extraction overflow. Business-ledger columns (money, quantity)
are left alone: a NaN price is a schema violation upstream, not an input
an analytics engine must define semantics for.

Injection is stride-keyed on the row index so reruns and both engines
see the identical fixture: row i of events gets value=NaN when i%37==0,
+Inf when i%41==1, -Inf when i%43==2; embedding vectors poison ONE
element (index i % dim) with the cycle NaN/+Inf/-Inf/NULL at i%29==0 —
the NULL arm exercises the three-valued-logic divergence the element
predicates must name explicitly (valid_vectors / _EMB_VALID).

Usage:
    python scripts/make_nonfinite_fixture.py [src_sf_dir] [dst_dir]
    # defaults: /root/testdata/sf0.01 -> /tmp/sf_nonfinite
Then:
    python scripts/parity_sweep.py /tmp/sf_nonfinite
"""

from __future__ import annotations

import math
import os
import shutil
import sys

import pyarrow as pa
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


def poison_events(tab: pa.Table) -> pa.Table:
    vals = tab.column("value").combine_chunks().to_pylist()
    out = []
    for i, v in enumerate(vals):
        if i % 37 == 0:
            out.append(math.nan)
        elif i % 41 == 1:
            out.append(math.inf)
        elif i % 43 == 2:
            out.append(-math.inf)
        else:
            out.append(v)
    idx = tab.column_names.index("value")
    return tab.set_column(idx, "value", pa.array(out, type=pa.float64()))


def poison_embeddings(tab: pa.Table) -> pa.Table:
    vecs = tab.column("embedding").combine_chunks().to_pylist()
    out = []
    for i, vec in enumerate(vecs):
        if vec and i % 29 == 0:
            vec = list(vec)
            j = i % len(vec)
            vec[j] = (math.nan, math.inf, -math.inf, None)[(i // 29) % 4]
        out.append(vec)
    idx = tab.column_names.index("embedding")
    field = tab.schema.field("embedding")
    return tab.set_column(idx, "embedding", pa.array(out, type=field.type))


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_nonfinite"
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        src_path = os.path.join(src, f"{t}.parquet")
        dst_path = os.path.join(dst, f"{t}.parquet")
        if t == "events":
            pq.write_table(poison_events(pq.read_table(src_path)), dst_path)
            print(f"{t}: value column poisoned (NaN/+Inf/-Inf strides)")
        elif t == "embeddings":
            pq.write_table(poison_embeddings(pq.read_table(src_path)), dst_path)
            print(f"{t}: ~3% of vectors carry one non-finite or NULL element")
        else:
            shutil.copyfile(src_path, dst_path)
            print(f"{t}: copied unchanged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
