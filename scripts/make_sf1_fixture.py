"""Deterministic 10x upscale of the sf0.1 fixture to an SF1-sized one.

Why: every committed parity sweep tops out at sf0.1 (10x the driver's
correctness gate), and round 5 proved that scale-only bugs exist — the
recursive-CTE 1M-row ceiling binds around SF1, invisible below it. This
tool builds a ~6M-row-lineitem fixture locally so the cap-sensitive
families (dedup shingle/band caps, ANN bucket occupancy, graph
iteration, recursive CTE) can be parity-swept and benched at 10x the
largest committed evidence.

How (RNG-free, rerun-identical): each scaled table is 10 stacked copies
of the sf0.1 original with keys shifted by copy * stride, where stride =
the table's row count (keys are dense 0..N-1), so every foreign key
stays valid within its copy and copies never collide:

  customer  +c*15000          orders    o_orderkey +c*150000, o_custkey +c*15000
  part      +c*20000          lineitem  l_orderkey +c*150000, l_partkey +c*20000,
  supplier  +c*1000                     l_suppkey  +c*1000
  events    event_id +c*100000, user_id +c*1500
  documents doc_id +c*5000    embeddings vec_id +c*2000

region/nation stay as-is (fixed-size dims at every TPC-H SF).

Content columns are re-sampled deterministically, NOT copied verbatim —
a verbatim copy plants a 10-way near-duplicate clique behind every
document (first fixture attempt; it made every dedup family's pair
structure degenerate). The native generator emits random token
sequences over a ~31-word vocabulary and random vectors, so a
distribution-equivalent fresh sample is cheap to synthesize from the
original rows:

- documents, copies c>0: tokens md5-shuffled within each doc
  (sort key md5("c:doc_id:pos:tok")) and re-joined with single spaces;
  token multiset, length regime, lang/source mix are preserved, the
  shingle SET is re-dealt; n_chars recomputed. Cross-copy exact/near
  duplication drops to chance level — but shingle document frequency
  still grows ~linearly with the corpus (the trigram space over 31
  tokens is saturated), which is the scale property the probe exists
  to exercise.
- embeddings, copies c>0: every vector np.roll'ed by c positions —
  intra-copy dots/norms/cosines are EXACTLY preserved (each copy is an
  isometric replica of the corpus geometry, same neighbor density), and
  cross-copy cosines decorrelate.

Usage:
    python scripts/make_sf1_fixture.py [src_sf_dir] [dst_dir]
    # defaults: /root/testdata/sf0.1 -> /tmp/masd_sf1
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPIES = 10

# per-table: {column: stride-source-table}; stride = row count of that table
KEY_STRIDES = {
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "__events_users__"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
COPY_UNCHANGED = ["region", "nation"]


def _shift_copy(tab: pa.Table, strides: dict[str, int], c: int) -> pa.Table:
    for col, stride in strides.items():
        idx = tab.column_names.index(col)
        arr = tab.column(idx)
        typ = tab.schema.field(col).type
        shifted = pc.cast(pc.add(arr, pa.scalar(c * stride, type=typ)), typ)
        tab = tab.set_column(idx, tab.schema.field(col), shifted)
    return tab


def _perturb_documents(tab: pa.Table, c: int) -> pa.Table:
    if c == 0:
        return tab
    import hashlib

    doc_ids = tab.column("doc_id").to_pylist()
    texts = tab.column("text").to_pylist()
    out = []
    for did, text in zip(doc_ids, texts):
        if text is None:
            out.append(text)
            continue
        toks = text.lower().strip().split()
        keyed = sorted(
            (hashlib.md5(f"{c}:{did}:{i}:{t}".encode()).hexdigest(), t)
            for i, t in enumerate(toks)
        )
        out.append(" ".join(t for _, t in keyed))
    text_arr = pa.array(out, type=tab.schema.field("text").type)
    tab = tab.set_column(
        tab.column_names.index("text"), tab.schema.field("text"), text_arr
    )
    n_chars = pc.cast(pc.utf8_length(text_arr), tab.schema.field("n_chars").type)
    return tab.set_column(
        tab.column_names.index("n_chars"), tab.schema.field("n_chars"), n_chars
    )


def _perturb_embeddings(tab: pa.Table, c: int) -> pa.Table:
    if c == 0:
        return tab
    import numpy as np

    vecs = tab.column("embedding").to_pylist()
    out = [
        None if vec is None else [float(x) for x in np.roll(vec, c)]
        for vec in vecs
    ]
    idx = tab.column_names.index("embedding")
    field = tab.schema.field("embedding")
    return tab.set_column(idx, field, pa.array(out, type=field.type))


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/masd_sf1"
    os.makedirs(dst, exist_ok=True)

    counts = {
        t: pq.read_metadata(os.path.join(src, f"{t}.parquet")).num_rows
        for t in list(KEY_STRIDES) + COPY_UNCHANGED
    }
    # events.user_id spans 0..n_users-1, a tenth of the customer range;
    # its stride is the OBSERVED id span, not the events row count
    users = pq.read_table(os.path.join(src, "events.parquet"), columns=["user_id"])
    counts["__events_users__"] = int(pc.max(users.column("user_id")).as_py()) + 1

    for t in COPY_UNCHANGED:
        shutil.copyfile(
            os.path.join(src, f"{t}.parquet"), os.path.join(dst, f"{t}.parquet")
        )
        print(f"{t}: copied unchanged ({counts[t]} rows)")

    for t, stride_spec in KEY_STRIDES.items():
        base = pq.read_table(os.path.join(src, f"{t}.parquet"))
        strides = {col: counts[ref] for col, ref in stride_spec.items()}
        parts = []
        for c in range(COPIES):
            tab = _shift_copy(base, strides, c)
            if t == "documents":
                tab = _perturb_documents(tab, c)
            elif t == "embeddings":
                tab = _perturb_embeddings(tab, c)
            parts.append(tab)
        big = pa.concat_tables(parts)
        pq.write_table(big, os.path.join(dst, f"{t}.parquet"))
        print(f"{t}: {base.num_rows} -> {big.num_rows} rows, strides {strides}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
