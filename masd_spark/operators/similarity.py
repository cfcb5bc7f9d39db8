"""Similarity search over embedding columns (array<float>).

Two paths:

- brute_force_topk: exact top-k cosine for a (small) query set against the
  full corpus. Queries are broadcast; the corpus is scanned once; the
  top-k per query is a TakeOrdered-style window, so no all-pairs shuffle
  materializes. Exact baseline and the oracle-checkable ground truth.
- lsh_topk: random-hyperplane LSH — sign-bit bucket per vector, candidates
  share a bucket (optionally within Hamming-adjacent buckets), exact
  cosine re-rank of candidates. The 100 TB path: bucket cardinality
  bounds the join, never corpus x queries. Recall is approximate;
  measured against brute force in tests.
- embedding near-dup pairs: all pairs with cosine >= threshold via
  bucketed self-join (brute force at fixture scale, LSH-bucketed at real
  scale).

All vector math uses built-in higher-order functions (functions/vectors.py)
in double precision — no UDFs, no Python row path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from masd_spark.operators.skew import drop_overfull_buckets
from masd_spark.functions.vectors import (
    cosine,
    cosine_fixed,
    dot,
    dot_fixed,
    dot_literal,
    lit_double_matrix,
    lit_doubles,
    norm,
    norm_fixed,
)


def valid_vectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Invalid-input contract for the embedding family: a row with a null
    id, a null vector, or a vector carrying ANY non-finite element
    (NaN/Inf from upstream feature-extraction overflow) cannot be
    indexed, bucketed, sampled, or returned as a neighbor — it is
    EXCLUDED up front on every path (corpus, query, and index-build
    sample alike). A no-op scan filter on clean data; on dirty data it
    (a) keeps the md5-ordered portable samples identical across engines
    (null ids hash to NULL and the engines disagree on NULL sort order),
    (b) keeps null vectors out of driver-side ``float()`` literal
    builds, and (c) keeps NaN/Inf out of distances, quantizers, Gram
    sums, and centroid means, where one poisoned element otherwise
    aborts ANSI integer casts or propagates NaN into every aggregate it
    touches. The oracle twin is queries/__init__.py:valid_embeddings.

    The element predicate is null-explicit (``x.isNull() | isnan | inf``):
    without the isNull arm, Spark's three-valued logic makes ``~exists``
    evaluate to NULL for a vector holding a NULL element (row dropped,
    but by NULL-propagation accident), while DuckDB's lambda treats the
    NULL predicate as false (row kept) — the engines would diverge on
    exactly that dirty shape. Both sides now name the case: a NULL
    element is invalid input, same as NaN/Inf."""
    finite = ~F.exists(
        F.col(vec_col),
        lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == F.lit(float("inf"))),
    )
    return df.filter(
        F.col(id_col).isNotNull() & F.col(vec_col).isNotNull() & finite
    )


# Escape hatch for the equality pin (tests/test_similarity.py): False
# routes brute_force_topk's fixed-dim path back to the pure-JVM HOF
# join, the reference the Arrow kernel must match row-for-row.
_ARROW_TOPK = True


def _bf_arrow_kernel(q_groups, q_mismatch, k, qid_pa_type):
    """Build the mapInArrow function for :func:`brute_force_topk`'s
    vectorized path. Bit-exactness contract (why this is NOT a plain
    matmul): the JVM HOF pipeline computes, per pair, a 0.0-seeded LEFT
    FOLD of per-element double products, norms as the same fold of
    squares, then ``dot / (q_norm * corpus_norm)``. Reassociating the
    sums (``numpy.dot``/BLAS use pairwise/SIMD accumulation) changes the
    last ulp, and ranking happens on values ROUNDED to 6 decimals — a
    boundary flip would change emitted rows. So the kernel accumulates
    COLUMN-STEPPED: ``acc += C[:, j] * Q[:, j]`` for j ascending — one
    IEEE product + one IEEE add per element in exactly the fold's order,
    vectorized ACROSS pairs instead of within one — and computes the
    denominator as the same ``qn * cn`` product. Every emitted cosine is
    bit-identical to the HOF expression's.

    ``q_groups``: {length L: (list[(row_idx, qid)], Q float64 matrix
    (nq x L), qn float64 vector)}; ``q_mismatch``: all (qid, length)
    pairs — corpus rows whose length differs from a query's produce a
    NULL cosine in the JVM form (zip_with pads with nulls), so those
    pairs are emitted with a null score rather than dropped.

    Per (query, batch), only rows that can reach the global top-k
    survive: with key = cosine (NaN -> +inf, matching Spark's
    NaN-greatest ordering), any row in the global ROUNDED top-k has
    key >= (k-th largest batch key) - 1e-6, since rounding moves a
    value by < 5e-7 each side — the batch emits that superset and the
    downstream JVM round+rank reproduces the exact original ordering.
    """

    def kernel(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ids_pa = batch.column(0)
            vecs = batch.column(1)
            lengths = pc.list_value_length(vecs).to_numpy(
                zero_copy_only=False
            )
            flat = vecs.flatten().to_numpy(zero_copy_only=False)
            starts = np.concatenate(([0], np.cumsum(lengths)))
            ids_np = ids_pa.to_numpy(zero_copy_only=False)
            out_qid: list = []
            out_idx: list[int] = []
            out_cos: list = []
            for length, (qids, qmat, qn) in q_groups.items():
                rows = np.nonzero(lengths == length)[0]
                if rows.size == 0:
                    continue
                # gather the group's rows into an (n_rows x L) matrix
                idx = (
                    starts[rows][:, None] + np.arange(length)[None, :]
                ).ravel()
                cmat = flat[idx].astype(np.float64).reshape(
                    rows.size, length
                )
                # left-fold norms and dots, column-stepped (see docstring)
                cacc = np.zeros(rows.size)
                for j in range(length):
                    cj = cmat[:, j]
                    cacc = cacc + cj * cj
                cn = np.sqrt(cacc)
                dots = np.zeros((rows.size, len(qids)))
                for j in range(length):
                    dots = dots + cmat[:, j][:, None] * qmat[:, j][None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = dots / (qn[None, :] * cn[:, None])
                key = np.where(np.isnan(cos), np.inf, cos)
                for qi, (_, qid) in enumerate(qids):
                    col_key = key[:, qi]
                    keep = ids_np[rows] != qid  # self-pair exclusion
                    cand = np.nonzero(keep)[0]
                    if cand.size > k:
                        kth = np.partition(col_key[cand], cand.size - k)[
                            cand.size - k
                        ]
                        cand = cand[col_key[cand] >= kth - 1e-6]
                    for ci in cand:
                        out_qid.append(qid)
                        out_idx.append(int(rows[ci]))
                        out_cos.append(float(cos[ci, qi]))
            # JVM zip_with pads length-mismatched pairs to NULL cosine —
            # emit those pairs (none on well-formed fixtures)
            for qid, qlen in q_mismatch:
                for ri in np.nonzero(lengths != qlen)[0]:
                    if ids_np[ri] != qid:
                        out_qid.append(qid)
                        out_idx.append(int(ri))
                        out_cos.append(None)
            if not out_idx:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_qid, type=qid_pa_type),
                    ids_pa.take(pa.array(out_idx, type=pa.int64())),
                    pa.array(out_cos, type=pa.float64()),
                ],
                names=["__qid", "__cid", "__cos"],
            )

    return kernel


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    ``queries`` must be small enough to broadcast (the ``dim=None`` path
    hints it; the vectorized path collects it — same size contract);
    ranking uses (rounded cosine desc, id asc) — a total order, so
    results are deterministic and engine-portable.

    Optimization r8 (guide §4.2): with ``dim`` set, the scoring runs as
    one ``mapInArrow`` over the corpus scan — whole Arrow batches handed
    to a NumPy kernel that reproduces the JVM HOF fold BIT-EXACTLY (see
    :func:`_bf_arrow_kernel`) and emits, per batch, only the rows that
    can reach the global top-k. The JVM then rounds and ranks that
    candidate superset with the identical window, so emitted rows are
    unchanged (equality with the HOF path pinned by test). Measured at
    sf0.1 (10k vectors x 100 queries): 1.0s -> ~0.3s warm, and the
    per-pair zip_with allocation disappears from the hot path. The
    ``dim=None`` path keeps the pure-JVM HOF shape.
    """
    corpus = valid_vectors(corpus, id_col, vec_col)
    queries = valid_vectors(queries, query_id_col, vec_col)
    if dim is not None and _ARROW_TOPK:
        import numpy as np

        from pyspark.sql import types as T

        qtab = queries.select(query_id_col, vec_col).toArrow()
        qid_pa_type = qtab.schema.field(0).type
        q_rows = [
            (i, qtab.column(0)[i].as_py(), qtab.column(1)[i].as_py())
            for i in range(qtab.num_rows)
        ]
        q_groups: dict = {}
        for i, qid, vec in q_rows:
            q_groups.setdefault(len(vec), []).append((i, qid, vec))
        packed = {}
        for length, rows in q_groups.items():
            qmat = np.array([v for _, _, v in rows], dtype=np.float64)
            qacc = np.zeros(len(rows))
            for j in range(length):
                qj = qmat[:, j]
                qacc = qacc + qj * qj
            packed[length] = (
                [(i, qid) for i, qid, _ in rows],
                qmat,
                np.sqrt(qacc),
            )
        q_mismatch = [(qid, len(vec)) for _, qid, vec in q_rows]
        corpus_id_type = corpus.schema[id_col].dataType
        qid_spark_type = queries.schema[query_id_col].dataType
        out_schema = T.StructType(
            [
                T.StructField("__qid", qid_spark_type),
                T.StructField("__cid", corpus_id_type),
                T.StructField("__cos", T.DoubleType()),
            ]
        )
        scored = (
            corpus.select(F.col(id_col), F.col(vec_col))
            .mapInArrow(
                _bf_arrow_kernel(packed, q_mismatch, k, qid_pa_type),
                out_schema,
            )
            .select(
                F.col("__qid").alias(query_id_col),
                F.col("__cid").alias(id_col),
                F.round(F.col("__cos"), 6).alias("cos_sim"),
            )
        )
        w = Window.partitionBy(query_id_col).orderBy(
            F.col("cos_sim").desc(), F.col(id_col)
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                query_id_col,
                id_col,
                "cos_sim",
                F.col("rank").cast("bigint").alias("rank"),
            )
        )
    if dim is None:
        q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
        pairs = corpus.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col))
        scored = pairs.select(
            query_id_col,
            id_col,
            F.round(cosine(F.col("_qvec"), F.col(vec_col)), 6).alias("cos_sim"),
        )
    else:
        q = queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qvec"),
            norm_fixed(F.col(vec_col), dim).alias("_qn"),
        )
        c = corpus.select(
            F.col(id_col),
            F.col(vec_col),
            norm_fixed(F.col(vec_col), dim).alias("_cn"),
        )
        pairs = c.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col))
        scored = pairs.select(
            query_id_col,
            id_col,
            F.round(
                dot_fixed(F.col("_qvec"), F.col(vec_col), dim)
                / (F.col("_qn") * F.col("_cn")),
                6,
            ).alias("cos_sim"),
        )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            "cos_sim",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


# Escape hatch for the equality pin (tests/test_similarity.py): False
# routes cosine_pairs back to the pure-JVM theta-join reference.
_ARROW_PAIRS = True
# Driver-memory guard for the vectorized all-pairs path: the corpus is
# collected once and closed over (like brute_force_topk's query set).
# Aligned with queries/dedup.py:_SEMDEDUP_VERIFY_CAP — the largest corpus
# any registered all-pairs ground truth accepts.
_ARROW_PAIRS_MAX = 500_000


def _integral_id_type(df: DataFrame, id_col: str) -> bool:
    from pyspark.sql import types as T

    return isinstance(
        df.schema[id_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    )


def _length_grouped(ids_pa, vecs_pa):
    """Split an Arrow (ids, list<float>) pair into per-length float64
    matrices via the flattened values buffer — no per-row as_py loop.
    Returns {L: (ids int64 (m,), C float64 (m x L))}."""
    import numpy as np
    import pyarrow.compute as pc

    ids = ids_pa.to_numpy(zero_copy_only=False).astype(np.int64)
    lengths = pc.list_value_length(vecs_pa).to_numpy(zero_copy_only=False)
    flat = vecs_pa.flatten().to_numpy(zero_copy_only=False)
    starts = np.concatenate(([0], np.cumsum(lengths)))
    out = {}
    for length in np.unique(lengths):
        rows = np.nonzero(lengths == length)[0]
        if length == 0:
            out[0] = (ids[rows], np.zeros((rows.size, 0)))
            continue
        idx = (starts[rows][:, None] + np.arange(length)[None, :]).ravel()
        cmat = flat[idx].astype(np.float64).reshape(rows.size, int(length))
        out[int(length)] = (ids[rows], cmat)
    return out


def _fold_norms(cmat):
    """Column-stepped left-fold norms — the zip_with/aggregate order."""
    import numpy as np

    acc = np.zeros(cmat.shape[0])
    for j in range(cmat.shape[1]):
        cj = cmat[:, j]
        acc = acc + cj * cj
    return np.sqrt(acc)


def _pairs_corpus_groups(tab):
    """Group a collected (id, vec[, bucket]) Arrow table into {(bucket,
    length): (ids int64, C float64 (m x L), cn float64)} with the same
    column-stepped left-fold norms the JVM expression computes. With no
    bucket column every row lands in bucket 0 (the all-pairs case); a
    third column restricts pairing to equal buckets (semantic_dedup's
    cluster equi-join). Raises on a zero-norm vector whenever the JVM
    reference would score a pair against it — i.e. its (bucket, length)
    group holds >= 2 rows, so the unguarded dot / (na * nb) division
    aborts with DIVIDE_BY_ZERO under ANSI on that corpus shape.
    (A zero-norm row whose group is a singleton pairs only across
    lengths, where zip_with pads the dot to NULL and no division error
    can fire — such corpora keep their JVM behavior: no pairs.)"""
    import numpy as np
    import pyarrow as pa

    ids_pa = tab.column(0).combine_chunks()
    vecs_pa = tab.column(1).combine_chunks()
    if tab.num_columns > 2:
        buckets = (
            tab.column(2)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
    else:
        buckets = np.zeros(tab.num_rows, dtype=np.int64)

    groups = {}
    for bkt in np.unique(buckets):
        rows = np.nonzero(buckets == bkt)[0]
        idx = pa.array(rows)
        for length, (gids, cmat) in _length_grouped(
            ids_pa.take(idx), vecs_pa.take(idx)
        ).items():
            cn = _fold_norms(cmat)
            if gids.size >= 2 and np.any(cn == 0.0):
                raise ValueError(
                    "cosine pair scoring: zero-norm vector in a pairing "
                    "group with >= 2 rows — the JVM reference divides by "
                    "(na * nb) and aborts with DIVIDE_BY_ZERO under "
                    "ANSI; no vectorized behavior can match it. Drop "
                    "zero vectors upstream."
                )
            groups[(int(bkt), length)] = (gids, cmat, cn)
    return groups


def _pairs_arrow_kernel(groups, threshold: float):
    """mapInArrow function for :func:`cosine_pairs`' vectorized path.
    Same bit-exactness contract as :func:`_bf_arrow_kernel`: dots and
    norms are COLUMN-STEPPED left folds (one IEEE product + add per
    element, ascending index — the zip_with/aggregate order), the
    denominator is the same ``na * nb`` product, and ranking decisions
    stay in the JVM — the kernel emits the RAW cosine for every pair
    whose raw value clears ``threshold - 1e-6`` (round(x, 6) moves a
    value < 5e-7, so the emitted set is a superset of the rounded
    survivors) and the downstream JVM round+filter reproduces the exact
    original rows. Pairs of mismatched lengths are never emitted: the
    JVM's zip_with pads them to a NULL dot, and ``NULL >= threshold``
    drops the row. An optional third input column restricts pairing to
    equal bucket values (the cluster equi-join of semantic_dedup); with
    two columns everything is one bucket (the all-pairs theta-join).
    Each unordered pair is emitted exactly once, by the task whose input
    batch holds the smaller id."""

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        cut = threshold - 1e-6
        for batch in batches:
            if batch.num_rows == 0:
                continue
            out_a: list = []
            out_b: list = []
            out_cos: list = []
            ids_pa, vecs_pa = batch.column(0), batch.column(1)
            if batch.num_columns > 2:
                bkts = (
                    batch.column(2)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
            else:
                bkts = np.zeros(batch.num_rows, dtype=np.int64)
            for bkt in np.unique(bkts):
                brows = pa.array(np.nonzero(bkts == bkt)[0])
                for length, (bids, bmat) in _length_grouped(
                    ids_pa.take(brows), vecs_pa.take(brows)
                ).items():
                    key = (int(bkt), length)
                    if key not in groups:
                        continue
                    cids, cmat, cn = groups[key]
                    bn = _fold_norms(bmat)
                    # tile the corpus side to bound the (r x m) temporaries
                    for lo in range(0, len(cids), 4096):
                        hi = min(lo + 4096, len(cids))
                        ctile = cmat[lo:hi]
                        dots = np.zeros((bmat.shape[0], hi - lo))
                        for j in range(length):
                            dots = (
                                dots
                                + bmat[:, j][:, None] * ctile[:, j][None, :]
                            )
                        with np.errstate(divide="ignore", invalid="ignore"):
                            cos = dots / (bn[:, None] * cn[lo:hi][None, :])
                            keep = (cos >= cut) & (
                                bids[:, None] < cids[lo:hi][None, :]
                            )
                        ri, ci = np.nonzero(keep)
                        if ri.size:
                            out_a.extend(bids[ri].tolist())
                            out_b.extend(cids[lo:hi][ci].tolist())
                            out_cos.extend(cos[ri, ci].tolist())
            if out_a:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(out_a, type=pa.int64()),
                        pa.array(out_b, type=pa.int64()),
                        pa.array(out_cos, type=pa.float64()),
                    ],
                    names=["__ida", "__idb", "__cos"],
                )

    return kernel


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — embedding near-dup.

    Fixture-scale implementation is the exact self-join; at corpus scale
    wrap it with LSH buckets (``lsh_bucket``) so the self-join happens
    per-bucket. Norms are precomputed once per row; the per-pair dot is
    the compact HOF fold (functions/vectors.py documents the measurement
    that retired the unrolled variant).

    Optimization r8 (guide §4.2): with ``dim`` set and an integral id
    column, the O(n^2) scoring runs as one ``mapInArrow`` over the
    corpus scan — the collected corpus (like brute_force_topk's query
    set; guarded by ``_ARROW_PAIRS_MAX``) is closed over, each task
    scores its scan slice against it with the bit-exact column-stepped
    NumPy fold (:func:`_pairs_arrow_kernel`), and the JVM re-applies the
    identical round+threshold so emitted rows are unchanged (equality
    with the theta-join pinned by test). The theta-join reference plan
    is kept for non-integral ids and oversized corpora.
    """
    df = valid_vectors(df, id_col, vec_col)
    if dim is not None and _ARROW_PAIRS and _integral_id_type(df, id_col):
        from pyspark.sql import types as T

        narrow = df.select(F.col(id_col), F.col(vec_col))
        tab = narrow.toArrow()
        if tab.num_rows <= _ARROW_PAIRS_MAX:
            groups = _pairs_corpus_groups(tab)
            id_type = df.schema[id_col].dataType
            out_schema = T.StructType(
                [
                    T.StructField("__ida", T.LongType()),
                    T.StructField("__idb", T.LongType()),
                    T.StructField("__cos", T.DoubleType()),
                ]
            )
            scored = narrow.mapInArrow(
                _pairs_arrow_kernel(groups, threshold), out_schema
            ).select(
                F.col("__ida").cast(id_type).alias("id_a"),
                F.col("__idb").cast(id_type).alias("id_b"),
                F.round(F.col("__cos"), 6).alias("cos_sim"),
            )
            return scored.filter(F.col("cos_sim") >= threshold)
    norm_expr = (
        norm(F.col(vec_col)) if dim is None else norm_fixed(F.col(vec_col), dim)
    )
    with_norm = df.select(F.col(id_col), F.col(vec_col), norm_expr.alias("_n"))
    a = with_norm.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), F.col("_n").alias("_na")
    )
    b = with_norm.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), F.col("_n").alias("_nb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    dot_expr = (
        dot(F.col("_va"), F.col("_vb"))
        if dim is None
        else dot_fixed(F.col("_va"), F.col("_vb"), dim)
    )
    scored = pairs.select(
        "id_a",
        "id_b",
        F.round(dot_expr / (F.col("_na") * F.col("_nb")), 6).alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= threshold)


def cosine_pairs_bucketed(
    df: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs via OR-amplified random-hyperplane LSH —
    the corpus-scale replacement for ``cosine_pairs``'s all-pairs join.

    Plan: each vector gets ``n_tables`` sign-bit bucket ids (map-side
    expression, plane literals constant-folded — no side table, no extra
    scan); candidates are pairs sharing a (table, bucket); the pair set is
    distinct-ed on narrow ids BEFORE vectors are re-attached (arrays never
    ride the dedup shuffle); candidates get an exact-cosine verification at
    ``threshold``. Cost: linear bucketing + per-bucket self-joins bounded
    by bucket occupancy (2^n_planes buckets/table) — never all-pairs.
    Precision is exact (verification); only recall is approximate:
    P[candidate] = 1-(1-p^b)^L with p = 1-angle/pi, so near-identical
    pairs (the dedup regime) are found with ~certainty while low-cosine
    pairs may be missed. Measured against the exact join in
    tests/test_similarity.py.

    ``max_bucket``: identical/near-identical embedding clusters of size d
    land in the SAME bucket of every table, putting d^2 candidate rows on
    one reducer. When set, overfull buckets (> max_bucket rows) are
    skipped per (table, bucket), bounding per-bucket work by
    max_bucket^2; bit-identical to the uncapped join whenever max_bucket
    >= max occupancy (tests/test_skew_soak.py measures both under a
    planted hot bucket). Exact-duplicate vectors belong in exact dedup
    upstream — they are overfull in every table.
    """
    df = valid_vectors(df, id_col, vec_col)
    # bucketing through the vectorized kernel (guide §4.2) — identical
    # sign-bit buckets, pinned against the HOF plan in tests
    bucketed = bucket_rows(df, dim, n_planes, n_tables, seed, id_col, vec_col)
    bucketed = drop_overfull_buckets(bucketed, ["table", "bucket"], max_bucket)
    lhs = bucketed.select(F.col(id_col).alias("id_a"), "table", "bucket")
    rhs = bucketed.select(F.col(id_col).alias("id_b"), "table", "bucket")
    cand = (
        lhs.join(rhs, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    with_norm = df.select(
        F.col(id_col), F.col(vec_col), norm_fixed(F.col(vec_col), dim).alias("_n")
    )
    a = with_norm.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), F.col("_n").alias("_na")
    )
    b = with_norm.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), F.col("_n").alias("_nb")
    )
    scored = cand.join(a, "id_a").join(b, "id_b").select(
        "id_a",
        "id_b",
        F.round(
            dot_fixed(F.col("_va"), F.col("_vb"), dim) / (F.col("_na") * F.col("_nb")),
            6,
        ).alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= threshold)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure-python LCG; no
    numpy dependency in the plan, values baked into the expression as
    literals and broadcast with the closure)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        v = []
        for _ in range(dim):
            # Numerical Recipes LCG; deterministic across runs/platforms.
            state = (1664525 * state + 1013904223) % (2**32)
            v.append(state / 2**32 * 2.0 - 1.0)
        s = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / s for x in v])
    return planes


def lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
    out_col: str = "bucket",
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH bucket id (0..2^n_planes-1) per vector.

    Bit i = sign of dot(vec, plane_i). Plane literals are constant-folded
    into the plan (no side table, no shuffle). P[same bit] =
    1 - angle/pi, so near-identical vectors land in the same bucket with
    probability (1-angle/pi)^n_planes.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        # HOF dot against a literal plane array: bucketing multiplies the
        # expression by n_planes (x n_tables in _bucket_array), and the
        # since-retired unrolled form blew a 1g driver heap at
        # plan/codegen time here — the first sighting of the expression-
        # size problem functions/vectors.py now documents in general.
        plane_col = lit_doubles(p)
        bit = F.when(dot(F.col(vec_col), plane_col) >= 0, F.lit(2**i)).otherwise(
            F.lit(0)
        )
        bucket = bucket + bit
    return df.withColumn(out_col, bucket.cast("bigint"))


def _bucket_array(vec_col: str, dim: int, n_planes: int, n_tables: int, seed: int):
    """array of (table, bucket) structs — one sign-bit bucket per table."""
    entries = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        bucket = F.lit(0).cast("bigint")
        for i, p in enumerate(planes):
            # HOF dot — see lsh_bucket for why not dot_literal here.
            plane_col = lit_doubles(p)
            bucket = bucket + F.when(
                dot(F.col(vec_col), plane_col) >= 0, F.lit(2**i)
            ).otherwise(F.lit(0))
        entries.append(
            F.struct(F.lit(t).alias("table"), bucket.cast("bigint").alias("bucket"))
        )
    return F.array(*entries)


_ARROW_BUCKETS = True  # kill-switch for the vectorized bucketing path


def _bucket_rows_arrow(
    df: DataFrame,
    dim: int,
    n_planes: int,
    n_tables: int,
    seed: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, table, bucket) sign-bit LSH bucket rows via ONE ``mapInArrow``
    pass — the vectorized twin of ``explode(_bucket_array(...))``
    (optimization r8, guide §4.2).

    The HOF form evaluates n_tables * n_planes interpreted zip_with/
    aggregate folds per row (~1 us per element: 96 folds x 64 dims
    dominated whole queries at fixture scale). This kernel computes the
    identical doubles: each plane dot is a COLUMN-STEPPED left fold (one
    IEEE product + add per element, ascending index — exactly the
    0.0-seeded aggregate order), the sign test is the same ``>= 0`` on
    the same final double, and bucket ids are the same bit sums. A row
    whose vector length differs from ``dim`` gets bucket 0 in every
    table, reproducing the HOF path (zip_with pads to NULL, the fold
    goes NULL, ``when(NULL).otherwise(0)`` contributes 0 per bit).
    Callers must pre-filter with :func:`valid_vectors` (same contract as
    every bucketing consumer) so elements are finite and non-null.
    Equality with the HOF plan is pinned in tests/test_similarity.py."""
    import numpy as np
    from pyspark.sql import types as T

    planes = np.array(
        [
            p
            for t in range(n_tables)
            for p in _hyperplanes(dim, n_planes, seed + 1000 * t)
        ],
        dtype=np.float64,
    )  # (n_tables * n_planes, dim), row t*n_planes+i = plane i of table t
    weights_lit = [1 << i for i in range(n_planes)]
    id_field = df.schema[id_col]
    narrow = df.select(F.col(id_col), F.col(vec_col))

    def kern(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        w = np.array(weights_lit, dtype=np.int64)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column(0)
            col = batch.column(1)
            lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            starts = np.concatenate(([0], np.cumsum(lengths)))
            buckets = np.zeros((n, n_tables), dtype=np.int64)
            rows = np.nonzero(lengths == dim)[0]
            if rows.size:
                idx = (
                    starts[rows][:, None] + np.arange(dim)[None, :]
                ).ravel()
                X = flat[idx].reshape(rows.size, dim)
                acc = np.zeros((rows.size, planes.shape[0]))
                for j in range(dim):  # column-stepped == the HOF fold
                    acc = acc + X[:, j : j + 1] * planes[None, :, j]
                bits = acc >= 0.0
                buckets[rows] = (
                    bits.reshape(rows.size, n_tables, n_planes)
                    * w[None, None, :]
                ).sum(axis=2)
            id_rep = ids.take(pa.array(np.repeat(np.arange(n), n_tables)))
            yield pa.RecordBatch.from_arrays(
                [
                    id_rep,
                    pa.array(np.tile(np.arange(n_tables, dtype=np.int32), n)),
                    pa.array(buckets.ravel()),
                ],
                names=[id_col, "table", "bucket"],
            )

    out_schema = T.StructType(
        [
            T.StructField(id_field.name, id_field.dataType),
            T.StructField("table", T.IntegerType()),
            T.StructField("bucket", T.LongType()),
        ]
    )
    return narrow.mapInArrow(kern, out_schema).select(
        F.col(id_col), F.col("table").cast("int"), F.col("bucket")
    )


def bucket_rows(
    df: DataFrame,
    dim: int,
    n_planes: int,
    n_tables: int,
    seed: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, table, bucket) rows for a valid-vector frame — Arrow kernel
    when enabled, HOF explode otherwise (identical values either way)."""
    if _ARROW_BUCKETS:
        return _bucket_rows_arrow(
            df, dim, n_planes, n_tables, seed, id_col, vec_col
        )
    return df.select(
        F.col(id_col),
        F.explode(
            _bucket_array(vec_col, dim, n_planes, n_tables, seed)
        ).alias("tb"),
    ).select(
        id_col,
        F.col("tb.table").alias("table"),
        F.col("tb.bucket").alias("bucket"),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: the corpus is
    partitioned into ``n_centroids`` cells by nearest centroid; a query
    scans only its ``n_probe`` nearest cells and re-ranks candidates with
    the exact cosine.

    Default centroids are a deterministic seeded sample of corpus vectors
    (the ``n_centroids`` smallest ``md5(seed || id)`` — no RNG, stable
    under retries, and REPRODUCIBLE IN ANY ENGINE, which is what lets the
    DuckDB oracle replay the whole index); only these few vectors ever
    reach the driver, where they become plan literals. Assignment is a map-side argmax over literal
    centroid expressions (``greatest`` on (cos, cid) structs — struct
    ordering is lexicographic, so ties break to the higher cid
    deterministically); the candidate join is EQUI on the cell id, bounded
    by cell occupancy — never corpus x queries. Expected work per query:
    n_probe/n_centroids of the corpus. At real scale the sample becomes a
    k-means refinement job and cells become partition keys — pass the
    Lloyd-refined vectors via ``centroids``
    (operators/clustering.py:kmeans_centroids); the query-side plan is
    unchanged, only the literals improve (better-balanced cells, higher
    recall at equal n_probe).
    """
    corpus = valid_vectors(corpus, id_col, vec_col)
    queries = valid_vectors(queries, query_id_col, vec_col)
    cent_vecs = _ivf_centroid_vecs(corpus, n_centroids, seed, id_col, vec_col, centroids)
    if not cent_vecs:
        return _empty_topk(corpus, queries, id_col, query_id_col)
    cents = _ivf_cents(cent_vecs)
    assigned = _ivf_assign(corpus, cents, dim, id_col, vec_col)
    return _ivf_probe(
        assigned, queries, cents, dim, k, n_probe, id_col, vec_col, query_id_col
    )


def _ivf_centroid_vecs(
    corpus: DataFrame,
    n_centroids: int,
    seed: int,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]] | None,
) -> list[list[float]]:
    """Centroid vectors: caller-provided (Lloyd-refined) or the portable
    md5-sample pick — the ``n_centroids`` smallest ``md5(seed || id)``,
    RNG-free and reproducible in any engine (the DuckDB oracle replays
    it). Only these few vectors ever reach the driver."""
    if centroids is not None:
        return [[float(x) for x in v] for v in centroids]
    cent_rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn(
            "_h", F.md5(F.concat(F.lit(str(seed)), F.col(id_col).cast("string")))
        )
        .orderBy("_h", id_col)
        .limit(n_centroids)
        .collect()
    )
    return [[float(x) for x in r[vec_col]] for r in cent_rows]


def _ivf_cents(cent_vecs: list[list[float]]) -> list[tuple[int, list[float], float]]:
    return [
        (i, v, math.sqrt(sum(x * x for x in v)) or 1.0)
        for i, v in enumerate(cent_vecs)
    ]


def _ivf_assign(
    corpus: DataFrame,
    cents: list[tuple[int, list[float], float]],
    dim: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Cell assignment: map-side argmax over literal centroid expressions
    (``greatest`` on (cos, cid) structs — struct ordering is
    lexicographic, so ties break to the higher cid deterministically).
    Emits (id, vec, _n, _cid); no shuffle.

    Optimization r8 NOTE (guide §1.1, measured and deliberately NOT
    taken): a mapInArrow argmax kernel (bit-exact column-stepped folds,
    ragged rows routed through this expression in a union branch) was
    built, pinned, and A/B-timed — at the 2k-vector fixture the Python
    boundary + extra union stages cost as much as the ~16 interpreted
    HOF folds they replace (ann_ivf_topk measured NO faster across
    repeated A/B passes), unlike the 48-fold LSH bucketing where the
    same kernel shape wins 4x (bucket_rows). Reverted; revisit only
    with profile evidence at a larger corpus."""

    def _cos_struct(cid: int, cvec: list[float], cnorm: float, norm_col):
        # HOF dot against a literal centroid (compact expression; see
        # lsh_bucket for why not the unrolled form here)
        plane = lit_doubles(cvec)
        return F.struct(
            (dot(F.col(vec_col), plane) / (norm_col * F.lit(cnorm))).alias("c"),
            F.lit(cid).alias("cid"),
        )

    c = corpus.select(
        F.col(id_col), F.col(vec_col), norm_fixed(F.col(vec_col), dim).alias("_n")
    )
    return c.withColumn(
        "_cid",
        F.greatest(*[_cos_struct(cid, v, nn, F.col("_n")) for cid, v, nn in cents])["cid"],
    )


def _ivf_probe(
    assigned: DataFrame,
    queries: DataFrame,
    cents: list[tuple[int, list[float], float]],
    dim: int,
    k: int,
    n_probe: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """Query-side probe over an assigned (id, vec, _n, _cid) corpus —
    inline (ivf_topk) or read back from the persisted bucketed index
    (ivf_persisted_topk); the plan is identical either way: probe set and
    query vectors broadcast, candidate join EQUI on the cell id, exact
    cosine re-rank, per-query top-k window."""
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        norm_fixed(F.col(vec_col), dim).alias("_qn"),
    )
    probe_structs = F.array(
        *[
            F.struct(
                (dot(F.col("_qvec"), lit_doubles(v))
                 / (F.col("_qn") * F.lit(nn))).alias("c"),
                F.lit(cid).alias("cid"),
            )
            for cid, v, nn in cents
        ]
    )
    probes = q.select(
        query_id_col,
        F.explode(
            F.slice(F.reverse(F.array_sort(probe_structs)), 1, n_probe)
        ).alias("_p"),
    ).select(query_id_col, F.col("_p.cid").alias("_cid"))
    candidates = (
        assigned.join(F.broadcast(probes), "_cid")
        .filter(F.col(id_col) != F.col(query_id_col))
        .join(F.broadcast(q.select(query_id_col, "_qvec")), query_id_col)
    )
    scored = candidates.select(
        query_id_col,
        id_col,
        F.round(cosine_fixed(F.col("_qvec"), F.col(vec_col), dim), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col, id_col, "cos_sim", F.col("rank").cast("bigint").alias("rank")
        )
    )


def build_ivf_index(
    corpus: DataFrame,
    table_name: str,
    dim: int,
    n_centroids: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_buckets: int = 16,
    centroids: list[list[float]] | None = None,
    path: str | None = None,
) -> None:
    """Persist an IVF index as TWO tables — the 100 TB shape, where the
    index is built once (and maintained incrementally) instead of being
    recomputed inside every query:

    - ``<table_name>``: the corpus as (id, vec, _n norm, _cid cell),
      written BUCKETED on ``_cid`` (operators/bucketing.py rationale) so
      later probe joins read cells co-located and an eventual cell-keyed
      fact-fact join (index |x| index, index |x| assignments) needs no
      exchange on the index side;
    - ``<table_name>_centroids``: the O(n_centroids) metadata rows
      (cid, cvec) that make the index self-describing — a prober loads
      literals from here, and incremental appends reuse them so every
      row ever written agrees on the cell geometry.

    Assignment is the same map-side argmax as ``ivf_topk`` (shared
    ``_ivf_assign``), so a probe over the persisted table is value-
    identical to the inline index and the same DuckDB oracle replays it.
    Pass ``path`` to write an EXTERNAL table (keeps scratch out of the
    default warehouse dir); pass Lloyd-refined ``centroids`` for the
    production build. An empty corpus persists an empty-but-schema-
    correct index (zero centroid rows) — a data gap must not abort the
    maintenance job."""
    spark = corpus.sparkSession
    corpus = valid_vectors(corpus, id_col, vec_col)
    cent_vecs = _ivf_centroid_vecs(corpus, n_centroids, seed, id_col, vec_col, centroids)
    cents = _ivf_cents(cent_vecs)
    if cents:
        assigned = _ivf_assign(corpus, cents, dim, id_col, vec_col)
    else:
        assigned = corpus.limit(0).select(
            F.col(id_col),
            F.col(vec_col),
            F.lit(None).cast("double").alias("_n"),
            F.lit(None).cast("int").alias("_cid"),
        )
    writer = assigned.write.mode("overwrite").bucketBy(n_buckets, "_cid")
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)
    cent_df = spark.createDataFrame(
        [(cid, [float(x) for x in v]) for cid, v, _ in cents],
        schema="cid INT, cvec ARRAY<DOUBLE>",
    )
    cw = cent_df.write.mode("overwrite")
    if path is not None:
        cw = cw.option("path", path + "_centroids")
    cw.saveAsTable(table_name + "_centroids")


def load_ivf_centroids(
    spark: SparkSession, table_name: str
) -> list[tuple[int, list[float], float]]:
    """Centroid literals back from the index's metadata table — an
    O(n_centroids) bounded collect (16 rows), never corpus data."""
    rows = spark.table(table_name + "_centroids").orderBy("cid").collect()
    return [
        (int(r["cid"]), [float(x) for x in r["cvec"]],
         math.sqrt(sum(x * x for x in r["cvec"])) or 1.0)
        for r in rows
    ]


def append_ivf_index(
    new_rows: DataFrame,
    table_name: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_buckets: int = 16,
) -> None:
    """Incremental index maintenance: assign NEW vectors to cells with
    the centroids already persisted in ``<table_name>_centroids`` and
    append them bucket-aligned — the daily-ingest path at 100 TB, where
    rebuilding the whole index per batch is a non-starter. Because the
    stored geometry is reused, a probe over (build half + append half)
    is bit-identical to a probe over a one-shot build with the same
    centroids (pinned in tests). ``n_buckets`` must match the build
    (Spark rejects a mismatched bucket spec on append)."""
    spark = new_rows.sparkSession
    cents = load_ivf_centroids(spark, table_name)
    if not cents:
        raise ValueError(
            f"index {table_name} has no centroids — build it on a "
            "non-empty corpus before appending"
        )
    assigned = _ivf_assign(
        valid_vectors(new_rows, id_col, vec_col), cents, dim, id_col, vec_col
    )
    assigned.write.mode("append").bucketBy(n_buckets, "_cid").saveAsTable(table_name)


def ivf_persisted_topk(
    spark: SparkSession,
    queries: DataFrame,
    table_name: str,
    dim: int,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k probe against a PERSISTED IVF index (build_ivf_index):
    centroid literals load from the metadata table (bounded collect),
    the probe set and query vectors broadcast, and the candidate join is
    EQUI on the cell id against the bucketed corpus scan — zero shuffle
    on the index side (the only shuffle in the whole plan is the final
    per-query top-k window over candidates, plan-asserted in tests).
    Value-identical to ``ivf_topk`` with the same centroids, so the same
    oracle SQL checks both."""
    cents = load_ivf_centroids(spark, table_name)
    assigned = spark.table(table_name)
    queries = valid_vectors(queries, query_id_col, vec_col)
    if not cents:
        return _empty_topk(assigned, queries, id_col, query_id_col)
    return _ivf_probe(
        assigned, queries, cents, dim, k, n_probe, id_col, vec_col, query_id_col
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k with OR-amplified random-hyperplane LSH:
    ``n_tables`` independent tables of ``n_planes`` sign bits; a corpus
    vector is a candidate if it shares a bucket with the query in ANY
    table (P = 1-(1-p^b)^L with p = 1-angle/pi — e.g. ~0.8 for 60-degree
    neighbors at b=4, L=8). Candidates get an exact cosine re-rank.

    Scale: bucketing is a map-side expression (plane literals constant-
    folded); the join is bucket-equi, bounded by bucket occupancy — never
    corpus x queries. Tune (b, L) for the corpus's similarity regime.
    """
    corpus = valid_vectors(corpus, id_col, vec_col)
    queries = valid_vectors(queries, query_id_col, vec_col)
    # bucketing through the vectorized kernel (guide §4.2) — identical
    # sign-bit buckets, pinned against the HOF plan in tests
    bc = bucket_rows(corpus, dim, n_planes, n_tables, seed, id_col, vec_col)
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
    bq = bucket_rows(
        queries, dim, n_planes, n_tables, seed, query_id_col, vec_col
    )
    # distinct on narrow id pairs (arrays never ride the dedup shuffle),
    # then join vectors back: corpus side by id, query side broadcast.
    cand_ids = (
        bc.join(F.broadcast(bq), ["table", "bucket"])
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, id_col)
        .distinct()
    )
    candidates = cand_ids.join(
        corpus.select(F.col(id_col), F.col(vec_col)), id_col
    ).join(F.broadcast(q), query_id_col)
    scored = candidates.select(
        query_id_col,
        id_col,
        F.round(cosine_fixed(F.col("_qvec"), F.col(vec_col), dim), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            "cos_sim",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
) -> DataFrame:
    """Top-k by cosine over int8-quantized vectors.

    The memory-bandwidth variant of brute_force_topk: vectors shrink 4x
    (int8 at rest) and the pairwise hot loop is an integer dot product —
    at 100 TB the corpus scan is bandwidth-bound, so quantization is a
    ~4x scan-cost cut for near-zero recall loss (top-10 recall 1.0 on
    the fixture, floor 0.9 asserted in tests/test_similarity.py). Scores are cosines of the QUANTIZED
    vectors; since per-vector scaling cancels in cosine, they track the
    exact ranking up to rounding noise. All arithmetic is exact-integer
    or IEEE-deterministic double -> fully oracle-checkable (no
    engine-side constants, unlike the LSH/IVF paths).
    """
    from masd_spark.functions.vectors import dot_fixed_long, quantize_int8

    corpus = valid_vectors(corpus, id_col, vec_col)
    queries = valid_vectors(queries, query_id_col, vec_col)

    def prep(df: DataFrame, idc: str):
        q = df.select(F.col(idc), quantize_int8(F.col(vec_col)).alias("_q"))
        return q.withColumn("_n2", dot_fixed_long(F.col("_q"), F.col("_q"), dim))

    c = prep(corpus, id_col)
    qs = prep(queries.select(F.col(query_id_col), F.col(vec_col)), query_id_col)
    qs = qs.withColumnRenamed("_q", "_qq").withColumnRenamed("_n2", "_qn2")
    pairs = c.join(F.broadcast(qs), F.col(id_col) != F.col(query_id_col))
    qdot = dot_fixed_long(F.col("_qq"), F.col("_q"), dim)
    score = F.when(
        (F.col("_qn2") > 0) & (F.col("_n2") > 0),
        F.round(
            qdot.cast("double")
            / (F.sqrt(F.col("_qn2").cast("double")) * F.sqrt(F.col("_n2").cast("double"))),
            6,
        ),
    )
    scored = pairs.select(query_id_col, id_col, score.alias("qcos"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("qcos").desc_nulls_last(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            "qcos",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def _empty_topk(
    corpus: DataFrame, queries: DataFrame, id_col: str, query_id_col: str
) -> DataFrame:
    """Schema-correct empty result for a degenerate index build: a
    search over an EMPTY corpus returns nothing — it must not abort the
    job (an empty corpus partition/day is routine lakehouse data, and
    the centroid/codebook builders cannot sample literals from zero
    rows). Column order/types match every ANN path's output contract
    (query_id, vec_id, cos_sim double, rank bigint)."""
    id_type = corpus.schema[id_col].dataType
    return queries.limit(0).select(
        F.col(query_id_col),
        F.lit(None).cast(id_type).alias(id_col),
        F.lit(None).cast("double").alias("cos_sim"),
        F.lit(None).cast("bigint").alias("rank"),
    )


def _seeded_sample(
    corpus: DataFrame, n: int, id_col: str, vec_col: str, seed: int
) -> list[list[float]]:
    """The portable index-build sample: the ``n`` corpus vectors with
    smallest ``md5(seed || id)`` — RNG-free, retry-stable, reproducible
    by any engine (the property every oracle-checkable index here rests
    on). Only these n rows ever reach the driver."""
    rows = (
        valid_vectors(corpus, id_col, vec_col)
        .select(F.col(id_col), F.col(vec_col))
        .withColumn(
            "_h", F.md5(F.concat(F.lit(str(seed)), F.col(id_col).cast("string")))
        )
        .orderBy("_h", id_col)
        .limit(n)
        .collect()
    )
    return [[float(x) for x in r[vec_col]] for r in rows]


_PQ_DEC = "decimal(20,9)"


def _pq_codeword_norms(codebooks: list[list[list[float]]]) -> list[list[float]]:
    """Per-codeword squared norms, accumulated in the same sequential
    order DuckDB's list_dot_product uses so the doubles are bit-identical
    cross-engine."""
    cc: list[list[float]] = []
    for cb in codebooks:
        accs = []
        for cw in cb:
            acc = 0.0
            for x in cw:
                acc = acc + x * x
            accs.append(acc)
        cc.append(accs)
    return cc


def _codebook_lit(cb: list[list[float]]):
    """A subspace codebook as a LITERAL array<array<double>> column."""
    return lit_double_matrix([[float(x) for x in cw] for cw in cb])


def _hof_dot(slice_col, cw_col):
    """Sequential left-fold dot of a vector slice with a codeword array —
    the 0.0-seeded fold is IEEE-identical to a t1 + t2 + ... chain
    (0.0 + t1 == t1 exactly), matching DuckDB's list_dot_product."""
    return F.aggregate(
        F.zip_with(slice_col, cw_col, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def _pq_code_cols(vec_col: str, codebooks, cc) -> list:
    """Map-side encoding: per subspace, argmin ||c||^2 - 2<x_j, c> with
    ties to the lower code id (array_min over (key, cid) structs == ORDER
    BY key, cid LIMIT 1, same ordering F.least would use). Emits columns
    _c0.._c{m-1}.

    The codebook enters as literal ARRAY DATA walked by higher-order
    functions, not as unrolled expressions: the unrolled form generated
    m * n_codes * sub multiply-adds of Java source in ONE method
    (~16k lines at dim=64/m=8/n_codes=16), blowing janino's 64 KB method
    limit and dropping the whole stage to interpreted execution. The HOF
    form keeps generated code O(1) in codebook size while computing the
    identical floats (fold order matches the unrolled chain)."""
    sub = len(codebooks[0][0])

    def keyed_fn(cc_lit, slice_j):
        def fn(cw, i):
            return F.struct(
                (
                    F.element_at(cc_lit, i + 1) - F.lit(2.0) * _hof_dot(slice_j, cw)
                ).alias("d"),
                i.alias("cid"),
            )

        return fn

    cols = []
    for j, cb in enumerate(codebooks):
        cc_lit = lit_doubles([float(x) for x in cc[j]])
        slice_j = F.slice(F.col(vec_col), j * sub + 1, sub)
        keyed = F.transform(_codebook_lit(cb), keyed_fn(cc_lit, slice_j))
        cols.append(F.array_min(keyed)["cid"].alias(f"_c{j}"))
    return cols


def _pq_encode(
    df: DataFrame, codebooks, cc, dim: int, vec_col: str
) -> DataFrame:
    """Append ``_c0.._c{m-1}`` PQ codes to any frame carrying
    ``vec_col`` — the one shared encode entry point for the inline,
    persisted-build and append paths. (An Arrow argmin kernel for this
    step was measured A/B at the fixture and reverted — see the
    _ivf_assign r8 note; the expression form stays.)"""
    return df.select("*", *_pq_code_cols(vec_col, codebooks, cc))


def _pq_recon2(cc):
    """Reconstructed squared norm from the assigned codes: DECIMAL sum of
    literal per-codeword norms picked by _c{j}."""
    terms = [
        F.element_at(lit_doubles(cc[j]), F.col(f"_c{j}") + 1).cast(
            _PQ_DEC
        )
        for j in range(len(cc))
    ]
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def _pq_lut_cols(qvec_col: str, codebooks) -> list:
    """Query-side ADC lookup tables: per subspace an array of
    DECIMAL-quantized dots with every codeword. Same HOF-over-literal
    shape as the encoder (see _pq_code_cols) — identical floats, compact
    generated code."""
    sub = len(codebooks[0][0])

    def lut_fn(slice_j):
        def fn(cw):
            return _hof_dot(slice_j, cw).cast(_PQ_DEC)

        return fn

    return [
        F.transform(
            _codebook_lit(cb),
            lut_fn(F.slice(F.col(qvec_col), j * sub + 1, sub)),
        ).alias(f"_lut{j}")
        for j, cb in enumerate(codebooks)
    ]


def _pq_adc_dot(m: int):
    """ADC score: m decimal lookups summed (order-independent, exact)."""
    terms = [F.element_at(F.col(f"_lut{j}"), F.col(f"_c{j}") + 1) for j in range(m)]
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 7,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Approximate top-k via product quantization (PQ) with asymmetric
    distance computation (ADC): the corpus vector is split into ``m``
    subvectors, each replaced by the id of its nearest codeword from a
    per-subspace codebook of ``n_codes`` entries, and query-time scoring
    is ``m`` table lookups per pair instead of ``dim`` multiply-adds.
    The top-``rerank`` ADC candidates per query are re-ranked with the
    exact cosine; output schema matches the other ANN paths
    (query_id, vec_id, cos_sim, rank).

    PQ is the SCAN-COMPRESSION leg of the ANN family (Jegou et al., "
    Product Quantization for Nearest Neighbor Search", TPAMI 2011): at
    rest each vector is m log2(n_codes)-bit codes — 8 bytes vs 256 here,
    a 32x cut — and the ADC loop reads only (id, codes), so a 100 TB
    corpus scans as ~3 TB. Pair-COUNT bounding comes from composing with
    the IVF cells (``ivf_topk``): probe cells, then ADC-scan only their
    codes. This operator keeps the full-scan form so its candidate rule
    is exactly "best rerank by ADC", which a SQL oracle can replay.

    Portability (what makes an approximate index hash-checkable — same
    recipe as ivf_topk): default codebooks take the per-subspace slices
    of the ``n_codes`` corpus vectors with smallest ``md5(seed || id)``
    (no RNG; any engine reproduces the pick), and they enter the plan as
    LITERALS. Encoding argmins ``||c||^2 - 2<x_j, c>`` with ties to the
    lower code id (F.least on (key, cid) structs == ORDER BY key, cid
    LIMIT 1). ADC terms and reconstructed norms are quantized to
    DECIMAL(20,9) (the BM25/PSI portable-numerics recipe) and summed as
    decimals — order-independent exact sums, so the candidate cut is
    engine-portable; final cosines round to 6 like every similarity
    query. Production swap: Lloyd-refine each subspace
    codebook (kmeans_centroids pattern) and pass it via ``codebooks`` —
    the query plan is unchanged, only the literals improve.
    """
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    sub = dim // m
    corpus = valid_vectors(corpus, id_col, vec_col)
    queries = valid_vectors(queries, query_id_col, vec_col)
    if codebooks is None:
        sampled = _seeded_sample(corpus, n_codes, id_col, vec_col, seed)
        codebooks = [
            [v[j * sub : (j + 1) * sub] for v in sampled] for j in range(m)
        ]
    if not codebooks[0]:
        return _empty_topk(corpus, queries, id_col, query_id_col)
    cc = _pq_codeword_norms(codebooks)
    # --- corpus encoding: map-side argmin per subspace (Arrow kernel
    # for uniform-dim rows since r8, guide §4.2) -------------------------
    encoded = (
        _pq_encode(
            corpus.select(F.col(id_col), F.col(vec_col)),
            codebooks, cc, dim, vec_col,
        )
        .withColumn("_rn", F.sqrt(_pq_recon2(cc).cast("double")))
        .drop(vec_col)
    )
    cvec = corpus.select(
        F.col(id_col), F.col(vec_col), norm_fixed(F.col(vec_col), dim).alias("_cn")
    )
    return _pq_adc_rerank(
        encoded, cvec, queries, codebooks, dim, k, rerank,
        id_col, vec_col, query_id_col,
    )


def _pq_adc_rerank(
    encoded: DataFrame,
    cvec: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    dim: int,
    k: int,
    rerank: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """The probe half of PQ/ADC, shared by the inline (``pq_topk``) and
    persisted (``pq_persisted_topk``) index shapes: given an encoded
    (id, _c0.._c{m-1}, _rn) corpus and an (id, vec, _cn) re-rank side,
    broadcast the query lookup tables, ADC-score the codes-only scan, cut
    to the top-``rerank`` candidates per query, and re-rank them with the
    exact cosine. Identical floats either way, so the same DuckDB oracle
    replays both."""
    m = len(codebooks)
    # --- query-side lookup tables (tiny, broadcast) ---------------------
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        norm_fixed(F.col(vec_col), dim).alias("_qn"),
    )
    qlut = q.select(query_id_col, F.col("_qn"), *_pq_lut_cols("_qvec", codebooks))
    # --- ADC scan: codes-only corpus x broadcast queries ----------------
    pairs = encoded.join(F.broadcast(qlut), F.col(id_col) != F.col(query_id_col))
    adc_cos = F.round(
        _pq_adc_dot(m).cast("double") / (F.col("_qn") * F.col("_rn")), 6
    )
    scored = pairs.select(query_id_col, id_col, adc_cos.alias("_adc"))
    wc = Window.partitionBy(query_id_col).orderBy(F.col("_adc").desc_nulls_last(), F.col(id_col))
    cand = (
        scored.withColumn("_r", F.row_number().over(wc))
        .filter(F.col("_r") <= rerank)
        .select(query_id_col, id_col)
    )
    # --- exact re-rank of the bounded candidate set ---------------------
    rr = (
        cvec.join(F.broadcast(cand), id_col)
        .join(F.broadcast(q), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(
                dot_fixed(F.col("_qvec"), F.col(vec_col), dim)
                / (F.col("_qn") * F.col("_cn")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        rr.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", F.col("rank").cast("bigint").alias("rank"))
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    rerank: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    ivf_seed: int = 42,
    pq_seed: int = 7,
) -> DataFrame:
    """IVF + PQ composed — the production 100 TB ANN shape (the IVFADC
    system of Jegou et al. TPAMI 2011): IVF cells bound the PAIR COUNT
    (each query ADC-scans only its ``n_probe`` cells' codes, an EQUI join
    on the cell id — no all-pairs stage survives in the plan), PQ codes
    bound the SCAN BYTES (the candidate join carries (id, cell, m codes,
    recon-norm) — the raw vectors appear only in the two index builds and
    the top-``rerank`` exact re-rank). Expected per-query work:
    (n_probe/n_centroids) x corpus x (m lookups), vs brute force's
    corpus x dim multiply-adds over 32x more bytes.

    Both component indexes use the portable-literal recipe (md5-seeded
    samples, DECIMAL-quantized ADC sums), so the COMPOSITION stays fully
    oracle-checkable: DuckDB replays centroid pick, cell assignment,
    probe set, codebook pick, encoding, LUT scoring, candidate cut, and
    re-rank end to end. Recall is bounded by cell co-residence (like
    ivf_topk) times ADC ordering quality (like pq_topk); the floor vs
    the exact baseline is pinned in tests. Production swaps: Lloyd-refine
    centroids/codebooks (kmeans_centroids pattern) — plan unchanged,
    literals improve; store codes partitioned BY cell so a probe prunes
    file groups, not just join rows.
    """
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    sub = dim // m
    corpus = valid_vectors(corpus, id_col, vec_col)
    queries = valid_vectors(queries, query_id_col, vec_col)
    # --- index builds: two tiny portable samples as plan literals -------
    cent_vecs = _seeded_sample(corpus, n_centroids, id_col, vec_col, ivf_seed)
    if not cent_vecs:
        return _empty_topk(corpus, queries, id_col, query_id_col)
    cents = []
    for i, v in enumerate(cent_vecs):
        cents.append((i, v, math.sqrt(sum(x * x for x in v)) or 1.0))
    sampled = _seeded_sample(corpus, n_codes, id_col, vec_col, pq_seed)
    codebooks = [[v[j * sub : (j + 1) * sub] for v in sampled] for j in range(m)]
    cc = _pq_codeword_norms(codebooks)

    # --- corpus side: map-side pass emits (id, cell, codes, recon) —
    # cell assignment and code argmins through the shared r8 kernels
    # (guide §4.2; identical values, see _cells_kernel/_codes_kernel) ----
    encoded = (
        _pq_encode(
            _ivf_assign(corpus, cents, dim, id_col, vec_col).drop("_n"),
            codebooks, cc, dim, vec_col,
        )
        .withColumn("_rn", F.sqrt(_pq_recon2(cc).cast("double")))
        .drop(vec_col)
    )
    cvec = corpus.select(
        F.col(id_col), F.col(vec_col), norm_fixed(F.col(vec_col), dim).alias("_cn")
    )
    return _ivfpq_probe(
        encoded, cvec, queries, cents, codebooks, dim, k, n_probe, rerank,
        id_col, vec_col, query_id_col,
    )


def _ivfpq_probe(
    encoded: DataFrame,
    cvec: DataFrame,
    queries: DataFrame,
    cents: list[tuple[int, list[float], float]],
    codebooks: list[list[list[float]]],
    dim: int,
    k: int,
    n_probe: int,
    rerank: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """The probe half of IVFPQ, shared by the inline (``ivfpq_topk``) and
    persisted (``ivfpq_persisted_topk``) index shapes: broadcast the
    queries' probe cells + ADC lookup tables, cell-EQUI join against the
    encoded (id, _cid, codes, _rn) corpus, cut to top-``rerank`` ADC
    candidates, exact-cosine re-rank against the (id, vec, _cn) side."""
    m = len(codebooks)
    # --- query side: probe cells + ADC lookup tables, both broadcast ----
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        norm_fixed(F.col(vec_col), dim).alias("_qn"),
    )
    probe_structs = F.array(
        *[
            F.struct(
                (
                    dot(F.col("_qvec"), lit_doubles(v))
                    / (F.col("_qn") * F.lit(nn))
                ).alias("c"),
                F.lit(cid).alias("cid"),
            )
            for cid, v, nn in cents
        ]
    )
    probes = (
        q.select(
            query_id_col,
            F.col("_qn"),
            *_pq_lut_cols("_qvec", codebooks),
            F.explode(
                F.slice(F.reverse(F.array_sort(probe_structs)), 1, n_probe)
            ).alias("_p"),
        )
        .select(
            query_id_col,
            "_qn",
            *[F.col(f"_lut{j}") for j in range(m)],
            F.col("_p.cid").alias("_cid"),
        )
    )
    # --- cell-bounded ADC scan: EQUI join on the cell id ----------------
    pairs = encoded.join(F.broadcast(probes), "_cid").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    adc_cos = F.round(
        _pq_adc_dot(m).cast("double") / (F.col("_qn") * F.col("_rn")), 6
    )
    scored = pairs.select(query_id_col, id_col, adc_cos.alias("_adc"))
    wc = Window.partitionBy(query_id_col).orderBy(
        F.col("_adc").desc_nulls_last(), F.col(id_col)
    )
    cand = (
        scored.withColumn("_r", F.row_number().over(wc))
        .filter(F.col("_r") <= rerank)
        .select(query_id_col, id_col)
    )
    # --- exact re-rank of the bounded candidate set ---------------------
    rr = (
        cvec.join(F.broadcast(cand), id_col)
        .join(F.broadcast(q), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(
                dot_fixed(F.col("_qvec"), F.col(vec_col), dim)
                / (F.col("_qn") * F.col("_cn")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        rr.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col, id_col, "cos_sim", F.col("rank").cast("bigint").alias("rank")
        )
    )


def build_pq_index(
    corpus: DataFrame,
    table_name: str,
    dim: int,
    m: int = 8,
    n_codes: int = 16,
    n_centroids: int = 16,
    pq_seed: int = 7,
    ivf_seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_buckets: int = 16,
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    path: str | None = None,
) -> None:
    """Persist a PQ/IVFPQ index as THREE tables — the 100 TB shape
    (VERDICT r6 item 6): codebooks and the (id, cell, codes, recon-norm)
    encoding are a maintained asset, built once and appended to, never
    rebuilt as plan literals inside every query.

    - ``<table_name>``: (id, vec, _n norm, _cid cell, _c0.._c{m-1}
      codes, _rn reconstructed norm), BUCKETED on ``_cid`` so IVFPQ cell
      probes join with zero index-side exchange. The raw vector column
      coexists with the codes ON PURPOSE: parquet is columnar, so the
      ADC scan's (id, codes, _rn) projection never reads vector bytes
      (column pruning — plan-asserted in tests) while the top-``rerank``
      exact re-rank reads (id, vec, _n) for candidates only. At 100 TB
      the codes projection is the ~32x-smaller hot path; the vectors are
      cold columns in the same cell-clustered layout.
    - ``<table_name>_centroids``: (cid, cvec) — same O(n_centroids)
      metadata contract as build_ivf_index.
    - ``<table_name>_codebooks``: (j, code, cw) — m x n_codes codeword
      rows; probers and appenders load these (bounded collect, 128 rows
      here) so every row ever written agrees on the quantizer geometry.

    Defaults reproduce the portable md5-sample quantizers of ``pq_topk``/
    ``ivfpq_topk``, so probes over the persisted table are value-identical
    to the inline indexes and the SAME DuckDB oracles replay them; pass
    Lloyd-refined ``centroids``/``codebooks`` for the production build.
    An empty corpus persists empty-but-schema-correct tables."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    sub = dim // m
    spark = corpus.sparkSession
    corpus = valid_vectors(corpus, id_col, vec_col)
    cent_vecs = _ivf_centroid_vecs(corpus, n_centroids, ivf_seed, id_col, vec_col, centroids)
    cents = _ivf_cents(cent_vecs)
    if codebooks is None:
        sampled = _seeded_sample(corpus, n_codes, id_col, vec_col, pq_seed)
        codebooks = [
            [v[j * sub : (j + 1) * sub] for v in sampled] for j in range(m)
        ]
    if cents and codebooks and codebooks[0]:
        cc = _pq_codeword_norms(codebooks)
        encoded = _pq_encode(
            _ivf_assign(corpus, cents, dim, id_col, vec_col),
            codebooks, cc, dim, vec_col,
        ).withColumn("_rn", F.sqrt(_pq_recon2(cc).cast("double")))
    else:
        encoded = corpus.limit(0).select(
            F.col(id_col),
            F.col(vec_col),
            F.lit(None).cast("double").alias("_n"),
            F.lit(None).cast("int").alias("_cid"),
            *[F.lit(None).cast("int").alias(f"_c{j}") for j in range(m)],
            F.lit(None).cast("double").alias("_rn"),
        )
    writer = encoded.write.mode("overwrite").bucketBy(n_buckets, "_cid")
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)
    cent_df = spark.createDataFrame(
        [(cid, [float(x) for x in v]) for cid, v, _ in cents],
        schema="cid INT, cvec ARRAY<DOUBLE>",
    )
    cw = cent_df.write.mode("overwrite")
    if path is not None:
        cw = cw.option("path", path + "_centroids")
    cw.saveAsTable(table_name + "_centroids")
    cb_df = spark.createDataFrame(
        [
            (j, code, [float(x) for x in cwv])
            for j, cb in enumerate(codebooks)
            for code, cwv in enumerate(cb)
        ],
        schema="j INT, code INT, cw ARRAY<DOUBLE>",
    )
    bw = cb_df.write.mode("overwrite")
    if path is not None:
        bw = bw.option("path", path + "_codebooks")
    bw.saveAsTable(table_name + "_codebooks")


def load_pq_codebooks(spark: SparkSession, table_name: str) -> list[list[list[float]]]:
    """Codebook literals back from the index's metadata table — an
    O(m x n_codes) bounded collect (128 rows at the defaults), never
    corpus data."""
    rows = spark.table(table_name + "_codebooks").orderBy("j", "code").collect()
    books: dict[int, list[list[float]]] = {}
    for r in rows:
        books.setdefault(int(r["j"]), []).append([float(x) for x in r["cw"]])
    return [books[j] for j in sorted(books)]


def append_pq_index(
    new_rows: DataFrame,
    table_name: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_buckets: int = 16,
) -> None:
    """Incremental PQ-index maintenance: encode NEW vectors with the
    centroids AND codebooks already persisted in the metadata tables and
    append them bucket-aligned — the daily-ingest path at 100 TB. Because
    the stored quantizer geometry is reused, a probe over (build half +
    append half) is bit-identical to a one-shot build with the same
    quantizers (pinned in tests)."""
    spark = new_rows.sparkSession
    cents = load_ivf_centroids(spark, table_name)
    codebooks = load_pq_codebooks(spark, table_name)
    if not cents or not codebooks:
        raise ValueError(
            f"index {table_name} has no quantizer metadata — build it on "
            "a non-empty corpus before appending"
        )
    cc = _pq_codeword_norms(codebooks)
    encoded = _pq_encode(
        _ivf_assign(
            valid_vectors(new_rows, id_col, vec_col), cents, dim, id_col, vec_col
        ),
        codebooks, cc, dim, vec_col,
    ).withColumn("_rn", F.sqrt(_pq_recon2(cc).cast("double")))
    encoded.write.mode("append").bucketBy(n_buckets, "_cid").saveAsTable(table_name)


def pq_persisted_topk(
    spark: SparkSession,
    queries: DataFrame,
    table_name: str,
    dim: int,
    k: int = 10,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k ADC probe against a PERSISTED PQ index (build_pq_index):
    codebook literals load from the metadata table (bounded collect), the
    query lookup tables broadcast, and the ADC leg scans ONLY the
    (id, codes, _rn) columns of the index — parquet column pruning keeps
    the 32x-bigger vector column out of the hot scan (plan-asserted).
    Value-identical to ``pq_topk`` with the same codebooks, so the same
    DuckDB oracle checks both."""
    codebooks = load_pq_codebooks(spark, table_name)
    t = spark.table(table_name)
    queries = valid_vectors(queries, query_id_col, vec_col)
    if not codebooks:
        return _empty_topk(t, queries, id_col, query_id_col)
    m = len(codebooks)
    encoded = t.select(
        F.col(id_col), *[F.col(f"_c{j}") for j in range(m)], F.col("_rn")
    )
    cvec = t.select(F.col(id_col), F.col(vec_col), F.col("_n").alias("_cn"))
    return _pq_adc_rerank(
        encoded, cvec, queries, codebooks, dim, k, rerank,
        id_col, vec_col, query_id_col,
    )


def ivfpq_persisted_topk(
    spark: SparkSession,
    queries: DataFrame,
    table_name: str,
    dim: int,
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k IVFPQ probe against the SAME persisted index: centroids and
    codebooks load from metadata, the probe set + lookup tables broadcast,
    and the candidate join is cell-EQUI against the ``_cid``-bucketed
    codes scan — zero shuffle on the index side, with the pair count
    bounded by n_probe/n_centroids and scan bytes by the codes projection.
    Value-identical to ``ivfpq_topk`` with the same quantizers, so the
    same DuckDB oracle checks both."""
    cents = load_ivf_centroids(spark, table_name)
    codebooks = load_pq_codebooks(spark, table_name)
    t = spark.table(table_name)
    queries = valid_vectors(queries, query_id_col, vec_col)
    if not cents or not codebooks:
        return _empty_topk(t, queries, id_col, query_id_col)
    m = len(codebooks)
    encoded = t.select(
        F.col(id_col), F.col("_cid"),
        *[F.col(f"_c{j}") for j in range(m)], F.col("_rn"),
    )
    cvec = t.select(F.col(id_col), F.col(vec_col), F.col("_n").alias("_cn"))
    return _ivfpq_probe(
        encoded, cvec, queries, cents, codebooks, dim, k, n_probe, rerank,
        id_col, vec_col, query_id_col,
    )


def mmr_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): greedily pick k of the top-m cosine candidates, each round
    maximizing relevance minus redundancy against what is already picked
    (lambda = 0.5, so 2*MMR = rel - max_sim_to_selected — one integer
    subtraction).

    Exactness/portability: relevance and candidate-pair similarities are
    snapped to integer MICRO-UNITS (round(cos * 1e6)) before the greedy
    loop, which then does only integer max/subtract/compare with vec_id
    as the total tie-break — the selection is bit-deterministic and
    reproducible by an unrolled k-round SQL twin.

    Scale: candidate generation is the distributed part (top-m per query
    — brute force here, any ANN index at 100 TB); the m x m pair-sim
    matrix and the greedy loop run per query GROUP, bounded by m, via
    one Arrow applyInPandas over |queries| groups. The sequential
    dependence of greedy selection lives only inside a group — exactly
    the applyInPandas contract.
    """
    import pandas as pd

    cands = brute_force_topk(
        corpus, queries, k=m, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col, dim=dim,
    ).select(
        query_id_col,
        id_col,
        F.round(F.col("cos_sim") * 1e6, 0).cast("bigint").alias("rel6"),
    )
    vecs = corpus.select(F.col(id_col), F.col(vec_col))
    ca = cands.join(vecs, id_col).select(
        query_id_col, F.col(id_col).alias("_a"), F.col("rel6"),
        F.col(vec_col).alias("_va"),
    )
    cb = cands.join(vecs, id_col).select(
        F.col(query_id_col).alias("_qb"), F.col(id_col).alias("_b"),
        F.col(vec_col).alias("_vb"),
    )
    pairs = ca.join(
        cb,
        (F.col(query_id_col) == F.col("_qb")) & (F.col("_a") != F.col("_b")),
        "left",
    ).select(
        query_id_col,
        F.col("_a").alias("cand"),
        "rel6",
        F.col("_b").alias("other"),
        F.round(cosine(F.col("_va"), F.col("_vb")) * 1e6, 0)
        .cast("bigint")
        .alias("sim6"),
    )

    out_schema = (
        f"{query_id_col} long, {id_col} long, rel6 long, mmr6 long, "
        "sel_rank long"
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf[query_id_col].iloc[0]
        rel = {}
        sim = {}
        for row in pdf.itertuples(index=False):
            rel[int(row.cand)] = int(row.rel6)
            if row.other is not None and not pd.isna(row.other):
                sim[(int(row.cand), int(row.other))] = int(row.sim6)
        pool = sorted(rel)
        selected: list[int] = []
        rows = []
        while pool and len(selected) < k:
            best, best_score = None, None
            for v in pool:
                pen = max((sim[(v, s)] for s in selected), default=0)
                score = rel[v] - pen
                if best is None or score > best_score:
                    best, best_score = v, score
            selected.append(best)
            pool.remove(best)
            rows.append((qid, best, rel[best], best_score, len(selected)))
        return pd.DataFrame(
            rows, columns=[query_id_col, id_col, "rel6", "mmr6", "sel_rank"]
        )

    return pairs.groupBy(query_id_col).applyInPandas(greedy, schema=out_schema)


def ivf_exact_refined_topk(
    corpus: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iter: int = 3,
    seed: int = 42,
    scale: int = 10**4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat with Lloyd-REFINED centroids, fully hash-checkable: the
    index build is the integer fixed-point k-means
    (clustering.kmeans_exact_longform with return_centroids), so unlike
    ann_ivf_refined_topk's float centroids the whole pipeline — build,
    assignment, probe selection, exact cosine re-rank — is reproducible
    by one SQL statement. Assignment/probe metric is the exact BIGINT
    squared L2 in 1/scale units (ties on cid); queries are every 100th
    vector; final ranking is rounded double cosine (desc, id).

    Scale: one long-form distance table serves BOTH corpus assignment
    and query probes (queries are corpus rows); candidates are
    cell-bounded (n_probe cells per query), re-rank touches candidates
    only. The float refined variant stays the latency path; this is the
    provable one.
    """
    from masd_spark.operators.clustering import kmeans_exact_longform

    corpus = valid_vectors(corpus, id_col, vec_col)
    cents = kmeans_exact_longform(
        corpus, dim, k=n_centroids, n_iter=n_iter, id_col=id_col,
        vec_col=vec_col, seed=seed, scale=scale, return_centroids=True,
    ).select("cid", "dim", F.col("x").alias("cx"))
    q = corpus.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.col(vec_col),
                lambda v: F.round(v.cast("double") * scale).cast("bigint"),
            )
        ).alias("pos", "x"),
    ).select(id_col, (F.col("pos") + 1).alias("dim"), "x")
    dall = (
        q.join(F.broadcast(cents), "dim")
        .groupBy(id_col, "cid")
        .agg(
            F.sum((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx")))
            .alias("d")
        )
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("d"), F.col("cid"))
    ranked = dall.withColumn("_rn", F.row_number().over(w))
    assigned = ranked.filter(F.col("_rn") == 1).select(
        F.col(id_col).alias("_cand"), "cid"
    )
    probes = ranked.filter(
        (F.col(id_col) % 100 == 0) & (F.col("_rn") <= n_probe)
    ).select(F.col(id_col).alias("query_id"), "cid")
    cands = (
        probes.join(assigned, "cid")
        .filter(F.col("_cand") != F.col("query_id"))
        .select("query_id", F.col("_cand").alias(id_col))
    )
    vecs = corpus.select(F.col(id_col), F.col(vec_col))
    scored = (
        cands.join(
            vecs.select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
            ),
            "query_id",
        )
        .join(vecs, id_col)
        .select(
            "query_id",
            id_col,
            F.round(cosine(F.col("_qv"), F.col(vec_col)), 6).alias("cos_sim"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= k)
    )
