"""Deduplication operators for training-data pipelines.

Four families, each with a distinct scale profile:

- exact: md5-fingerprint groupBy — one shuffle, keeps the smallest doc_id
  per fingerprint. The only correct answer at any scale for byte-dups.
- n-gram Jaccard (exact near-dup): shingle-explode + self-join on shingle
  + pair aggregation. Exact but candidate-pair-bounded: only documents
  sharing >=1 shingle ever meet, so cost is sum over shingles of df^2 —
  fine when shingles are discriminative (k>=3 words), quadratic-blowup-
  prone for tiny k. The oracle-checkable ground truth for the LSH variant.
- MinHash + LSH (approximate near-dup): per-doc signatures (n_hashes
  mins), banding, bucket self-join, then exact Jaccard verification of
  the candidates only. The 100 TB path: cost is linear in corpus +
  candidates, never all-pairs. Hashes are md5 hex strings (engine-
  portable, lexicographic min == numeric min on fixed-width hex);
  swap in xxhash64 for production speed — same shape.
- embedding cosine (semantic near-dup): see similarity.py — pairs with
  cosine >= threshold.

Shingle weighting: all ops use DISTINCT shingles (set semantics), the
standard choice for Jaccard dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from masd_spark.operators.text import fingerprint_md5, with_shingles


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one row (smallest id) per normalized-text fingerprint."""
    fp = fingerprint_md5(df, text_col)
    keep = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return keep.join(fp, [id_col, "fingerprint"]).drop("fingerprint")


def _shingle_rows(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, shingle) rows, distinct shingles per doc."""
    return (
        with_shingles(df, text_col, k)
        .select(F.col(id_col), F.explode("shingles").alias("shingle"))
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs (doc_a < doc_b, jaccard >=
    threshold).

    Plan: shingle rows self-join on shingle (shuffle keyed by shingle) ->
    per-pair intersection counts -> broadcast-join per-doc set sizes ->
    jaccard filter. Hot shingles create join skew at scale: mitigate by
    dropping shingles with document-frequency above a cap (they contribute
    candidates that banding would find anyway) — here the fixture corpus
    has no such stop-shingles, so no cap is applied.
    """
    sh = _shingle_rows(df, id_col, text_col, k).cache()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("set_size"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("doc_a"), F.col("set_size").alias("size_a"))
    sz_b = sizes.select(F.col(id_col).alias("doc_b"), F.col("set_size").alias("size_b"))
    jac = (
        inter.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
                6,
            ),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "jaccard"
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 16,
) -> DataFrame:
    """MinHash signature per doc: sig_i = min over shingles of
    md5(i || ':' || shingle), i in [0, n_hashes).

    One shuffle (groupBy doc) with n_hashes conditional-min partial
    aggregates — the md5s are computed map-side, n_hashes per shingle.
    """
    sh = _shingle_rows(df, id_col, text_col, k)
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"sig_{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*mins)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact-Jaccard verification.

    banding: n_bands bands of n_hashes/n_bands rows; candidate pairs
    collide in >=1 band (P[collide] = 1-(1-j^r)^b — with 16/4 this is
    ~0.95 at j=0.8, ~0.3 at j=0.5). Candidates are then verified with the
    exact Jaccard, so the threshold is honest; only recall is approximate.

    Scale: signatures are one shuffle; banding explodes 4 rows/doc; the
    bucket self-join only ever joins docs whose band-hash matches. No
    all-pairs stage anywhere.
    """
    rows_per_band = n_hashes // n_bands
    sigs = minhash_signatures(df, id_col, text_col, k, n_hashes)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
                )
            ).alias("band_hash"),
        )
        for b in range(n_bands)
    ]
    banded = sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.band_hash").alias("band_hash"))
    lhs = banded.select(F.col(id_col).alias("doc_a"), "band", "band_hash")
    rhs = banded.select(F.col(id_col).alias("doc_b"), "band", "band_hash")
    candidates = (
        lhs.join(rhs, ["band", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # Exact-Jaccard verification of CANDIDATES ONLY (never all pairs):
    # attach doc_a's shingles, semi-join doc_b's shingles -> intersection.
    sh = _shingle_rows(df, id_col, text_col, k).cache()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("set_size"))
    sh_a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    sh_b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        candidates.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("doc_a"), F.col("set_size").alias("size_a"))
    sz_b = sizes.select(F.col(id_col).alias("doc_b"), F.col("set_size").alias("size_b"))
    verified = (
        inter.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
                6,
            ),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "jaccard"
    )
