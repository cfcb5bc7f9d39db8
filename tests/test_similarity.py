"""Oracle parity for exact ANN; recall measurement for the LSH variant."""

import pytest
from pyspark.sql import functions as F

from masd_spark.queries import load_all
from tests.conftest import SF_ORACLE
from tests.oracle import compare_query

REGISTRY = load_all()


def test_ann_cosine_topk_parity(spark):
    compare_query(spark, REGISTRY["ann_cosine_topk"], SF_ORACLE)


def test_lsh_topk_recall(spark):
    """LSH top-k is approximate; recall vs brute force must be non-trivial
    and every returned neighbor must be a genuine bucket-mate with correct
    cosine (verified implicitly: scores match the exact query's on
    overlapping (query, vec) pairs).
    """
    exact = REGISTRY["ann_cosine_topk"].fn(spark, SF_ORACLE).cache()
    approx = REGISTRY["ann_lsh_topk"].fn(spark, SF_ORACLE).cache()
    overlap = exact.join(approx, ["query_id", "vec_id"], "inner")
    n_exact = exact.count()
    n_overlap = overlap.count()
    assert n_exact > 0
    # cosine scores agree where both returned the pair
    mismatched = overlap.filter(
        F.abs(exact["cos_sim"] - approx["cos_sim"]) > 1e-9
    ).count()
    assert mismatched == 0
    recall = n_overlap / n_exact
    assert recall >= 0.2, f"LSH recall {recall:.2f} suspiciously low"
