"""Oracle parity + behavioral checks for text analysis and dedup."""

import pytest
from pyspark.sql import functions as F

from masd_spark.queries import load_all
from tests.conftest import SF_ORACLE
from tests.oracle import compare_query

REGISTRY = load_all()

ORACLE_QUERIES = [
    "text_quality_features",
    "text_language_id",
    "text_simhash",
    "text_fingerprint",
    "dedup_exact_docs",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    compare_query(spark, REGISTRY[name], SF_ORACLE)


def test_quality_features_empty_and_whitespace_docs(spark):
    """ANSI divide-by-zero guard: empty / whitespace-only docs must yield
    n_tokens = 0 and null ratios, not a DIVIDE_BY_ZERO error."""
    from masd_spark.operators.text import quality_features

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "two words")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in quality_features(df).collect()}
    assert rows[1]["n_tokens"] == 0 and rows[2]["n_tokens"] == 0
    assert rows[1]["mean_token_len"] is None and rows[2]["mean_token_len"] is None
    assert rows[1]["alpha_ratio"] is None  # length 0
    assert rows[2]["alpha_ratio"] == 0.0  # whitespace has length > 0, 0 alpha
    assert rows[3]["n_tokens"] == 2 and rows[3]["mean_token_len"] == 4.0


def test_minhash_recall_against_exact(spark):
    """LSH must find every high-jaccard pair at fixture scale (the planted
    near-dups are >=0.9 jaccard where 16/4 banding has ~certain recall).
    """
    exact = REGISTRY["dedup_ngram_jaccard"].fn(spark, SF_ORACLE)
    lsh = REGISTRY["dedup_minhash_lsh"].fn(spark, SF_ORACLE)
    high = exact.filter(F.col("jaccard") >= 0.9).select("doc_a", "doc_b")
    n_high = high.count()
    assert n_high > 0, "fixture should contain planted near-dups"
    found = high.join(lsh, ["doc_a", "doc_b"], "left_semi").count()
    assert found == n_high, f"LSH missed {n_high - found} of {n_high} high-sim pairs"
