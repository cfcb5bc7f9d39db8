"""Oracle parity + invariants for document chunking."""

import pytest
from pyspark.sql import functions as F

from masd_spark.operators.chunking import chunk_documents
from masd_spark.queries import load_all
from masd_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE
from tests.oracle import compare_query

REGISTRY = load_all()


@pytest.mark.parametrize(
    "name",
    ["chunk_documents_overlap", "chunk_documents_udtf", "chunk_dedup_stats"],
)
def test_oracle_parity(spark, name):
    compare_query(spark, REGISTRY[name], SF_ORACLE)


def test_chunk_reconstruction_no_overlap(spark):
    """With overlap=0, joining every chunk back in index order must
    reproduce the (whitespace-normalized) document exactly."""
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    rebuilt = (
        chunk_documents(docs, chunk_size=16, overlap=0)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_index", "chunk_text"))
                ).getField("chunk_text"),
                " ",
            ).alias("rebuilt")
        )
    )
    orig = docs.select(
        "doc_id", F.regexp_replace(F.trim("text"), r"\s+", " ").alias("norm")
    )
    n_bad = (
        rebuilt.join(orig, "doc_id")
        .filter(F.col("rebuilt") != F.col("norm"))
        .count()
    )
    assert n_bad == 0


def test_chunk_sizes_and_overlap(spark):
    """Each chunk has exactly min(chunk_size, n_tokens - start + 1)
    tokens (start = chunk_index * stride + 1); with overlap, consecutive
    chunks share the configured suffix/prefix."""
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    ch = chunk_documents(docs, chunk_size=12, overlap=4)  # stride 8
    n_tok = docs.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    )
    expected = F.least(
        F.lit(12), F.col("n_tokens") - (F.col("chunk_index") * 8 + 1) + 1
    )
    bad = (
        ch.join(n_tok, "doc_id")
        .filter(F.col("n_chunk_tokens") != expected)
        .count()
    )
    assert bad == 0
    # overlap check on one document
    row = (
        ch.filter(F.col("chunk_index").isin(0, 1))
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("chunk_index", "chunk_text")).alias("cs"))
        .filter(F.size("cs") == 2)
        .limit(1)
        .collect()
    )
    assert row, "no multi-chunk document in fixture"
    cs = sorted(row[0]["cs"], key=lambda r: r["chunk_index"])
    t0, t1 = cs[0]["chunk_text"].split(" "), cs[1]["chunk_text"].split(" ")
    assert t0[-4:] == t1[:4]  # shared overlap region


def test_chunk_rejects_bad_overlap(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=8, overlap=8)


def test_chunking_plan_is_shuffle_free(spark):
    from masd_spark.plans.explain import physical_plan

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    plan = physical_plan(chunk_documents(docs, chunk_size=32, overlap=8))
    assert "Exchange" not in plan, plan
