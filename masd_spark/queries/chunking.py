"""Chunking harness queries — value-checked against DuckDB recomputing
the identical token-window arithmetic (string_split_regex + list slices).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from masd_spark.operators.chunking import (
    chunk_dedup_stats,
    chunk_documents,
    chunk_documents_udtf,
)
from masd_spark.queries import register
from masd_spark.sources.tables import load_table

_CHUNK, _OVERLAP = 32, 8
_STEP = _CHUNK - _OVERLAP


# One oracle, two Spark routes: the expression-only chunker and its
# Spark 4 Python-UDTF twin register against the IDENTICAL SQL, so the
# driver's value hash proves the table-function extension point agrees
# with the built-in row-for-row.
_CHUNK_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts
        FROM documents WHERE length(trim(text)) > 0
    ),
    s AS (
        SELECT doc_id, ts,
               unnest(generate_series(1, len(ts), {_STEP})) AS start
        FROM t
    )
    SELECT doc_id,
           CAST((start - 1) // {_STEP} AS BIGINT) AS chunk_index,
           CAST(least(start + {_CHUNK - 1}, len(ts)) - start + 1 AS BIGINT)
               AS n_chunk_tokens,
           array_to_string(ts[start : least(start + {_CHUNK - 1}, len(ts))], ' ')
               AS chunk_text
    FROM s
    """


@register("chunk_documents_overlap", oracle=_CHUNK_ORACLE)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: 32-token chunks, 8-token overlap (stride
    24) — the RAG/pretraining context splitter. Row-local explode, no
    shuffle; output rows ∝ corpus tokens / stride.
    """
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(
        docs.select("doc_id", "text"), chunk_size=_CHUNK, overlap=_OVERLAP
    ).select("doc_id", "chunk_index", "n_chunk_tokens", "chunk_text")


@register("chunk_documents_udtf", oracle=_CHUNK_ORACLE)
def chunk_documents_udtf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same sliding-window chunking through the Spark 4 Python-UDTF
    extension point (SQL ``LATERAL``, ArrowEvalPythonUDTF) — API-surface
    parity for custom row-to-rows operators that plain expressions can't
    state; same oracle as the built-in twin, so the driver hash-checks
    that both routes agree. Python in the loop => NOT the hot-path
    choice; see operators/chunking.py:chunk_documents_udtf.
    """
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents_udtf(
        docs.select("doc_id", "text"), chunk_size=_CHUNK, overlap=_OVERLAP
    )


@register(
    "chunk_dedup_stats",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts
        FROM documents
        WHERE length(trim(text)) > 0
          AND doc_id IS NOT NULL  -- chunk_dedup_stats' contract
    ),
    c AS (
        SELECT doc_id,
               (start - 1) // 8 AS chunk_index,
               md5(array_to_string(ts[start : least(start + 7, len(ts))], ' ')) AS fp
        FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts), 8)) AS start
              FROM t)
    ),
    r AS (
        SELECT doc_id, fp,
               row_number() OVER (PARTITION BY fp
                                  ORDER BY doc_id, chunk_index) AS rn
        FROM c
    )
    SELECT doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_chunks
    FROM r GROUP BY doc_id
    """,
)
def chunk_dedup_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup: 8-token non-overlapping chunks, first
    corpus-wide occurrence of each fingerprint survives — catches repeated
    boilerplate inside otherwise-distinct documents, which document-level
    dedup misses. One fingerprint-keyed shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    return chunk_dedup_stats(docs.select("doc_id", "text"), chunk_size=8)
