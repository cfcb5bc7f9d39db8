"""Document chunking — the context-window splitter of an LLM pipeline.

The reference has no long-document handling (sensor messages are tiny);
a training/RAG pipeline needs documents cut into fixed token-budget
chunks with configurable overlap, and dedup applied at CHUNK granularity
(boilerplate paragraphs repeat across pages even when whole documents
differ).

Scale shapes: chunking is a row-local explode — tokens never leave the
row, output is proportional to corpus token count, no shuffle.
Chunk-level dedup adds exactly one shuffle keyed by chunk fingerprint
(same cost class as exact doc dedup, on ~(doc_len/chunk) x more, much
smaller rows). Whitespace tokenization mirrors operators/text.py; the
fingerprint is md5 so the DuckDB oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into whitespace-token chunks of ``chunk_size``
    tokens, consecutive chunks sharing ``overlap`` tokens (stride =
    chunk_size - overlap). Emits one row per chunk: the input columns
    minus ``text_col`` plus chunk_index (0-based), n_chunk_tokens,
    chunk_text. Empty/whitespace-only documents produce no chunks; the
    final chunk may be short (no padding).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    step = chunk_size - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    starts = F.sequence(F.lit(1), F.size("_toks"), F.lit(step))
    chunk = F.slice("_toks", F.col("_start"), chunk_size)
    return (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .withColumn("_toks", toks)
        .select(
            *[c for c in df.columns if c != text_col],
            "_toks",
            F.posexplode(starts).alias("chunk_index", "_start"),
        )
        .withColumn("chunk_index", F.col("chunk_index").cast("bigint"))
        .withColumn("n_chunk_tokens", F.size(chunk).cast("bigint"))
        .withColumn("chunk_text", F.array_join(chunk, " "))
        .drop("_toks", "_start")
    )


def chunk_documents_udtf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 0,
) -> DataFrame:
    """:func:`chunk_documents` expressed as a Spark 4 Python UDTF — the
    user-defined TABLE FUNCTION route (SQL ``LATERAL udtf(...)``), kept
    as deliberate API-surface parity: a user who extends the engine with
    a custom row-to-rows operator that plain expressions can't state
    (stateful tokenizers, model-driven splitters) needs this extension
    point, and registering it against the SAME oracle as the built-in
    twin proves the two routes agree row-for-row.

    Arrow-optimized (``useArrow=True`` -> ArrowEvalPythonUDTF, batched
    Arrow transfer) — NOT a row-at-a-time BatchEvalPython node, per the
    repo-wide plan lint. Still Python-side work per token, so the
    expression-only :func:`chunk_documents` remains the hot-path choice;
    this is the documented pattern for logic that genuinely needs
    Python. Scale: embarrassingly row-parallel, no shuffle, output
    proportional to corpus tokens / stride — same shape as the built-in.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    import re as _re

    from pyspark.sql.functions import udtf

    step = chunk_size - overlap

    @udtf(
        returnType="chunk_index bigint, n_chunk_tokens bigint, chunk_text string",
        useArrow=True,
    )
    class _ChunkText:
        def eval(self, text):
            if text is None:
                return
            t = text.strip()
            if not t:
                return
            ts = _re.split(r"\s+", t)
            for idx, start in enumerate(range(0, len(ts), step)):
                chunk = ts[start : start + chunk_size]
                yield idx, len(chunk), " ".join(chunk)

    spark = df.sparkSession
    spark.udtf.register("masd_chunk_text", _ChunkText)
    df.select(id_col, text_col).createOrReplaceTempView("_masd_udtf_docs")
    return spark.sql(
        f"""
        SELECT d.{id_col}, c.chunk_index, c.n_chunk_tokens, c.chunk_text
        FROM _masd_udtf_docs d, LATERAL masd_chunk_text(d.{text_col}) c
        """
    )


def chunk_dedup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 8,
) -> DataFrame:
    """Chunk-level exact dedup (the paragraph-dedup move): fingerprint
    non-overlapping ``chunk_size``-token chunks, keep only the FIRST
    occurrence of each fingerprint corpus-wide (ordered by (id, index)),
    and report per-document survival: n_chunks, n_kept_chunks.

    One shuffle keyed by the chunk fingerprint; reconstruction of the
    deduplicated text is array_join of surviving chunks downstream.

    Invalid-input contract: the keep-first election is ordered by
    (id, index), so a NULL id has no deterministic place in it (and sorts
    at opposite ends of the two engines' orderings) — null-id documents
    are EXCLUDED; oracle twins filter identically.
    """
    df = df.filter(F.col(id_col).isNotNull())
    chunks = chunk_documents(df, id_col, text_col, chunk_size, overlap=0)
    fp = F.md5(F.col("chunk_text"))
    w = Window.partitionBy("_fp").orderBy(id_col, "chunk_index")
    return (
        chunks.withColumn("_fp", fp)
        .withColumn("_rn", F.row_number().over(w))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("_rn") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept_chunks"),
        )
    )
