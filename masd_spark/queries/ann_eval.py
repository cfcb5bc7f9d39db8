"""ANN index evaluation: recall@k of every approximate index vs exact.

A meta-query composed from already-registered queries: the Spark side
runs each index's registered plan and joins its top-10 against the
exact brute-force top-10; the DuckDB oracle composes the SAME
sub-oracles as subqueries. Because each component is independently
hash-verified, this report's oracle is derivative — but it pins the
measurement methodology itself (pair-joined hits over exact-pair
denominator), which is what an index user actually reads.

Import-order note: this module must load AFTER queries.similarity —
it reads the sub-oracle SQL out of the registry at import time.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from masd_spark.queries import REGISTRY, register

_EXACT = "ann_cosine_topk"
_METHODS = [
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_quantized_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
]


def _recall_oracle() -> str:
    exact_sql = REGISTRY[_EXACT].oracle
    parts = [f"WITH exact AS MATERIALIZED (SELECT query_id, vec_id FROM ({exact_sql}))"]
    unions = []
    for m in _METHODS:
        sub = REGISTRY[m].oracle
        parts.append(
            f""",
    hits_{m} AS MATERIALIZED (
        SELECT '{m}' AS method, CAST(count(*) AS BIGINT) AS hits
        FROM ({sub}) a JOIN exact e USING (query_id, vec_id)
    )"""
        )
        unions.append(f"SELECT * FROM hits_{m}")
    u = " UNION ALL ".join(unions)
    parts.append(
        f"""
    SELECT method,
           ROUND(hits / (SELECT count(*) FROM exact), 6) AS recall_at_10
    FROM ({u})
    """
    )
    return "".join(parts)


@register("ann_recall_report", oracle=_recall_oracle())
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of each approximate ANN index against the exact
    brute-force neighbors, one row per index. Methodology: count
    (query, neighbor) pairs shared with the exact top-10, divide by the
    exact pair count — the denominator is n_queries * k by construction
    since the exact query always fills k. Each sub-plan is the index's
    REGISTERED plan (not a rebuild), so this measures what users run;
    at scale the report costs the sum of its parts, all of which are
    bucket/cell/scan-bounded by design.
    """
    # Optimization r8 (guide §2.4/§3.1): the exact ground-truth subtree
    # used to be re-planned and re-executed per method join PLUS the
    # denominator (6x the brute-force scan+rank). Materialize its
    # n_queries*k rows once; a checkpointed LogicalRDD has no usable
    # size estimate, so broadcast it explicitly into each method join
    # (removes both per-join exchanges).
    # Optimization r9 (guide §2.4/§2.6): all six legs now share ONE
    # materialized valid-vector corpus (each method re-planned and
    # re-scanned its own parquet + validity-filter lineage before), via
    # the same ANN_LEGS helpers the registered queries delegate to — so
    # each leg's rows are the registered query's by construction. The 5
    # approximate legs are CONSTRUCTED from a small thread pool: building
    # an index leg runs driver-side actions (IVF centroid sample, PQ
    # codebook training collects) that were strictly sequential; the
    # scheduler back-fills each leg's small jobs into the others' idle
    # tails. Each leg is deterministic, so construction order cannot
    # change any row.
    from concurrent.futures import ThreadPoolExecutor

    from masd_spark.operators.similarity import valid_vectors
    from masd_spark.queries.similarity import ANN_LEGS
    from masd_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    va = (
        valid_vectors(emb, "vec_id", "embedding")
        .select("vec_id", "embedding")
        .localCheckpoint(eager=True)
    )
    exact_pairs = (
        ANN_LEGS[_EXACT](va).select("query_id", "vec_id")
        .localCheckpoint(eager=True)
    )

    def leg(m: str) -> DataFrame:
        approx = ANN_LEGS[m](va).select("query_id", "vec_id")
        return (
            approx.join(F.broadcast(exact_pairs), ["query_id", "vec_id"])
            .agg(F.count("*").alias("hits"))
            .select(F.lit(m).alias("method"), "hits")
        )

    with ThreadPoolExecutor(max_workers=len(_METHODS)) as pool:
        per_method = list(pool.map(leg, _METHODS))
    union = reduce(DataFrame.unionAll, per_method)
    denom = exact_pairs.agg(F.count("*").alias("n_exact"))
    return union.crossJoin(F.broadcast(denom)).select(
        "method",
        # NULL (not an ANSI DIVIDE_BY_ZERO abort) when there is no exact
        # ground truth — empty corpus — matching DuckDB's x/0 -> NULL
        F.round(
            F.try_divide(F.col("hits"), F.col("n_exact")), 6
        ).alias("recall_at_10"),
    )
