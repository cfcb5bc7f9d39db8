"""Bucketed (pre-partitioned) tables: the shuffle-free co-located join.

At 100 TB the dominant cost of a fact-fact join (lineitem |x| orders) is
shuffling both sides on the key. Bucketing writes each table hash-
partitioned into N buckets on the join key; a later join of two tables
bucketed the same way needs NO exchange on either side — Spark reads
bucket i of both tables into the same task.

This is a write-time contract, not a hint: it only pays off when the
table is joined on its bucket key many times (the norm for fact tables in
a lakehouse). tests/test_plans.py asserts the no-exchange plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Save as a bucketed (optionally sorted) managed table. Sorting within
    buckets additionally removes the sort from later sort-merge joins."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
