"""Salted join correctness: identical results to the plain join on a
deliberately skewed key distribution."""

from pyspark.sql import functions as F

from masd_spark.operators.skew import salted_join
from masd_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    # skew it: collapse 90% of supplier keys onto one hot key
    skewed = li.withColumn(
        "l_suppkey",
        F.when(F.col("l_orderkey") % 10 != 0, F.lit(1)).otherwise(F.col("l_suppkey")),
    )
    supp = load_table(spark, SF_SMOKE, "supplier").select("s_suppkey", "s_name")

    plain = skewed.join(supp, skewed.l_suppkey == supp.s_suppkey).groupBy(
        "s_name"
    ).agg(F.count("*").alias("n"), F.sum("l_quantity").cast("long").alias("q"))

    salted = salted_join(
        skewed.withColumnRenamed("l_suppkey", "s_suppkey"), supp, ["s_suppkey"]
    ).groupBy("s_name").agg(
        F.count("*").alias("n"), F.sum("l_quantity").cast("long").alias("q")
    )

    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_identical_duplicate_rows(spark):
    """The degenerate skew case: a hot key whose rows are BYTE-IDENTICAL.
    A content-hash salt maps all of them to one salt (no spread); the
    position-derived salt must fan them across >= n_salts/2 buckets."""
    n_salts = 8
    hot = spark.range(10_000).select(
        F.lit(1).alias("k"), F.lit("same-payload").alias("v")
    )
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    n_distinct = hot.withColumn("_salt", salt).select("_salt").distinct().count()
    assert n_distinct >= n_salts // 2, f"hot key spread over only {n_distinct} salts"


def test_salted_join_left_join_and_how_guard(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    right = spark.createDataFrame([(1, "x")], ["k", "w"])
    out = salted_join(left, right, ["k"], n_salts=4, how="left")
    rows = {(r["k"], r["w"]) for r in out.collect()}
    assert rows == {(1, "x"), (2, None), (3, None)}

    import pytest

    with pytest.raises(ValueError, match="outer"):
        salted_join(left, right, ["k"], how="full_outer")
    with pytest.raises(ValueError, match="outer"):
        salted_join(left, right, ["k"], how="right")
