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
