"""Bucketed co-located join: the fact-fact join plan has no shuffle
exchange on either side when both tables are bucketed on the join key."""

from pyspark.sql import functions as F

from masd_spark.operators.bucketing import read_table, write_bucketed
from masd_spark.plans.explain import count_exchanges, physical_plan
from masd_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(li, "li_bucketed", "l_orderkey", n_buckets=4)
    write_bucketed(orders, "ord_bucketed", "o_orderkey", n_buckets=4)

    lb = read_table(spark, "li_bucketed")
    ob = read_table(spark, "ord_bucketed")
    joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy("o_custkey").agg(
        F.count("*").alias("n")
    )
    # disable broadcast so the join strategy itself is exercised
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = physical_plan(joined)
        # join itself shuffle-free: the only exchange feeds the final
        # groupBy on o_custkey (a different key than the bucket key)
        assert count_exchanges(joined) <= 1, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS ord_bucketed")
