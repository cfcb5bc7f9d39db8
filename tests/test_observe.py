"""Observation-API metrics (operators/observe.py): exact counters that
ride the action, batch and streaming."""

from pyspark.sql import functions as F

from masd_spark.operators.observe import quality_metrics
from masd_spark.operators.validate import classify_validity
from masd_spark.sources.pyds import SOURCE_NAME, gen_rows, register_sensor_source


def test_batch_quality_metrics_match_recount(spark):
    raw = spark.createDataFrame(
        [("1.5",), ("2.0",), ("oops",), (None,), ("-3.25",), ("nan?",)],
        "value string",
    )
    classified = classify_validity(raw, value_col="value")
    observed, obs = quality_metrics(classified)

    # the action the metrics piggyback on: a full materialization
    observed.write.mode("overwrite").format("noop").save()
    m = obs.get
    assert m["n_total"] == 6
    assert m["n_valid"] == 3
    assert m["n_malformed"] == 3
    assert m["valid_min"] == -3.25
    assert m["valid_max"] == 2.0

    # recount independently
    direct = classified.agg(
        F.sum(F.col("is_valid").cast("long")).alias("v")
    ).collect()[0]["v"]
    assert direct == m["n_valid"]


def test_streaming_observed_metrics(spark, tmp_path):
    """Streaming observe: per-micro-batch metrics surface on
    StreamingQueryProgress; summed across batches they must equal the
    whole feed — 1000 rows, exact temperature sum."""
    register_sensor_source(spark)
    stream = (
        spark.readStream.format(SOURCE_NAME)
        .option("rows_per_batch", "400")
        .option("max_rows", "1000")
        .load()
    )
    observed = stream.observe(
        "feed_obs",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("temp_c100").alias("temp_sum"),
    )
    q = (
        observed.writeStream.format("memory")
        .queryName("observe_feed")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    totals = {"n_rows": 0, "temp_sum": 0}
    for progress in q.recentProgress:
        om = progress.observedMetrics.get("feed_obs")
        if om is not None and om["n_rows"] is not None:
            totals["n_rows"] += om["n_rows"]
            totals["temp_sum"] += om["temp_sum"]
    expected = list(gen_rows(0, 1000))
    assert totals["n_rows"] == 1000
    assert totals["temp_sum"] == sum(r[3] for r in expected)
