"""Pipeline quality metrics via the Observation API — counters that ride
the existing action instead of paying a second scan.

The reference computes its valid/malformed tallies as part of the main
aggregation (reference: spark-app/consumer.py:120-142 carries total/
valid/malformed columns through the groupBy); that works when the
metrics share the query's grain. ``df.observe`` covers the other case —
whole-input counters on a query whose OUTPUT grain is something else —
by folding accumulator-style aggregates into the same physical plan:
zero extra jobs, zero extra scans, exact values for the rows the action
actually processed. On a 100 TB run that difference is a full second
pass over the input.

Batch: ``Observation.get`` blocks until the action finishes. Streaming:
pass a plain name string and read ``observedMetrics`` off each
``StreamingQueryProgress`` (per micro-batch; see
tests/test_observe.py::test_streaming_observed_metrics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def quality_metrics(
    df: DataFrame,
    *,
    value_col: str = "value_numeric",
    flag_col: str = "is_valid",
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach ingest-quality counters to a classified-readings frame
    (operators/validate.py:classify_validity shape): total rows, valid /
    malformed counts, and min/max of the numeric value over valid rows.

    Returns ``(df, observation)`` — run any action on a descendant of
    ``df``, then ``observation.get`` yields the metrics for exactly the
    rows that action consumed. The aggregates are all algebraic
    (count/sum/min/max), the class Spark can fold into a plan as
    accumulators without changing its shape.
    """
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col(flag_col).cast("long")).alias("n_valid"),
        F.sum((~F.col(flag_col)).cast("long")).alias("n_malformed"),
        F.min(F.when(F.col(flag_col), F.col(value_col))).alias("valid_min"),
        F.max(F.when(F.col(flag_col), F.col(value_col))).alias("valid_max"),
    )
    return observed, obs
