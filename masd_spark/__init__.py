"""masd_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference system omartrj/MASD
(sensor-stream windowed aggregation: Kafka -> Spark Structured Streaming ->
keyed document sink), generalized into a reusable batch+streaming operator
library and extended with large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Design rules (Spark-first, 100 TB-scale):
- DataFrame/SQL API only; Catalyst does pushdown/pruning/join planning.
- Built-in ``pyspark.sql.functions`` in every hot path; Pandas UDFs only
  where Spark lacks a primitive (none of the reference ops need one).
- Every operator is a pure ``DataFrame -> DataFrame`` function, usable in
  both batch and Structured Streaming plans.
"""

from masd_spark.session import get_spark, ensure_io_confs

__all__ = ["get_spark", "ensure_io_confs"]
