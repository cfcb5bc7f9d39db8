"""Streaming state observability: read a query's state store as a
DataFrame (Spark's ``statestore`` / ``state-metadata`` data sources).

The reference's only visibility into its streaming state is print
debugging of each micro-batch (reference: spark-app/consumer.py:164-183
prints batch contents); this module gives the operational answer a
production pipeline needs — *what is the engine currently carrying per
key, and how big is it* — without touching the running query: the state
data source reads the checkpoint's store files directly (snapshot +
delta replay), so inspection is an ordinary batch job that scales with
state size, not stream history. ``batch_id`` time-travels to any
retained micro-batch version — the state twin of a lakehouse table's
VERSION AS OF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Per-operator state inventory of a query checkpoint: operator
    id/name, store name, shuffle partition count, retained batch range.
    The first stop for "why is my checkpoint huge" — it enumerates every
    store the query maintains (joins keep four per side)."""
    return spark.read.format("state-metadata").load(checkpoint)


def read_state(
    spark: SparkSession,
    checkpoint: str,
    *,
    operator_id: int = 0,
    store_name: str | None = None,
    state_var_name: str | None = None,
    batch_id: int | None = None,
    flatten: bool = True,
) -> DataFrame:
    """State rows of one operator's store: ``key`` / ``value`` structs
    plus the owning shuffle ``partition_id``. ``batch_id`` selects a
    historical version (default: latest committed). ``flatten`` splays
    the key/value struct leaves into top-level columns (prefixed on name
    collision) for direct joins against batch twins.

    ``state_var_name`` is REQUIRED for transformWithStateInPandas
    operators (this package's heavy-hitters / timer-sessions): their
    checkpoints hold one store per named state variable (e.g.
    ``sensor_counts``, ``open_session``) and Spark's statestore source
    refuses to read them without the ``stateVarName`` option. Map-state
    variables surface extra columns (``user_map_key``/``user_map_value``
    on Spark 4.1); flatten handles whatever struct columns are present.
    """
    reader = spark.read.format("statestore").option("operatorId", operator_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if state_var_name is not None:
        reader = reader.option("stateVarName", state_var_name)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    df = reader.load(checkpoint)
    if not flatten:
        return df
    top = set(df.schema.names)
    if "key" not in top or "value" not in top:
        # TWS variable shapes (e.g. map state) differ from the classic
        # key/value pair; flatten every struct column generically instead
        from pyspark.sql.types import StructType

        cols = []
        for field in df.schema.fields:
            if isinstance(field.dataType, StructType):
                for leaf in field.dataType.names:
                    cols.append(df[field.name][leaf].alias(f"{field.name}_{leaf}"))
            else:
                cols.append(df[field.name])
        return df.select(*cols)
    key_fields = df.schema["key"].dataType.names
    val_fields = df.schema["value"].dataType.names
    cols = []
    for f in key_fields:
        name = f if f not in val_fields else f"key_{f}"
        cols.append(df["key"][f].alias(name))
    for f in val_fields:
        name = f if f not in key_fields else f"value_{f}"
        cols.append(df["value"][f].alias(name))
    cols.append(df["partition_id"])
    return df.select(*cols)
