"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no custom state (its only stateful op is the built-in
windowed aggregation, consumer.py:127-139). An LLM-scale ingest pipeline
needs operators whose state is NOT expressible as a built-in streaming
aggregate — the canonical example implemented here is a per-key EWMA: an
order-sensitive fold over event time, carried across micro-batches in
explicit GroupState. Spark's agg functions are commutative merges and
cannot express it incrementally.

Scale shape: state lives partitioned by the group key in the state store
(one shuffle per micro-batch, same as any streaming agg); each group's
batch slice crosses to Python ONCE per trigger as Arrow record batches —
cost is per-row-ish but only over the incremental batch, never the
history. Ordering contract: correct EWMA values require batches to arrive
in event-time order per key (e.g. time-split file drops or a Kafka topic
keyed and time-ordered per partition); within a batch the operator sorts
by timestamp itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

EWMA_OUTPUT_SCHEMA = (
    "station_id string, sensor_id string, n_valid long, ewma double"
)
EWMA_STATE_SCHEMA = "n_valid long, ewma double"


def streaming_sensor_ewma(readings: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Per-(station, sensor) exponentially weighted moving average of the
    valid readings, updated every micro-batch.

    ``readings`` must carry station_id, sensor_id, timestamp (epoch ms)
    and the classify_validity columns (value_numeric, is_valid). Emits one
    row per key per trigger with the running (n_valid, ewma).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        if state.exists:
            n, ew = state.get
        else:
            n, ew = 0, None
        # Arrow may split one group's batch slice into several chunks
        # (arrow.maxRecordsPerBatch); the fold is order-sensitive, so
        # materialize the whole slice and sort ONCE before folding.
        chunks = [pdf for pdf in pdf_iter]
        batch = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        valid = batch[batch["is_valid"]].sort_values("timestamp", kind="stable")
        for v in valid["value_numeric"]:
            v = float(v)
            ew = v if ew is None else alpha * v + (1.0 - alpha) * ew
            n += 1
        state.update((n, ew))
        yield pd.DataFrame(
            [{"station_id": key[0], "sensor_id": key[1], "n_valid": n, "ewma": ew}]
        )

    return readings.groupBy("station_id", "sensor_id").applyInPandasWithState(
        update,
        EWMA_OUTPUT_SCHEMA,
        EWMA_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
