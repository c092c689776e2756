"""Custom stateful streaming operator: per-conversation running state via
``applyInPandasWithState`` (SURVEY §2.9/§2.10 — the arbitrary-stateful shape
Structured Streaming offers beyond windowed aggs).

The engine's exactly-once sink keeps its state in the lake table itself (the
right design for the CDC path); this operator covers the OTHER stateful
need a transcript stream has: live per-conversation counters/watermarks
(events seen, highest LSN, latest ts) maintained across micro-batches in the
streaming state store, Arrow-batched, no per-row Python.

Semantics: state is additive and batching-invariant — after an
``availableNow`` drain the final emission per conversation equals the batch
aggregate over the whole WAL, which is the oracle the gate checks.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("max_lsn", T.LongType(), False),
        T.StructField("last_ts", T.TimestampType(), True),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("max_lsn", T.LongType(), False),
        T.StructField("last_ts", T.TimestampType(), True),
    ]
)


def _update_conv_state(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    """Arrow-vectorized state update: per micro-batch, fold the group's rows
    into (count, max_lsn, last_ts) and emit the running value."""
    if state.exists:
        n, mx, last = state.get
    else:
        n, mx, last = 0, -1, None
    for pdf in pdfs:
        n += len(pdf)
        mx = max(mx, int(pdf["lsn"].max()))
        ts_max = pdf["ts"].max()
        last = ts_max if last is None else max(last, ts_max)
    state.update((n, mx, last))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_events": [n],
            "max_lsn": [mx],
            "last_ts": [last],
        }
    )


def stream_conv_state(
    spark: SparkSession,
    stream_root: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
    max_files_per_trigger: int = 3,
):
    """Tail the WAL maintaining per-conversation state; every micro-batch's
    running emissions are appended to ``out_dir`` (parquet). Returns the
    started query (availableNow — drains and stops)."""
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_root)
    )
    updates = src.groupBy("conv_id").applyInPandasWithState(
        _update_conv_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    return (
        updates.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def final_conv_state(spark: SparkSession, out_dir: str) -> DataFrame:
    """Collapse the appended running emissions to each conversation's final
    state: counters grow monotonically, so the max per conv IS the final."""
    return (
        spark.read.parquet(out_dir)
        .groupBy("conv_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("max_lsn").alias("max_lsn"),
            F.max("last_ts").alias("last_ts"),
        )
    )
