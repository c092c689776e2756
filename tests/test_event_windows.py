"""Event-time windowed aggregation under watermark late-data policy.

Two halves of one contract:
  * q_event_time_windows (queries/relational.py) — the batch-explicit,
    DuckDB-checkable replay of the watermark rule (gated by the driver).
  * this file — Spark's NATIVE `withWatermark` + `window()` streaming path
    over controlled micro-batches, asserting the engine's own append-mode
    finalize/drop behavior matches the policy the query states.
"""

from __future__ import annotations

import datetime as dt
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _write_batch(d: str, name: str, rows: list[tuple[dt.datetime, str]], mtime: float):
    tbl = pa.table(
        {
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "k": pa.array([r[1] for r in rows]),
        }
    )
    p = os.path.join(d, name)
    pq.write_table(tbl, p)
    os.utime(p, (mtime, mtime))


def test_native_watermark_append_finalizes_and_drops_late(spark, tmp_path):
    """3 micro-batches, 1-day tumbling windows, 1h watermark delay:
    - batch 1: two day-1 events
    - batch 2: a day-2 event → watermark after it passes day-1's window end,
      so the day-1 window finalizes and emits with count 2
    - batch 3: a day-3 event plus a LATE day-1 event (window already closed)
      → the late arrival is dropped by the engine; the trailing no-data
      batch advances the watermark to (day-3 06:00 − 1h), finalizing day-2;
      day-3's window (not yet past the watermark) never emits.

    Batch order is made deterministic by draining ONE file per availableNow
    run against a persistent checkpoint (the watermark is checkpointed
    across restarts) — the file source does not guarantee mtime-ordered
    slicing under maxFilesPerTrigger when several files are pending."""
    stream_dir = str(tmp_path / "stream")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stream_dir)
    t0 = time.time() - 100
    d = dt.datetime
    batches = [
        ("b0.parquet", [(d(2024, 1, 1, 6), "a"), (d(2024, 1, 1, 12), "b")]),
        ("b1.parquet", [(d(2024, 1, 2, 6), "c")]),
        ("b2.parquet", [(d(2024, 1, 3, 6), "e"), (d(2024, 1, 1, 1), "late")]),
    ]

    emitted: list = []

    def _sink(batch_df, _bid: int):
        emitted.extend(
            (r["window"]["start"], r["n"]) for r in batch_df.collect()
        )

    for i, (name, rows) in enumerate(batches):
        _write_batch(stream_dir, name, rows, t0 + 10 * i)
        agg = (
            spark.readStream.schema("ts timestamp, k string")
            .parquet(stream_dir)
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.foreachBatch(_sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    assert sorted(emitted) == [
        (d(2024, 1, 1), 2),  # late day-1 arrival dropped: 2, not 3
        (d(2024, 1, 2), 1),  # finalized by the final no-data batch
    ]


def test_query_policy_totals(spark):
    """The batch-explicit replay's invariants: kept + dropped = |events|,
    drops only happen to permuted-late traffic, and the window set covers
    the stream's full time span."""
    from cnpj_data_pipeline_spark.queries.relational import (
        WM_BATCH,
        WM_SHIFT,
        q_event_time_windows,
    )

    out = q_event_time_windows(spark, SF_DIR)
    tot = out.agg(
        F.sum("n_events").alias("kept"), F.sum("n_dropped").alias("dropped")
    ).first()
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    n = ev.count()
    assert tot["kept"] + tot["dropped"] == n
    assert 0 < tot["dropped"] < n * 0.05  # only the ~4% permuted-late slice
    # every dropped event is one the permutation shifted late
    n_shifted = ev.filter(F.expr(f"({WM_SHIFT}) > 0")).count()
    assert tot["dropped"] <= n_shifted
    assert WM_BATCH == 100  # oracle SQL and engine share the constant
