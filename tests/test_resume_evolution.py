"""Exactly-once resume (SURVEY §5.3) and additive schema evolution (§5.4),
driven through the WAL-directory source like a real deployment."""

from __future__ import annotations

import pandas as pd
import pytest

from cnpj_data_pipeline_spark import EngineConfig, IngestJob, LakeTable
from cnpj_data_pipeline_spark.gen import epoch_batches, gen_changes
from cnpj_data_pipeline_spark.oracle import final_state
from cnpj_data_pipeline_spark.sources import change_stream as cs


def test_crash_resume_no_dup_no_loss(spark, tmp_path):
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    n_epochs = 4
    ch = gen_changes(
        spark, n_events=6_000, n_convs=200, n_epochs=n_epochs, late_ratio=0.05, dup_ratio=0.03
    )
    for e, b in epoch_batches(ch, n_epochs):
        cs.write_epoch(b, wal, e)

    job = IngestJob(lake, EngineConfig(n_buckets=16))
    with pytest.raises(RuntimeError, match="injected failure"):
        job.run_stream(spark, wal, fail_after=2)

    table = LakeTable.load(lake)
    assert sorted(table.applied_epochs()) == [0, 1]

    # resume applies exactly the pending epochs
    m = job.run_stream(spark, wal)
    assert [x["epoch"] for x in m] == [2, 3]
    assert not any(x["skipped"] for x in m)

    # a third run has nothing to do
    assert job.run_stream(spark, wal) == []

    final = (
        table.read(spark).orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    )
    golden = final_state(ch.toPandas())
    pd.testing.assert_frame_equal(final, golden, check_dtype=False)


def test_schema_evolution_mid_stream(spark, tmp_path):
    lake = str(tmp_path / "lake")
    n_epochs = 4
    ch = gen_changes(
        spark, n_events=4_000, n_convs=150, n_epochs=n_epochs, evolve_at_epoch=2
    )
    job = IngestJob(lake, EngineConfig(n_buckets=8))
    job.run_batches(spark, epoch_batches(ch, n_epochs, drop_evolved_before=2))
    table = LakeTable.load(lake)

    # final schema is the union; pre-evolution snapshot lacks the column
    assert table.schema().fieldNames() == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts", "tool_meta",
    ]
    snaps = table.snapshots()
    pre = [s for s in snaps if s["epoch"] == 1][0]
    assert "tool_meta" not in [
        f["name"]
        for f in __import__("json").loads(pre["schema"])["fields"]
    ]
    evolved_ops = [s["op"] for s in snaps]
    assert "evolve" in evolved_ops

    final = (
        table.read(spark).orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    )
    # the generator nulls tool_meta for pre-evolution events, so the oracle's
    # golden state already encodes "column did not exist before epoch 2"
    golden = final_state(ch.toPandas())
    assert list(final.columns) == list(golden.columns)
    pd.testing.assert_frame_equal(final, golden, check_dtype=False)
    assert final["tool_meta"].notna().any()


def test_parallelism_invariance(spark, tmp_path):
    """Same input, different shuffle partitioning → bit-identical table
    (stand-in for local[8] vs local[32] full-job runs, which bench.py does
    as separate processes)."""
    ch = gen_changes(spark, n_events=3_000, n_convs=100, n_epochs=2, skew=2.0)
    outs = []
    for i, parts in enumerate((2, 16)):
        lake = str(tmp_path / f"lake{i}")
        cfg = EngineConfig(n_buckets=8, salt_factor=1 + i * 3)
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            job = IngestJob(lake, cfg)
            job.run_batches(spark, epoch_batches(ch, 2))
            outs.append(
                LakeTable.load(lake)
                .read(spark)
                .orderBy("conv_id", "turn_idx")
                .toPandas()
                .reset_index(drop=True)
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_lag_summary_metadata_only(spark, tmp_path):
    """Per-partition lag: WAL frontier vs bucket watermarks, from footers +
    manifest only. After applying half the WAL, lag is positive; after
    draining, zero."""
    from cnpj_data_pipeline_spark import EngineConfig, IngestJob
    from cnpj_data_pipeline_spark.gen import epoch_batches, gen_changes
    from cnpj_data_pipeline_spark.sources.change_stream import write_epoch

    wal = str(tmp_path / "wal")
    ch = gen_changes(spark, n_events=2_000, n_convs=100, n_epochs=2)
    for e, b in epoch_batches(ch, 2):
        write_epoch(b, wal, e)
    job = IngestJob(str(tmp_path / "lake"), EngineConfig(n_buckets=4))
    try:
        job.run_stream(spark, wal, fail_after=1)
    except RuntimeError:
        pass
    lag = job.lag_summary(wal)
    assert lag["pending_epochs"] == [1]
    assert lag["wal_frontier_lsn"] is not None
    assert lag["max_lag"] > 0

    job.run_stream(spark, wal)
    lag = job.lag_summary(wal)
    assert lag["pending_epochs"] == []
    assert lag["wal_frontier_lsn"] is None
    assert lag["max_lag"] == 0
