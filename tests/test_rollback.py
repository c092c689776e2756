"""Rollback: bad-batch recovery — revert live state to a historical
snapshot, re-ingest corrected epochs exactly-once, keep the change feed
honest (windows spanning a rollback fail loudly)."""

from __future__ import annotations

import pandas as pd
import pytest

from cnpj_data_pipeline_spark import EngineConfig, IngestJob, LakeTable
from cnpj_data_pipeline_spark.gen import epoch_batches, gen_changes
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.oracle import final_state


def _ingest(spark, tmp_table, n_epochs=3):
    cfg = EngineConfig(n_buckets=8)
    ch = gen_changes(spark, n_events=3_000, n_convs=100, n_epochs=n_epochs)
    job = IngestJob(tmp_table, cfg)
    batches = list(epoch_batches(ch, n_epochs))
    return cfg, ch, job, batches


def test_rollback_restores_state_and_reingests_exactly_once(spark, tmp_table):
    cfg, ch, job, batches = _ingest(spark, tmp_table)
    job.run_batches(spark, batches[:2])
    table = LakeTable.load(tmp_table)
    good_sid = table.current_snapshot_id()
    good = (
        table.read(spark).orderBy("conv_id", "turn_idx").toPandas()
        .reset_index(drop=True)
    )

    # epoch 2 lands, then turns out to be poisoned — roll it back
    job.run_batches(spark, batches[2:])
    assert 2 in table.applied_epochs()
    rb_sid = table.rollback(good_sid)
    assert rb_sid == table.current_snapshot_id()

    after = (
        table.read(spark).orderBy("conv_id", "turn_idx").toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(after, good, check_dtype=False)
    assert 2 not in table.applied_epochs()

    # the bad snapshot stays time-travel readable until expired
    assert table.read(spark, snapshot_id=rb_sid - 1).count() > 0

    # re-ingest of the (corrected) epoch applies exactly-once and the final
    # state matches the oracle fold of the full stream
    m = job.run_batches(spark, batches[2:])
    assert not m[0]["skipped"]
    final = (
        table.read(spark).orderBy("conv_id", "turn_idx").toPandas()
        .reset_index(drop=True)
    )
    golden = final_state(ch.toPandas())
    pd.testing.assert_frame_equal(final, golden, check_dtype=False)

    # lineage records the rollback
    ops = [s["op"] for s in table.snapshots()]
    assert "rollback" in ops


def test_rollback_rejects_roll_forward_and_unknown(spark, tmp_table):
    _, _, job, batches = _ingest(spark, tmp_table, n_epochs=2)
    job.run_batches(spark, batches)
    table = LakeTable.load(tmp_table)
    head = table.current_snapshot_id()
    with pytest.raises(ValueError, match="roll forward"):
        table.rollback(head + 5)
    table.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        table.rollback(0)  # expired manifest


def test_describe_summarizes_layout_and_checkpoint(spark, tmp_table):
    _, _, job, batches = _ingest(spark, tmp_table, n_epochs=2)
    job.run_batches(spark, batches)
    table = LakeTable.load(tmp_table)
    d = table.describe()
    assert d["n_buckets"] == 8
    live = table.read(spark, include_tombstones=True).count()
    assert d["rows_physical"] >= live  # MoR generations hold old versions
    table.compact(spark)
    assert table.describe()["rows_physical"] == live  # merged = live rows
    assert d["epochs_applied"] == 2 and d["last_epoch"] == 1
    assert d["data_files"] >= d["nonempty_buckets"] >= 1
    assert d["schema_fields"][:2] == ["conv_id", "turn_idx"]
    assert d["max_lsn"] is not None
    # time-travel describe sees the older checkpoint
    d0 = table.describe(snapshot_id=1)
    assert d0["epochs_applied"] == 1


def test_change_feed_window_spanning_rollback_fails_loudly(spark, tmp_table):
    cfg, _, job, batches = _ingest(spark, tmp_table)
    job.run_batches(spark, batches[:2])
    table = LakeTable.load(tmp_table)
    pre_rb = table.current_snapshot_id()
    job.run_batches(spark, batches[2:])
    table.rollback(pre_rb)

    # a consumer still holding an offset before the rollback cannot read
    # through it — un-happened changes are unrepresentable
    with pytest.raises(ValueError, match="rolled the table back"):
        table.read_changes(spark, 0).count()

    # a fresh window starting at (or after) the rollback commit works and
    # carries the re-ingested epoch's changes
    rb_sid = table.current_snapshot_id()
    job.run_batches(spark, batches[2:])
    changes = table.read_changes(spark, rb_sid)
    assert changes.count() > 0


def test_rollback_preserves_merge_engine_and_schema_state(spark, tmp_path):
    """Regression: rollback used to rebuild its snapshot WITHOUT the
    merge_engine / agg_spec / renames / dropped_cols keys — a rollback on a
    partial-engine table silently flipped it to LWW, and a dropped-column
    tombstone vanished (re-adding the name would resurrect pre-drop file
    values)."""
    from cnpj_data_pipeline_spark.gen import gen_partial_changes

    root = str(tmp_path / "plake")
    cfg = EngineConfig(n_buckets=4, merge_engine="partial")
    ch = gen_partial_changes(spark, n_events=1_500, n_convs=60, n_epochs=2)
    job = IngestJob(root, cfg)
    batches = list(epoch_batches(ch, 2))
    job.run_batches(spark, batches[:1])
    table = LakeTable.load(root)
    good_sid = table.current_snapshot_id()
    good = (
        table.read(spark).orderBy("conv_id", "turn_idx").toPandas()
        .reset_index(drop=True)
    )

    job.run_batches(spark, batches[1:])
    table.rollback(good_sid)
    snap = table.snapshot()
    assert snap["merge_engine"] == "partial"
    after = (
        table.read(spark).orderBy("conv_id", "turn_idx").toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(after, good, check_dtype=False)


def test_rollback_preserves_renames_and_drop_tombstones(spark, tmp_table):
    _, _, job, batches = _ingest(spark, tmp_table, n_epochs=2)
    job.run_batches(spark, batches)
    table = LakeTable.load(tmp_table)
    pre_evolve = table.current_snapshot_id()
    table.rename_column("tool", "tool_name")
    table.drop_column("text")
    evolved = table.current_snapshot_id()
    cols_evolved = set(table.read(spark).columns)
    assert "tool_name" in cols_evolved and "text" not in cols_evolved

    # a data commit, then rollback to the evolved state: the rename map and
    # the drop tombstone must survive the round trip
    table.rollback(pre_evolve)
    table.rollback(evolved)
    snap = table.snapshot()
    assert snap["renames"] == {"tool": "tool_name"}
    assert "text" in snap["dropped_cols"]
    assert set(table.read(spark).columns) == cols_evolved
    # tombstone still guards re-add under the dropped name
    from pyspark.sql import types as T

    with pytest.raises(ValueError, match="tombstone"):
        table.add_column("text", T.StringType())
