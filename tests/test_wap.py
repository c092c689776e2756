"""Write-Audit-Publish: staged commits are invisible until published, the
audit preview equals the post-publish state, a failed audit quarantines the
batch without readers ever seeing it, publish rebases over concurrent
commits, and GC never eats a pending staged batch."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark import EngineConfig, LakeTable
from cnpj_data_pipeline_spark.gen import epoch_batches, gen_changes
from cnpj_data_pipeline_spark.lake.format import EpochAlreadyAppliedError
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.plans.wap import (
    WapIngestJob,
    keys_not_null,
    max_delete_rate,
    max_null_rate,
    min_rows,
)
from cnpj_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA

KEY = ["conv_id", "turn_idx"]
CFG = EngineConfig(n_buckets=8, salt_factor=2)


def _mk(tmp_table):
    return LakeTable.create(tmp_table, TRANSCRIPT_SCHEMA, KEY, CFG.n_buckets)


def _rows(spark, table):
    return {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in table.read(spark).collect()
    }


def test_stage_is_invisible_then_publish_equals_direct_apply(
    spark, tmp_table, tmp_path
):
    ch = gen_changes(spark, n_events=2_000, n_convs=50, n_epochs=2)
    batches = dict(epoch_batches(ch, 2))
    t = _mk(tmp_table)
    apply_changes(spark, t, batches[0], epoch=0, cfg=CFG)
    before = _rows(spark, t)
    sid_before = t.current_snapshot_id()

    m = apply_changes(spark, t, batches[1], epoch=1, cfg=CFG, stage_only=True)
    assert m["staged"] and m["token"] and m["rows_staged"] > 0
    # nothing visible: same head, same rows, epoch not applied
    assert t.current_snapshot_id() == sid_before
    assert _rows(spark, t) == before
    assert 1 not in t.applied_epochs()

    # audit preview == the state publish will produce
    preview = {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t.read_staged(spark, m["token"]).collect()
    }
    sid = t.publish_staged(m["token"])
    assert sid == sid_before + 1
    assert _rows(spark, t) == preview
    assert 1 in t.applied_epochs()

    # reference result: the same two epochs applied directly
    t2 = LakeTable.create(
        str(tmp_path / "direct"), TRANSCRIPT_SCHEMA, KEY, CFG.n_buckets
    )
    for e in (0, 1):
        apply_changes(spark, t2, batches[e], epoch=e, cfg=CFG)
    assert _rows(spark, t) == _rows(spark, t2)
    # descriptor consumed: publish again fails loudly, nothing staged left
    assert t.list_staged() == []
    with pytest.raises(FileNotFoundError):
        t.publish_staged(m["token"])


def test_failed_audit_quarantines_without_visibility(spark, tmp_table):
    ch = gen_changes(spark, n_events=1_500, n_convs=40, n_epochs=2)
    batches = dict(epoch_batches(ch, 2))
    _mk(tmp_table)
    job = WapIngestJob(
        tmp_table,
        [min_rows(1), max_null_rate("text", 0.9), keys_not_null(KEY)],
        cfg=CFG,
    )
    m0 = job.apply(spark, batches[0], epoch=0)
    assert m0["published"] and m0["rows_applied"] > 0

    t = LakeTable.load(tmp_table)
    before = _rows(spark, t)
    sid_before = t.current_snapshot_id()
    # corrupt epoch 1: the all-NULL text extraction bug
    bad = batches[1].withColumn("text", F.lit(None).cast("string"))
    m1 = job.apply(spark, bad, epoch=1)
    assert not m1["published"]
    assert any("null_rate_text" in k for k in m1["audit_failures"])
    assert m1["quarantined_files"] > 0
    # quarantined: no new snapshot, no rows, epoch NOT applied (a fixed
    # re-extraction can re-run it), no staged debris
    assert t.current_snapshot_id() == sid_before
    assert _rows(spark, t) == before
    assert 1 not in t.applied_epochs()
    assert t.list_staged() == []

    # the fixed batch then passes
    m1b = job.apply(spark, batches[1], epoch=1)
    assert m1b["published"] and 1 in LakeTable.load(tmp_table).applied_epochs()


def test_delete_storm_gate(spark, tmp_table):
    ch = gen_changes(spark, n_events=1_000, n_convs=30, n_epochs=1)
    batch = dict(epoch_batches(ch, 1))[0]
    _mk(tmp_table)
    job = WapIngestJob(tmp_table, [max_delete_rate(0.5)], cfg=CFG)
    storm = batch.withColumn("op", F.lit("D"))
    m = job.apply(spark, storm, epoch=0)
    assert not m["published"] and "delete_rate_le_0.5" in m["audit_failures"]
    m2 = job.apply(spark, batch, epoch=0)
    assert m2["published"]


def test_publish_rebases_over_concurrent_commit(spark, tmp_table):
    ch = gen_changes(spark, n_events=2_000, n_convs=50, n_epochs=3)
    batches = dict(epoch_batches(ch, 3))
    t = _mk(tmp_table)
    apply_changes(spark, t, batches[0], epoch=0, cfg=CFG)
    m = apply_changes(spark, t, batches[1], epoch=1, cfg=CFG, stage_only=True)
    # a concurrent writer lands epoch 2 while epoch 1 sits in audit
    apply_changes(spark, t, batches[2], epoch=2, cfg=CFG)
    sid = t.publish_staged(m["token"])
    assert t.applied_epochs() == {0, 1, 2}
    assert sid == t.current_snapshot_id()
    # final state == all three epochs, any order (LWW total order decides)
    exp = LakeTable.create(
        tmp_table + "_ref", TRANSCRIPT_SCHEMA, KEY, CFG.n_buckets
    )
    for e in (0, 1, 2):
        apply_changes(spark, exp, batches[e], epoch=e, cfg=CFG)
    assert _rows(spark, t) == _rows(spark, exp)


def test_publish_loses_epoch_race_and_abandons(spark, tmp_table):
    ch = gen_changes(spark, n_events=1_000, n_convs=30, n_epochs=1)
    batch = dict(epoch_batches(ch, 1))[0]
    t = _mk(tmp_table)
    m = apply_changes(spark, t, batch, epoch=0, cfg=CFG, stage_only=True)
    # another writer applies the SAME epoch directly before our publish
    apply_changes(spark, t, batch, epoch=0, cfg=CFG)
    with pytest.raises(EpochAlreadyAppliedError):
        t.publish_staged(m["token"])
    # exactly-once: staged files quarantined, nothing dangling
    assert t.list_staged() == []


def test_gc_protects_pending_staged_batch(spark, tmp_table):
    ch = gen_changes(spark, n_events=1_000, n_convs=30, n_epochs=2)
    batches = dict(epoch_batches(ch, 2))
    t = _mk(tmp_table)
    apply_changes(spark, t, batches[0], epoch=0, cfg=CFG)
    m = apply_changes(spark, t, batches[1], epoch=1, cfg=CFG, stage_only=True)
    # grace_sec=0 would eat ANY unreferenced file — the descriptor must
    # protect the staged DATA regardless of age (committer artifacts like
    # .crc/_SUCCESS may be swept; they are not data)
    staged = {
        os.path.join(t.root, f) for f in t._staged_referenced_files()
    }
    assert staged
    t.clean_orphans(grace_sec=0.0)
    assert all(os.path.exists(p) for p in staged)
    sid = t.publish_staged(m["token"])
    assert sid == t.current_snapshot_id()
    # after abandon-able state is gone, a stray unreferenced file IS swept
    junk = os.path.join(t.data_dir, "stage-dead", "junk.parquet")
    os.makedirs(os.path.dirname(junk), exist_ok=True)
    with open(junk, "wb") as f:
        f.write(b"x")
    assert t.clean_orphans(grace_sec=0.0)["files_removed"] == 1


def test_crash_between_commit_and_descriptor_cleanup_is_idempotent(
    spark, tmp_table, monkeypatch
):
    """publish commits, then 'crashes' before removing the descriptor; a
    retry must not double-apply or GC the now-committed files."""
    ch = gen_changes(spark, n_events=1_000, n_convs=30, n_epochs=1)
    batch = dict(epoch_batches(ch, 1))[0]
    t = _mk(tmp_table)
    m = apply_changes(spark, t, batch, epoch=0, cfg=CFG, stage_only=True)

    real_remove = os.remove
    desc_path = t._staged_desc_path(m["token"])

    def flaky_remove(p):
        if p == desc_path:
            raise OSError("simulated crash")  # leaves descriptor behind
        real_remove(p)

    monkeypatch.setattr(os, "remove", flaky_remove)
    sid = t.publish_staged(m["token"])
    monkeypatch.undo()
    assert os.path.exists(desc_path)  # the crash left the descriptor
    rows_after = _rows(spark, t)

    # retry: recognizes its own committed files, cleans up, same head
    sid2 = t.publish_staged(m["token"])
    assert sid2 == sid == t.current_snapshot_id()
    assert not os.path.exists(desc_path)
    assert _rows(spark, t) == rows_after
    # and abandon on a published descriptor never deletes committed data
    m2 = apply_changes(
        spark, t,
        batch.withColumn("lsn", F.col("lsn") + 10_000),
        epoch=1, cfg=CFG, stage_only=True,
    )
    t.publish_staged(m2["token"])


def test_stage_only_rejects_cow_and_propless_paths(spark, tmp_table):
    ch = gen_changes(spark, n_events=200, n_convs=10, n_epochs=1)
    batch = dict(epoch_batches(ch, 1))[0]
    t = _mk(tmp_table)
    with pytest.raises(ValueError, match="merge-on-read"):
        apply_changes(
            spark, t, batch, epoch=0,
            cfg=EngineConfig(n_buckets=8, write_mode="cow"), stage_only=True,
        )
    with pytest.raises(ValueError, match="integer epoch"):
        apply_changes(
            spark, t, batch, epoch=None, cfg=CFG, stage_only=True,
            expected_props={"f": "0"},
        )


def _wal_with_bad_epoch(spark, tmp_path, bad=1, n_epochs=3):
    ch = gen_changes(spark, n_events=1_500, n_convs=40, n_epochs=n_epochs)
    wal = str(tmp_path / "wal")
    from cnpj_data_pipeline_spark.sources.change_stream import write_epoch

    for e, b in epoch_batches(ch, n_epochs):
        if e == bad:
            b = b.withColumn("text", F.lit(None).cast("string"))
        write_epoch(b, wal, e)
    return wal, {e: b for e, b in epoch_batches(ch, n_epochs)}


def test_ingest_audit_gate_fail_stop_then_fixed_rerun(spark, tmp_path):
    """run_stream(audit_checks) stops at the corrupted epoch, leaving it
    PENDING; fixing the WAL and re-running completes exactly-once."""
    from cnpj_data_pipeline_spark.plans.pipeline import IngestJob
    from cnpj_data_pipeline_spark.plans.wap import AuditFailedError
    from cnpj_data_pipeline_spark.sources.change_stream import write_epoch

    wal, clean = _wal_with_bad_epoch(spark, tmp_path, bad=1)
    job = IngestJob(str(tmp_path / "lake"), CFG)
    checks = [min_rows(1), max_null_rate("text", 0.9)]
    with pytest.raises(AuditFailedError) as ei:
        job.run_stream(spark, wal, audit_checks=checks)
    assert ei.value.epoch == 1
    t = LakeTable.load(str(tmp_path / "lake"))
    assert t.applied_epochs() == {0}
    assert t.list_staged() == []  # quarantined, no debris

    # upstream fixed: rewrite epoch 1, re-run drains 1 and 2
    write_epoch(clean[1], wal, 1)
    ms = job.run_stream(spark, wal, audit_checks=checks)
    assert [m["epoch"] for m in ms if not m["skipped"]] == [1, 2]
    assert t.applied_epochs() == {0, 1, 2}

    # reference result: the clean WAL applied without the gate
    ref = LakeTable.create(
        str(tmp_path / "ref"), TRANSCRIPT_SCHEMA, KEY, CFG.n_buckets
    )
    for e in (0, 1, 2):
        apply_changes(spark, ref, clean[e], epoch=e, cfg=CFG)
    assert _rows(spark, t) == _rows(spark, ref)


def test_ingest_audit_gate_quarantine_mode_keeps_draining(spark, tmp_path):
    """on_audit_failure='quarantine': the bad epoch is recorded as consumed
    with ZERO rows (metadata-only commit, verdict in table properties) and
    the stream continues; re-runs are no-ops."""
    from cnpj_data_pipeline_spark.plans.pipeline import IngestJob

    wal, clean = _wal_with_bad_epoch(spark, tmp_path, bad=1)
    job = IngestJob(str(tmp_path / "lake"), CFG)
    checks = [max_null_rate("text", 0.9)]
    ms = job.run_stream(
        spark, wal, audit_checks=checks, on_audit_failure="quarantine"
    )
    byep = {m["epoch"]: m for m in ms}
    assert byep[1].get("quarantined") and byep[1]["rows_applied"] == 0
    assert byep[0]["published"] and byep[2]["published"]
    t = LakeTable.load(str(tmp_path / "lake"))
    assert t.applied_epochs() == {0, 1, 2}
    assert "quarantine.1" in t.props() and "null_rate" in t.props()["quarantine.1"]

    # state == epochs 0+2 only
    ref = LakeTable.create(
        str(tmp_path / "ref"), TRANSCRIPT_SCHEMA, KEY, CFG.n_buckets
    )
    for e in (0, 2):
        apply_changes(spark, ref, clean[e], epoch=e, cfg=CFG)
    assert _rows(spark, t) == _rows(spark, ref)

    # drained: a re-run applies nothing
    ms2 = job.run_stream(spark, wal, audit_checks=checks,
                         on_audit_failure="quarantine")
    assert all(m["skipped"] for m in ms2)


def test_publish_rejects_rebucket_between_stage_and_publish(spark, tmp_table):
    """ADVICE r3 (medium): a rebucket between stage and publish invalidates
    every staged bucket id — publishing would append rows into buckets their
    keys no longer hash to (invisible to pruning, split LWW). publish_staged
    must refuse with CommitConflictError, like staged_snapshot already does."""
    from cnpj_data_pipeline_spark.lake.format import CommitConflictError

    ch = gen_changes(spark, n_events=2_000, n_convs=50, n_epochs=2)
    batches = dict(epoch_batches(ch, 2))
    t = _mk(tmp_table)
    apply_changes(spark, t, batches[0], epoch=0, cfg=CFG)
    m = apply_changes(spark, t, batches[1], epoch=1, cfg=CFG, stage_only=True)
    t.rebucket(spark, CFG.n_buckets * 2)
    with pytest.raises(CommitConflictError, match="layout changed"):
        t.publish_staged(m["token"])
    # the batch is still staged (not silently dropped); abandon cleans it up
    assert any(d["token"] == m["token"] for d in t.list_staged())
    t.abandon_staged(m["token"])
    assert 1 not in t.applied_epochs()
