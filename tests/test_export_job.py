"""ExportJob — incremental, exactly-once outbound Debezium export
(plans/export.py). Gates: (1) incremental windows — each run exports only
what was committed since the last, a re-run is a no-op; (2) the full
exported stream replayed through the normal Debezium source path onto a
mirror reproduces the source state exactly; (3) granularity='epoch'
preserves every intermediate state (mirror-after-epoch-k equals the
source's time travel at that window's head); (4) crash debris (an
unpublished _tmp- staging dir) is swept and never counted toward the
frontier."""

from __future__ import annotations

import os

import pytest

from cnpj_data_pipeline_spark import EngineConfig, LakeTable, apply_changes
from cnpj_data_pipeline_spark.gen import epoch_batches, gen_changes
from cnpj_data_pipeline_spark.plans.export import ExportJob, _exported_epochs
from cnpj_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA
from cnpj_data_pipeline_spark.sources.debezium import read_debezium_epoch

CFG = EngineConfig(n_buckets=4, salt_factor=1, compact_threshold=None)
N_EPOCHS = 4


@pytest.fixture()
def wal_batches(spark):
    ch = gen_changes(
        spark, n_events=1200, n_convs=60, n_epochs=N_EPOCHS, skew=1.2
    )
    return [b.cache() for _, b in epoch_batches(ch, N_EPOCHS)]


def _mk_source(spark, root, batches, upto):
    t = LakeTable.create(root, TRANSCRIPT_SCHEMA,
                         ["conv_id", "turn_idx"], CFG.n_buckets)
    for e in range(upto):
        apply_changes(spark, t, batches[e], epoch=e, cfg=CFG)
    return t


def _mirror_apply(spark, mirror, out_root, epochs):
    for n in epochs:
        batch = read_debezium_epoch(spark, out_root, n, TRANSCRIPT_SCHEMA)
        apply_changes(spark, mirror, batch, epoch=n, cfg=CFG)


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("conv_id", "turn_idx").collect()]


def test_incremental_roundtrip(spark, tmp_path, wal_batches):
    src_root = str(tmp_path / "src")
    out = str(tmp_path / "feed")
    src = _mk_source(spark, src_root, wal_batches, 2)
    job = ExportJob(src_root, out)

    m1 = job.run_once(spark)
    assert m1["epochs_exported"] == [0] and m1["events"] > 0

    # nothing new -> metadata no-op
    m2 = job.run_once(spark)
    assert m2["epochs_exported"] == [] and m2["events"] == 0

    # two more source epochs -> exactly one more export window
    for e in (2, 3):
        apply_changes(spark, src, wal_batches[e], epoch=e, cfg=CFG)
    m3 = job.run_once(spark)
    assert m3["epochs_exported"] == [1]

    mirror = LakeTable.create(
        str(tmp_path / "mirror"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], CFG.n_buckets,
    )
    _mirror_apply(spark, mirror, out, [0, 1])
    assert _sorted_rows(mirror.read(spark)) == _sorted_rows(src.read(spark))


def test_epoch_granularity_time_travel_parity(spark, tmp_path, wal_batches):
    src_root = str(tmp_path / "src")
    out = str(tmp_path / "feed")
    src = _mk_source(spark, src_root, wal_batches, N_EPOCHS)
    job = ExportJob(src_root, out, granularity="epoch")
    m = job.run_once(spark)
    assert m["epochs_exported"] == list(range(N_EPOCHS))

    manifests = _exported_epochs(out)
    assert [n for n, _ in manifests] == list(range(N_EPOCHS))
    mirror = LakeTable.create(
        str(tmp_path / "mirror"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], CFG.n_buckets,
    )
    for n, man in manifests:
        _mirror_apply(spark, mirror, out, [n])
        # after consuming export epoch n the mirror equals the SOURCE's
        # state at that window's head snapshot (time travel)
        assert _sorted_rows(mirror.read(spark)) == _sorted_rows(
            src.read(spark, man["to_sid"])
        ), f"divergence after export epoch {n}"


def test_crash_debris_swept(spark, tmp_path, wal_batches):
    src_root = str(tmp_path / "src")
    out = str(tmp_path / "feed")
    _mk_source(spark, src_root, wal_batches, 2)
    # simulate a crash mid-publish: a staging dir that never got renamed,
    # and a foreign dir without a manifest
    os.makedirs(os.path.join(out, "_tmp-0-deadbeef"))
    os.makedirs(os.path.join(out, "epoch=99"))  # no _window.json inside
    job = ExportJob(src_root, out)
    m = job.run_once(spark)
    assert m["epochs_exported"] == [0]  # the foreign dir is not ours
    assert not any(
        n.startswith("_tmp-") for n in os.listdir(out)
    ), "staging debris must be swept"
    # the manifest-less dir never advanced the frontier: the full window
    # was exported
    assert m["events"] > 0


def test_follow_drains(spark, tmp_path, wal_batches):
    src_root = str(tmp_path / "src")
    out = str(tmp_path / "feed")
    _mk_source(spark, src_root, wal_batches, 2)
    job = ExportJob(src_root, out)
    totals = job.run_follow(spark, poll_seconds=0.0, max_polls=2)
    assert totals["epochs_exported"] == [0] and totals["polls"] == 2
