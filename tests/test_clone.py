"""Zero-copy shallow clone (table fork): fork-point fidelity, independent
divergence, cross-table GC safety (pins + the absolute-entry ownership
rule), localize, and clone-of-clone pin inheritance.

Reference analogue: none — a Postgres state table cannot be forked without
a dump/restore; this is the lake-format capability that makes a 100 TB
experiment fork O(metadata)."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest

from cnpj_data_pipeline_spark import EngineConfig, IngestJob, LakeTable
from cnpj_data_pipeline_spark.gen import epoch_batches, gen_changes
from cnpj_data_pipeline_spark.oracle import final_state


def _ingest(spark, root, n_epochs=3, upto=None):
    cfg = EngineConfig(n_buckets=8)
    ch = gen_changes(spark, n_events=3_000, n_convs=100, n_epochs=n_epochs)
    job = IngestJob(root, cfg)
    batches = list(epoch_batches(ch, n_epochs))
    job.run_batches(spark, batches[: (upto if upto is not None else n_epochs)])
    return cfg, ch, job, batches


def _state(spark, table, **kw):
    return (
        table.read(spark, **kw)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )


def _data_parquets(root):
    return glob.glob(os.path.join(root, "data", "**", "*.parquet"), recursive=True)


def test_clone_is_zero_copy_and_matches_fork_point(spark, tmp_path):
    src_root = str(tmp_path / "src")
    cl_root = str(tmp_path / "cl")
    _cfg, _ch, job, batches = _ingest(spark, src_root, upto=2)
    src = LakeTable.load(src_root)
    fork_state = _state(spark, src)

    clone = src.clone(cl_root)
    # zero bytes copied: the clone's own data dir holds no parquet
    assert _data_parquets(cl_root) == []
    assert clone.foreign_files()
    pd.testing.assert_frame_equal(_state(spark, clone), fork_state)

    # source moves on; the clone stays at the fork point
    job.run_batches(spark, batches[2:])
    assert len(_state(spark, src)) != len(fork_state) or not _state(
        spark, src
    ).equals(fork_state)
    pd.testing.assert_frame_equal(_state(spark, clone), fork_state)


def test_clone_diverges_and_continues_exactly_once(spark, tmp_path):
    src_root = str(tmp_path / "src")
    cl_root = str(tmp_path / "cl")
    cfg, ch, _job, batches = _ingest(spark, src_root, upto=2)
    src = LakeTable.load(src_root)
    fork_state = _state(spark, src)

    clone = src.clone(cl_root)
    cjob = IngestJob(cl_root, cfg)

    # the applied-epoch ledger travels with the fork: re-offering the
    # pre-fork epochs is an exactly-once skip, not a double apply
    m = cjob.run_batches(spark, batches)
    assert [r["skipped"] for r in m] == [True, True, False]

    golden = final_state(ch.toPandas())
    pd.testing.assert_frame_equal(_state(spark, clone), golden, check_dtype=False)
    # the source never saw epoch 2
    pd.testing.assert_frame_equal(_state(spark, src), fork_state)


def test_clone_pin_protects_source_retention_until_localize(spark, tmp_path):
    src_root = str(tmp_path / "src")
    cl_root = str(tmp_path / "cl")
    _cfg, _ch, job, batches = _ingest(spark, src_root, upto=2)
    src = LakeTable.load(src_root)
    fork_sid = src.current_snapshot_id()
    clone = src.clone(cl_root)
    fork_state = _state(spark, clone)

    # source keeps writing, compacts, and expires aggressively — the fork
    # snapshot is auto-tag-pinned, so every byte the clone reads survives
    job.run_batches(spark, batches[2:])
    src.compact(spark)
    stats = src.expire_snapshots(keep_last=1)
    assert fork_sid in stats["kept_snapshot_ids"]
    pd.testing.assert_frame_equal(_state(spark, clone), fork_state)

    # localize: bytes come home, pins release, reads are unchanged
    lstats = clone.localize()
    assert lstats["files_copied"] > 0 and lstats["pins_released"] == 1
    assert clone.foreign_files() == []
    pd.testing.assert_frame_equal(_state(spark, clone), fork_state)
    # per-bucket MoR flags survived the path-only rewrite
    for info in clone.snapshot()["buckets"].values():
        assert "merged" in info and "gens" in info

    # with the pin gone the source may finally drop the fork snapshot
    stats2 = src.expire_snapshots(keep_last=1)
    assert fork_sid not in stats2["kept_snapshot_ids"]
    pd.testing.assert_frame_equal(_state(spark, clone), fork_state)

    # repeat localize is a no-op
    again = clone.localize()
    assert again["files_copied"] == 0


def test_clone_gc_never_deletes_source_bytes(spark, tmp_path):
    src_root = str(tmp_path / "src")
    cl_root = str(tmp_path / "cl")
    cfg, _ch, _job, batches = _ingest(spark, src_root, upto=2)
    src = LakeTable.load(src_root)
    src_files = set(_data_parquets(src_root))
    src_state = _state(spark, src)

    clone = src.clone(cl_root)
    # clone ingests + compacts (bucket rewrites land on clone storage) and
    # then expires EVERYTHING it can, orphan sweep included
    IngestJob(cl_root, cfg).run_batches(spark, batches[2:])
    clone.compact(spark)
    clone.expire_snapshots(keep_last=1, sweep_orphans=True, orphan_grace_sec=0.0)

    # ownership rule: not one source byte was touched
    assert set(_data_parquets(src_root)) >= src_files
    pd.testing.assert_frame_equal(_state(spark, src), src_state)


def test_clone_of_clone_inherits_pins(spark, tmp_path):
    a_root = str(tmp_path / "a")
    b_root = str(tmp_path / "b")
    c_root = str(tmp_path / "c")
    _cfg, _ch, job, batches = _ingest(spark, a_root, upto=2)
    a = LakeTable.load(a_root)
    fork_sid = a.current_snapshot_id()

    b = a.clone(b_root)
    c = b.clone(c_root)  # references A's files via B's absolute entries
    c_state = _state(spark, c)
    assert len(c.props()["clone_pins"]) == 2  # pins B AND A

    # B localizes and releases ITS pin on A — C's inherited pin still
    # protects the fork snapshot
    b.localize()
    job.run_batches(spark, batches[2:])
    stats = a.expire_snapshots(keep_last=1)
    assert fork_sid in stats["kept_snapshot_ids"]
    pd.testing.assert_frame_equal(_state(spark, c), c_state)

    # once C localizes too, A is finally free
    c.localize()
    stats2 = a.expire_snapshots(keep_last=1)
    assert fork_sid not in stats2["kept_snapshot_ids"]
    pd.testing.assert_frame_equal(_state(spark, c), c_state)


def test_clone_at_tag_and_snapshot_id(spark, tmp_path):
    src_root = str(tmp_path / "src")
    _cfg, _ch, job, batches = _ingest(spark, src_root, upto=1)
    src = LakeTable.load(src_root)
    sid1 = src.current_snapshot_id()
    src.create_tag("fork-here", sid1)
    e1 = _state(spark, src)
    job.run_batches(spark, batches[1:])

    by_tag = src.clone(str(tmp_path / "by_tag"), snapshot_id="fork-here")
    by_sid = src.clone(str(tmp_path / "by_sid"), snapshot_id=sid1)
    pd.testing.assert_frame_equal(_state(spark, by_tag), e1)
    pd.testing.assert_frame_equal(_state(spark, by_sid), e1)

    with pytest.raises(ValueError):
        src.clone(str(tmp_path / "both"), snapshot_id=sid1, at="2026-01-01T00:00:00.000000Z")
    with pytest.raises(FileExistsError):
        src.clone(str(tmp_path / "by_tag"))


def test_clone_preserves_engine_and_schema_state(spark, tmp_path):
    src_root = str(tmp_path / "psrc")
    cl_root = str(tmp_path / "pcl")
    from cnpj_data_pipeline_spark.gen import gen_partial_changes

    cfg = EngineConfig(n_buckets=4, merge_engine="partial")
    ch = gen_partial_changes(spark, n_events=1_500, n_convs=60, n_epochs=2)
    job = IngestJob(src_root, cfg)
    job.run_batches(spark, list(epoch_batches(ch, 2)))
    src = LakeTable.load(src_root)
    state = _state(spark, src)

    clone = src.clone(cl_root)
    snap = clone.snapshot()
    assert snap["merge_engine"] == "partial"
    pd.testing.assert_frame_equal(_state(spark, clone), state)


def test_clone_of_localized_table_is_fully_self_owned(spark, tmp_path):
    """localize() clears the clone-pin record: a later clone() of the
    localized table must not re-pin (possibly expired) ancestor snapshots
    on the original source — it pins only the localized table itself."""
    src_root = str(tmp_path / "src")
    _cfg, _ch, _job, _batches = _ingest(spark, src_root, upto=2)
    src = LakeTable.load(src_root)
    c1 = src.clone(str(tmp_path / "c1"))
    c1.localize()
    assert c1.props().get("clone_pins") == []
    c1_state = _state(spark, c1)

    # the source legally drops the fork snapshot (pin was released) ...
    src.compact(spark)
    src.expire_snapshots(keep_last=1)

    # ... and cloning the localized table still works: no ancestor re-pin
    c2 = c1.clone(str(tmp_path / "c2"))
    pd.testing.assert_frame_equal(_state(spark, c2), c1_state)
    # c2 pins exactly its own fork point on c1, nothing on src
    pins = c2.props()["clone_pins"]
    assert [os.path.abspath(p["root"]) for p in pins] == [
        os.path.abspath(c1.root)
    ]
    assert not any(t.startswith("clone-") for t in src.tags())
