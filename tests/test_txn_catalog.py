"""Transactional multi-table catalog: atomic cross-table visibility.

A transaction staged over N tables publishes all-or-nothing through one
catalog CAS; a crash at ANY point between prepare and the catalog bump
leaves catalog readers on the old consistent vector and ``recover()``
completes the prepared record exactly-once. The reference's loader commits
per file with no spanning transaction (src/database/postgres.py:183-196) —
this is the write-side fix for the torn-read window that leaves open.
"""

from __future__ import annotations

import pandas as pd
import pytest

from cnpj_data_pipeline_spark import Catalog, EngineConfig, LakeTable
from cnpj_data_pipeline_spark.lake.format import CommitConflictError
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.queries.multitable import CONV_SCHEMA
from cnpj_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA

CFG = EngineConfig(n_buckets=4, salt_factor=2)
TS = pd.Timestamp("2026-01-01")

CONV_COLS = ["conv_id", "title", "ts", "op", "lsn"]
TURN_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "op", "lsn"]


def _conv_batch(spark, epoch: int):
    if epoch == 0:
        rows = [(f"c{i:02d}", f"t0:{i}", TS, "I", i) for i in range(8)]
    else:
        rows = [(f"c{i:02d}", f"t{epoch}:{i}", TS, "U", 100 * epoch + i)
                for i in range(4)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=CONV_COLS))


def _turn_batch(spark, epoch: int):
    if epoch == 0:
        rows = [
            (f"c{i:02d}", t, "user", f"x{i}-{t}", None, TS, "I", 10 * i + t)
            for i in range(8)
            for t in range(3)
        ]
    else:
        rows = [
            ("c00", 0, "user", None, None, TS, "D", 900 + epoch),
            ("c01", 1, "user", f"upd{epoch}", None, TS, "U", 910 + epoch),
        ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=TURN_COLS))


def _mk_tables(tmp_path):
    convs = LakeTable.create(
        str(tmp_path / "convs"), CONV_SCHEMA, ["conv_id"], CFG.n_buckets
    )
    turns = LakeTable.create(
        str(tmp_path / "turns"),
        TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"],
        CFG.n_buckets,
    )
    return convs, turns


def _seeded_catalog(spark, tmp_path):
    """Both tables at epoch 0, catalog v0 pinning them."""
    convs, turns = _mk_tables(tmp_path)
    apply_changes(spark, convs, _conv_batch(spark, 0), epoch=0, cfg=CFG)
    apply_changes(spark, turns, _turn_batch(spark, 0), epoch=0, cfg=CFG)
    cat = Catalog.create(
        str(tmp_path / "cat"), {"convs": convs, "turns": turns}
    )
    return cat, convs, turns


def _golden(spark, tmp_path, epochs: int):
    """Direct (non-transactional) applies of the same batches — the
    reference state any transactional path must reproduce."""
    convs, turns = _mk_tables(tmp_path / "golden")
    for e in range(epochs):
        apply_changes(spark, convs, _conv_batch(spark, e), epoch=e, cfg=CFG)
        apply_changes(spark, turns, _turn_batch(spark, e), epoch=e, cfg=CFG)
    return _state(spark, convs), _state(spark, turns)


def _state(spark, table, snapshot_id=None):
    df = table.read(spark, snapshot_id=snapshot_id).toPandas()
    key = [c for c in ("conv_id", "turn_idx") if c in df.columns]
    return (
        df.sort_values(key, kind="mergesort")
        .reset_index(drop=True)
        .to_dict("records")
    )


def _cat_state(spark, cat, name, version=None):
    df = cat.read(spark, name, version=version).toPandas()
    key = [c for c in ("conv_id", "turn_idx") if c in df.columns]
    return (
        df.sort_values(key, kind="mergesort")
        .reset_index(drop=True)
        .to_dict("records")
    )


# ---------------- reads through pins ----------------


def test_catalog_pins_shield_readers_from_direct_commits(spark, tmp_path):
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    v0_convs = _cat_state(spark, cat, "convs")
    assert len(v0_convs) == 8

    # a direct (catalog-bypassing) commit moves the table head ...
    apply_changes(spark, convs, _conv_batch(spark, 1), epoch=1, cfg=CFG)
    assert _state(spark, convs)[0]["title"].startswith("t1:")
    # ... but catalog readers stay on the pinned vector
    assert _cat_state(spark, cat, "convs") == v0_convs
    assert cat.current_version() == 0

    # an explicit publish advances the pin in one version bump
    v = cat.publish({"convs": convs.current_snapshot_id()})
    assert v == 1
    assert _cat_state(spark, cat, "convs") == _state(spark, convs)
    # and the old version remains readable (catalog time travel)
    assert _cat_state(spark, cat, "convs", version=0) == v0_convs


def test_publish_validates_and_guards(spark, tmp_path):
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    with pytest.raises(KeyError, match="unregistered"):
        cat.publish({"nope": 1})
    with pytest.raises(CommitConflictError, match="moved"):
        cat.publish(
            {"convs": convs.current_snapshot_id()}, expected_version=7
        )
    # register a brand-new table mid-life
    extra = LakeTable.create(
        str(tmp_path / "extra"), CONV_SCHEMA, ["conv_id"], CFG.n_buckets
    )
    v = cat.register("extra", extra)
    assert set(cat.pins()) == {"convs", "turns", "extra"}
    assert cat.current_version() == v
    with pytest.raises(KeyError, match="no table"):
        cat.table("missing")


# ---------------- transactions ----------------


def test_txn_commit_is_atomic_and_equals_direct_applies(spark, tmp_path):
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    before_convs = _cat_state(spark, cat, "convs")
    before_turns = _cat_state(spark, cat, "turns")
    heads = (convs.current_snapshot_id(), turns.current_snapshot_id())

    txn = cat.begin(cfg=CFG)
    m1 = txn.apply(spark, "convs", _conv_batch(spark, 1), epoch=1)
    m2 = txn.apply(spark, "turns", _turn_batch(spark, 1), epoch=1)
    assert m1["staged"] and m2["staged"]

    # prepare phase: NOTHING visible anywhere — not even table heads moved
    assert convs.current_snapshot_id() == heads[0]
    assert turns.current_snapshot_id() == heads[1]
    assert _cat_state(spark, cat, "convs") == before_convs
    assert _cat_state(spark, cat, "turns") == before_turns
    assert 1 not in convs.applied_epochs()

    v = txn.commit()
    assert v == 1
    gc, gt = _golden(spark, tmp_path, epochs=2)
    assert _cat_state(spark, cat, "convs") == gc
    assert _cat_state(spark, cat, "turns") == gt
    # prepared record consumed, nothing staged left behind
    assert cat.pending_transactions() == []
    assert convs.list_staged() == [] and turns.list_staged() == []
    with pytest.raises(RuntimeError, match="finished"):
        txn.commit()


def test_txn_abort_releases_staging(spark, tmp_path):
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    txn = cat.begin(cfg=CFG)
    txn.apply(spark, "convs", _conv_batch(spark, 1), epoch=1)
    txn.apply(spark, "turns", _turn_batch(spark, 1), epoch=1)
    txn.abort()
    assert convs.list_staged() == [] and turns.list_staged() == []
    assert cat.current_version() == 0
    assert 1 not in convs.applied_epochs()
    # an empty (read-only) block commits as a version-vector no-op — legal
    # SQL (`BEGIN; COMMIT;`); only an external coordinator PREPARING an
    # empty transaction is surfaced as a bug
    assert cat.begin(cfg=CFG).commit() == 0
    assert cat.current_version() == 0
    with pytest.raises(ValueError, match="empty"):
        cat.begin(cfg=CFG).prepare()


def test_crash_before_any_publish_recovers(spark, tmp_path, monkeypatch):
    """Crash right AT the 2PC commit point: prepared record durable, no
    table published yet. Readers see the old vector; recover() completes."""
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    txn = cat.begin(cfg=CFG)
    txn.apply(spark, "convs", _conv_batch(spark, 1), epoch=1)
    txn.apply(spark, "turns", _turn_batch(spark, 1), epoch=1)

    monkeypatch.setattr(
        Catalog, "_complete",
        lambda self, t: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        txn.commit()
    monkeypatch.undo()

    # torn window closed: catalog vector unchanged, record pending
    assert cat.current_version() == 0
    assert len(cat.pending_transactions()) == 1

    cat2 = Catalog.load(cat.root)  # "restarted process"
    assert cat2.recover() == [1]
    gc, gt = _golden(spark, tmp_path, epochs=2)
    assert _cat_state(spark, cat2, "convs") == gc
    assert _cat_state(spark, cat2, "turns") == gt
    assert cat2.pending_transactions() == []
    assert cat2.recover() == []  # idempotent: nothing left to do


def test_crash_mid_publish_recovers_exactly_once(spark, tmp_path, monkeypatch):
    """Crash BETWEEN the two table publishes: first table's head moved but
    the catalog hasn't — readers still consistent; recover() publishes the
    remaining table (re-publish of the first is skipped: already landed)."""
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    txn = cat.begin(cfg=CFG)
    txn.apply(spark, "convs", _conv_batch(spark, 1), epoch=1)
    txn.apply(spark, "turns", _turn_batch(spark, 1), epoch=1)

    real = LakeTable.publish_staged
    calls = {"n": 0}

    def flaky(self, token, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("crash between publishes")
        return real(self, token, **kw)

    monkeypatch.setattr(LakeTable, "publish_staged", flaky)
    with pytest.raises(RuntimeError, match="between publishes"):
        txn.commit()
    monkeypatch.undo()

    # half the transaction landed at TABLE level ...
    applied = {
        name: 1 in cat.table(name).applied_epochs()
        for name in ("convs", "turns")
    }
    assert sum(applied.values()) == 1
    # ... but catalog readers still see the old consistent vector
    assert cat.current_version() == 0
    v0_pins = cat.pins()
    for name in ("convs", "turns"):
        assert _cat_state(spark, cat, name) == _state(
            spark, cat.table(name), snapshot_id=v0_pins[name]["snapshot_id"]
        )

    assert Catalog.load(cat.root).recover() == [1]
    gc, gt = _golden(spark, tmp_path, epochs=2)
    assert _cat_state(spark, cat, "convs") == gc
    assert _cat_state(spark, cat, "turns") == gt
    assert 1 in cat.table("convs").applied_epochs()
    assert 1 in cat.table("turns").applied_epochs()
    assert cat.pending_transactions() == []


def test_recover_tolerates_concurrent_direct_apply(spark, tmp_path, monkeypatch):
    """The same epoch lands DIRECTLY on a member table while the prepared
    record waits: recovery must not double-apply — it pins at the head that
    already contains the epoch (exactly-once under the shared ledger)."""
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    txn = cat.begin(cfg=CFG)
    txn.apply(spark, "convs", _conv_batch(spark, 1), epoch=1)
    txn.apply(spark, "turns", _turn_batch(spark, 1), epoch=1)
    monkeypatch.setattr(
        Catalog, "_complete",
        lambda self, t: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError):
        txn.commit()
    monkeypatch.undo()

    # a concurrent writer applies epoch 1 to convs directly
    apply_changes(spark, convs, _conv_batch(spark, 1), epoch=1, cfg=CFG)
    assert Catalog.load(cat.root).recover() == [1]

    gc, gt = _golden(spark, tmp_path, epochs=2)
    assert _cat_state(spark, cat, "convs") == gc
    assert _cat_state(spark, cat, "turns") == gt
    # exactly-once: the ledger holds each epoch once
    assert convs.applied_epochs() == {0, 1}


def test_explicit_prepare_then_recover(spark, tmp_path):
    """The public 2PC split: prepare() makes the record durable without
    publishing; recover() is the completion path. No monkeypatching."""
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    txn = cat.begin(cfg=CFG)
    txn.apply(spark, "convs", _conv_batch(spark, 1), epoch=1)
    txn.apply(spark, "turns", _turn_batch(spark, 1), epoch=1)
    rec = txn.prepare()
    assert rec["token"] == txn.token and len(rec["updates"]) == 2
    assert cat.current_version() == 0
    assert 1 not in convs.applied_epochs()
    with pytest.raises(RuntimeError, match="finished"):
        txn.commit()  # prepare consumed the transaction object
    assert Catalog.load(cat.root).recover() == [1]
    gc, gt = _golden(spark, tmp_path, epochs=2)
    assert _cat_state(spark, cat, "convs") == gc
    assert _cat_state(spark, cat, "turns") == gt


# ---------------- retention + views ----------------


def test_versions_tag_pins_and_expiry_respects_them(spark, tmp_path):
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    for e in (1, 2):
        txn = cat.begin(cfg=CFG)
        txn.apply(spark, "convs", _conv_batch(spark, e), epoch=e)
        txn.apply(spark, "turns", _turn_batch(spark, e), epoch=e)
        txn.commit()
    assert cat.current_version() == 2
    v1_convs = _cat_state(spark, cat, "convs", version=1)

    # every catalog version's pin is tagged on the member tables, so a
    # member-level expire cannot strand any catalog-resolvable version
    tags = convs.tags()
    assert sum(1 for t in tags if t.startswith("cat-")) == 3
    convs.expire_snapshots(keep_last=1)
    assert _cat_state(spark, cat, "convs", version=1) == v1_convs

    # dropping catalog history drops exactly its tags → then reclaimable
    out = cat.expire_versions(keep_last=1)
    assert out["versions_removed"] == 2
    assert sum(1 for t in convs.tags() if t.startswith("cat-")) == 1
    with pytest.raises(FileNotFoundError):
        cat.version(0)
    # head still fully readable
    gc, gt = _golden(spark, tmp_path, epochs=3)
    assert _cat_state(spark, cat, "convs") == gc
    assert _cat_state(spark, cat, "turns") == gt


def test_register_views_pins_sql_surface(spark, tmp_path):
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    txn = cat.begin(cfg=CFG)
    txn.apply(spark, "convs", _conv_batch(spark, 1), epoch=1)
    txn.apply(spark, "turns", _turn_batch(spark, 1), epoch=1)

    pinned = cat.register_views(spark, version=0)
    assert set(pinned) == {"convs", "turns"}
    n_before = spark.sql(
        "SELECT count(*) c FROM convs JOIN turns USING (conv_id)"
    ).collect()[0]["c"]

    txn.commit()
    # existing views stay pinned at version 0 (stable mid-query world) ...
    assert spark.sql(
        "SELECT count(*) c FROM convs JOIN turns USING (conv_id)"
    ).collect()[0]["c"] == n_before
    # ... re-registering at head shows the committed transaction atomically
    cat.register_views(spark)
    upd = spark.sql(
        "SELECT title FROM convs WHERE conv_id = 'c00'"
    ).collect()[0]["title"]
    assert upd == "t1:0"


# ---------------- concurrent publish races ----------------


def test_losing_publish_race_preserves_winner_tags(spark, tmp_path, monkeypatch):
    """A publisher that computed its version from a stale head loses the
    CAS and rebases — WITHOUT destroying the winner's committed pin tags.
    Tag names are nonce-unique per publish attempt, so the loser's rollback
    can only ever drop its own tags."""
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    apply_changes(spark, convs, _conv_batch(spark, 1), epoch=1, cfg=CFG)
    assert cat.publish({"convs": convs.current_snapshot_id()}) == 1  # winner
    tag_v1 = cat.version(1)["tag"]
    assert tag_v1 in convs.tags() and tag_v1 in turns.tags()

    # the loser computed its publish from version 0: force two stale head
    # reads (pins() pre-check + first loop attempt), so it attempts v1,
    # loses the CAS, rolls back ITS tags, and rebases onto v1 -> commits v2
    apply_changes(spark, turns, _turn_batch(spark, 1), epoch=1, cfg=CFG)
    real = Catalog.current_version
    calls = {"n": 0}

    def stale_twice(self):
        calls["n"] += 1
        return 0 if calls["n"] <= 2 else real(self)

    monkeypatch.setattr(Catalog, "current_version", stale_twice)
    assert cat.publish({"turns": turns.current_snapshot_id()}) == 2
    monkeypatch.undo()

    # the winner's v1 tags survived the loser's rollback
    assert tag_v1 in convs.tags() and tag_v1 in turns.tags()
    tag_v2 = cat.version(2)["tag"]
    assert tag_v2 in convs.tags() and tag_v2 in turns.tags()
    # and the losing attempt left no stray tags behind
    cat_tags = {
        t
        for t in list(convs.tags()) + list(turns.tags())
        if t.startswith("cat-")
    }
    assert cat_tags == {cat.version(0)["tag"], tag_v1, tag_v2}
    # v1 remains resolvable even after member-level retention
    v1_convs = _cat_state(spark, cat, "convs", version=1)
    convs.expire_snapshots(keep_last=1)
    assert _cat_state(spark, cat, "convs", version=1) == v1_convs


def test_idempotent_republish_race_is_noop_and_harmless(
    spark, tmp_path, monkeypatch
):
    """Two publishers race with IDENTICAL pins (idempotent re-publish, e.g.
    a recovered transaction replayed twice): the loser must not crash with
    FileExistsError, must not burn a version, and must not drop the
    winner's tags."""
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    apply_changes(spark, convs, _conv_batch(spark, 1), epoch=1, cfg=CFG)
    sid = convs.current_snapshot_id()
    assert cat.publish({"convs": sid}) == 1
    tag_v1 = cat.version(1)["tag"]

    real = Catalog.current_version
    calls = {"n": 0}

    def stale_twice(self):
        calls["n"] += 1
        return 0 if calls["n"] <= 2 else real(self)

    monkeypatch.setattr(Catalog, "current_version", stale_twice)
    assert cat.publish({"convs": sid}) == 1  # rebase -> no-op at head
    monkeypatch.undo()

    assert cat.current_version() == 1
    assert tag_v1 in convs.tags() and tag_v1 in turns.tags()
    # member retention still honors the surviving pin
    v1 = _cat_state(spark, cat, "convs", version=1)
    convs.expire_snapshots(keep_last=1)
    assert _cat_state(spark, cat, "convs", version=1) == v1
