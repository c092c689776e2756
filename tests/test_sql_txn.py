"""SQL transaction surface: ``BEGIN TRANSACTION; …DML…; COMMIT;`` in
``run_sql_script`` compiling to one :class:`MultiTableTransaction`.

The reference's consumers get multi-statement atomicity from Postgres for
free (``BEGIN``/``COMMIT`` around its INSERT batches); this is the lake
engine's equivalent — DML between BEGIN and COMMIT stages through the 2PC
write-audit-publish machinery and becomes visible in ONE catalog CAS, with
the script's idempotent re-run contract extended across the block.
"""

from __future__ import annotations

import pandas as pd
import pytest

from cnpj_data_pipeline_spark import Catalog, EngineConfig, LakeTable
from cnpj_data_pipeline_spark.lake.ddl import run_sql_script
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.queries.multitable import CONV_SCHEMA
from cnpj_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA

CFG = EngineConfig(n_buckets=4, salt_factor=2)
TS = pd.Timestamp("2026-01-01")

CONV_COLS = ["conv_id", "title", "ts", "op", "lsn"]
TURN_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "op", "lsn"]

MERGE_BLOCK = """
BEGIN TRANSACTION;
MERGE INTO convs AS t USING __txn_convs AS s
  ON t.conv_id = s.conv_id
  WHEN MATCHED AND s.op = 'D' THEN DELETE
  WHEN MATCHED THEN UPDATE SET *
  WHEN NOT MATCHED THEN INSERT *;
MERGE INTO turns AS t USING __txn_turns AS s
  ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
  WHEN MATCHED AND s.op = 'D' THEN DELETE
  WHEN MATCHED THEN UPDATE SET *
  WHEN NOT MATCHED THEN INSERT *;
COMMIT;
"""


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


def _seeded_catalog(spark, tmp_path):
    convs = LakeTable.create(
        str(tmp_path / "convs"), CONV_SCHEMA, ["conv_id"], CFG.n_buckets
    )
    turns = LakeTable.create(
        str(tmp_path / "turns"),
        TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"],
        CFG.n_buckets,
    )
    apply_changes(spark, convs, _conv_batch(spark, 0), epoch=0, cfg=CFG)
    apply_changes(spark, turns, _turn_batch(spark, 0), epoch=0, cfg=CFG)
    cat = Catalog.create(
        str(tmp_path / "cat"), {"convs": convs, "turns": turns}
    )
    return cat, convs, turns


def _golden(spark, tmp_path, epochs: int):
    convs = LakeTable.create(
        str(tmp_path / "g_convs"), CONV_SCHEMA, ["conv_id"], CFG.n_buckets
    )
    turns = LakeTable.create(
        str(tmp_path / "g_turns"),
        TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"],
        CFG.n_buckets,
    )
    for e in range(epochs):
        apply_changes(spark, convs, _conv_batch(spark, e), epoch=e, cfg=CFG)
        apply_changes(spark, turns, _turn_batch(spark, e), epoch=e, cfg=CFG)
    return _rows(spark, convs), _rows(spark, turns)


def _rows(spark, table):
    df = table.read(spark).toPandas()
    key = [c for c in ("conv_id", "turn_idx") if c in df.columns]
    return (
        df.sort_values(key, kind="mergesort")
        .reset_index(drop=True)
        .to_dict("records")
    )


def _cat_rows(spark, cat, name):
    df = cat.read(spark, name).toPandas()
    key = [c for c in ("conv_id", "turn_idx") if c in df.columns]
    return (
        df.sort_values(key, kind="mergesort")
        .reset_index(drop=True)
        .to_dict("records")
    )


def _register_epoch_views(spark, epoch: int):
    _conv_batch(spark, epoch).createOrReplaceTempView("__txn_convs")
    _turn_batch(spark, epoch).createOrReplaceTempView("__txn_turns")


def test_sql_txn_block_commits_atomically(spark, tmp_path):
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    _register_epoch_views(spark, 1)
    res = run_sql_script(
        spark, MERGE_BLOCK, epoch_base=1, cfg=CFG, catalog=cat
    )
    kinds = [r["kind"] for r in res]
    assert kinds == ["txn", "dml", "dml", "txn"]
    assert res[-1]["result"] == 1  # one catalog version for the whole block
    assert res[1]["result"]["staged"] and res[2]["result"]["staged"]
    gc, gt = _golden(spark, tmp_path, epochs=2)
    assert _cat_rows(spark, cat, "convs") == gc
    assert _cat_rows(spark, cat, "turns") == gt
    assert cat.pending_transactions() == []
    assert convs.list_staged() == [] and turns.list_staged() == []


def test_sql_txn_rerun_is_catalog_noop(spark, tmp_path):
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    _register_epoch_views(spark, 1)
    run_sql_script(spark, MERGE_BLOCK, epoch_base=1, cfg=CFG, catalog=cat)
    before = (_cat_rows(spark, cat, "convs"), cat.current_version())

    res = run_sql_script(
        spark, MERGE_BLOCK, epoch_base=1, cfg=CFG, catalog=cat
    )
    assert all(
        r["result"]["skipped"] for r in res if r["kind"] == "dml"
    )
    # idempotent no-op publish: the version vector did not move
    assert cat.current_version() == before[1]
    assert res[-1]["result"] == before[1]
    assert _cat_rows(spark, cat, "convs") == before[0]
    assert convs.list_staged() == [] and turns.list_staged() == []


def test_sql_txn_rollback_discards_block(spark, tmp_path):
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    before = _cat_rows(spark, cat, "turns")
    _register_epoch_views(spark, 1)
    script = MERGE_BLOCK.replace("COMMIT;", "ROLLBACK;")
    res = run_sql_script(
        spark, script, epoch_base=1, cfg=CFG, catalog=cat
    )
    assert res[-1]["result"] is None
    assert cat.current_version() == 0
    assert _cat_rows(spark, cat, "turns") == before
    assert 1 not in turns.applied_epochs()
    assert convs.list_staged() == [] and turns.list_staged() == []
    # the block left no ledger mark: the same epochs re-apply cleanly
    run_sql_script(
        spark, MERGE_BLOCK, epoch_base=1, cfg=CFG, catalog=cat
    )
    gc, gt = _golden(spark, tmp_path, epochs=2)
    assert _cat_rows(spark, cat, "turns") == gt


def test_created_table_joins_catalog_at_commit(spark, tmp_path):
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    _conv_batch(spark, 0).createOrReplaceTempView("__txn_convs0")
    script = f"""
    CREATE TABLE mirror (
        conv_id STRING,
        title STRING,
        ts TIMESTAMP,
        PRIMARY KEY (conv_id)
    ) USING lake CLUSTERED BY (conv_id) INTO 4 BUCKETS
    LOCATION '{tmp_path / "mirror"}';
    BEGIN;
    MERGE INTO mirror AS t USING __txn_convs0 AS s
      ON t.conv_id = s.conv_id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *;
    COMMIT;
    """
    tables: dict = {}
    run_sql_script(
        spark, script, tables=tables, epoch_base=0, cfg=CFG, catalog=cat
    )
    # the table and its first data became visible in ONE catalog event
    assert set(cat.pins()) == {"convs", "turns", "mirror"}
    assert cat.current_version() == 1
    got = _cat_rows(spark, cat, "mirror")
    assert len(got) == 8 and got[0]["title"] == "t0:0"


def test_driver_statements_in_txn_stay_lww_ordered(spark, tmp_path):
    """Two UPDATEs to the SAME table in one block: neither has published,
    so both read the pre-txn state — but the per-table statement counter
    shifts the second one's minted LSN, so the later statement wins."""
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    script = """
    BEGIN;
    UPDATE convs SET title = 'first' WHERE conv_id = 'c03';
    UPDATE convs SET title = 'second' WHERE conv_id = 'c03';
    COMMIT;
    """
    run_sql_script(spark, script, epoch_base=1, cfg=CFG, catalog=cat)
    rows = {r["conv_id"]: r["title"] for r in _cat_rows(spark, cat, "convs")}
    assert rows["c03"] == "second"


def test_crash_after_prepare_recovered_by_next_run(spark, tmp_path):
    """A coordinator that crashed between the 2PC commit point and the
    catalog CAS: the next script run completes the prepared record FIRST
    (recover), then its own statements skip under the ledger — converging
    on exactly-once with no torn window in between."""
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    txn = cat.begin(cfg=CFG)
    _register_epoch_views(spark, 1)
    txn.sql(
        spark,
        "MERGE INTO convs AS t USING __txn_convs AS s"
        " ON t.conv_id = s.conv_id"
        " WHEN MATCHED THEN UPDATE SET *"
        " WHEN NOT MATCHED THEN INSERT *",
        epoch=1,
    )
    txn.sql(
        spark,
        "MERGE INTO turns AS t USING __txn_turns AS s"
        " ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx"
        " WHEN MATCHED AND s.op = 'D' THEN DELETE"
        " WHEN MATCHED THEN UPDATE SET *"
        " WHEN NOT MATCHED THEN INSERT *",
        epoch=2,
    )
    txn.prepare()  # durable 2PC record; "crash" here
    assert cat.current_version() == 0  # nothing visible pre-recovery

    res = run_sql_script(
        spark, MERGE_BLOCK, epoch_base=1, cfg=CFG, catalog=cat
    )
    assert all(
        r["result"]["skipped"] for r in res if r["kind"] == "dml"
    )
    gc, gt = _golden(spark, tmp_path, epochs=2)
    assert _cat_rows(spark, cat, "convs") == gc
    assert _cat_rows(spark, cat, "turns") == gt
    assert cat.pending_transactions() == []


def test_txn_script_guards(spark, tmp_path):
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    with pytest.raises(ValueError, match="requires a catalog"):
        run_sql_script(spark, "BEGIN; COMMIT;")
    with pytest.raises(ValueError, match="nested"):
        run_sql_script(spark, "BEGIN; BEGIN;", catalog=cat)
    with pytest.raises(ValueError, match="COMMIT without"):
        run_sql_script(spark, "COMMIT;", catalog=cat)
    with pytest.raises(ValueError, match="DDL inside"):
        run_sql_script(
            spark,
            "BEGIN; ALTER TABLE convs ADD COLUMN extra STRING; COMMIT;",
            tables={"convs": convs},
            catalog=cat,
        )
    _register_epoch_views(spark, 1)
    with pytest.raises(ValueError, match="open transaction"):
        run_sql_script(
            spark,
            MERGE_BLOCK.replace("COMMIT;", ""),
            epoch_base=1, cfg=CFG, catalog=cat,
        )
    # the aborted block left nothing behind — ledger clean, staging clean
    assert 1 not in convs.applied_epochs()
    assert convs.list_staged() == [] and turns.list_staged() == []
    assert cat.current_version() == 0
    # read-only DDL is allowed inside a block
    res = run_sql_script(
        spark,
        "BEGIN; DESCRIBE convs; ROLLBACK;",
        tables={"convs": convs},
        catalog=cat,
    )
    assert res[1]["kind"] == "ddl"


def test_select_statement_reads_state_and_pins(spark, tmp_path):
    """SELECT inside a script is a first-class read: outside a block it
    sees the table's current state; inside a BEGIN block it resolves
    through the catalog's pins — the block's own staged writes are
    invisible (snapshot isolation, like every other statement's reads)."""
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    res = run_sql_script(
        spark,
        "SELECT count(*) AS n FROM turns",
        {"convs": convs, "turns": turns},
        epoch_base=1, cfg=CFG, catalog=cat,
    )
    assert res[0]["kind"] == "query"
    assert res[0]["result"].collect()[0]["n"] == 24

    _register_epoch_views(spark, 1)
    script = """
    BEGIN TRANSACTION;
    MERGE INTO turns AS t USING __txn_turns AS s
      ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
      WHEN MATCHED AND s.op = 'D' THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *;
    SELECT count(*) AS n FROM turns;
    COMMIT;
    SELECT count(*) AS n FROM turns;
    """
    res = run_sql_script(
        spark, script, {"convs": convs, "turns": turns},
        epoch_base=1, cfg=CFG, catalog=cat,
    )
    mid = [r for r in res if r["kind"] == "query"]
    # mid-block read: pre-transaction pin (24); post-commit read: 23
    assert mid[0]["result"].collect()[0]["n"] == 24
    assert mid[1]["result"].collect()[0]["n"] == 23


def test_driver_statement_after_merge_wins_block_order(spark, tmp_path):
    """Statement ORDER inside a block decides the fold: a driver DELETE
    issued AFTER a MERGE whose source carries WAL LSNs far above the
    published high-water mark must still beat those rows (its minted LSN
    sits above the block's per-table staged max, not just the published
    watermark)."""
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    # source LSNs ~900+ vs published high-water ~72
    _register_epoch_views(spark, 1)
    script = """
    BEGIN TRANSACTION;
    MERGE INTO turns AS t USING __txn_turns AS s
      ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
      WHEN MATCHED AND s.op = 'D' THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *;
    DELETE FROM turns WHERE conv_id = 'c01';
    COMMIT;
    """
    run_sql_script(
        spark, script, {"convs": convs, "turns": turns},
        epoch_base=1, cfg=CFG, catalog=cat,
    )
    got = turns.read(spark).toPandas()
    # the MERGE's c01 update (lsn 911) must NOT survive the later DELETE
    assert not (got["conv_id"] == "c01").any()
    # the MERGE's other effect (c00 turn 0 deleted) still applied
    assert not (
        (got["conv_id"] == "c00") & (got["turn_idx"] == 0)
    ).any()


def test_select_after_autocommit_dml_reads_fresh_state(spark, tmp_path):
    """Outside a BEGIN block the catalog's pins must NOT capture reads:
    autocommit DML never advances the catalog, so a pinned SELECT would
    silently miss the statement the script just ran."""
    cat, convs, turns = _seeded_catalog(spark, tmp_path)
    _register_epoch_views(spark, 1)
    script = """
    MERGE INTO turns AS t USING __txn_turns AS s
      ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
      WHEN MATCHED AND s.op = 'D' THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *;
    SELECT count(*) AS n FROM turns;
    """
    res = run_sql_script(
        spark, script, {"convs": convs, "turns": turns},
        epoch_base=1, cfg=CFG, catalog=cat,
    )
    # 24 seeded - 1 deleted by the merge = 23, visible IMMEDIATELY
    assert res[-1]["result"].collect()[0]["n"] == 23
