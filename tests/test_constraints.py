"""Row-level CHECK constraints (lake/constraints.py): declaration-time
fail-closed validation, the three violation policies (fail / drop / dlq),
SQL CHECK semantics (NULL passes, deletes exempt), schema-evolution guards,
the co-partitioned-path routing contract, and the SQL DDL surface."""

from __future__ import annotations

import datetime

import pytest

from cnpj_data_pipeline_spark import EngineConfig, IngestJob, LakeTable
from cnpj_data_pipeline_spark.gen import epoch_batches, gen_changes
from cnpj_data_pipeline_spark.lake.constraints import (
    ConstraintViolationError,
)
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.oracle import final_state
from cnpj_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA
from cnpj_data_pipeline_spark.sources import change_stream as cs

TS = datetime.datetime(2026, 1, 1)
EXPR = "role <> 'tool' OR tool IS NOT NULL"


def _table(path, n_buckets=4):
    return LakeTable.create(
        str(path), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], n_buckets
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


ROWS0 = [
    ("c1", 0, "user", "hi", None, TS, "I", 1, 0),
    ("c1", 1, "tool", "out", None, TS, "I", 2, 0),  # violates EXPR
    ("c1", 2, "tool", "out", "browser", TS, "I", 3, 0),
    ("c2", 0, "assistant", None, None, TS, "I", 4, 0),
]


def test_declaration_fail_closed(spark, tmp_path):
    t = _table(tmp_path / "t")
    for bad, msg in [
        ("no_such > 1", "unknown column"),
        ("turn_idx", "BOOLEAN"),
        ("rand() > 0.5", "non-deterministic"),
        ("current_timestamp() > ts", "non-deterministic"),
        ("op = 'I'", "unknown column"),  # envelope cols are out of scope
        ("", "non-empty"),
        ("role <>", "parse"),
    ]:
        with pytest.raises(ValueError, match=msg):
            t.add_constraint(spark, "c_bad", bad)
    with pytest.raises(ValueError, match="invalid constraint name"):
        t.add_constraint(spark, "bad name!", "turn_idx >= 0")
    with pytest.raises(ValueError, match="unknown on_violation"):
        t.add_constraint(spark, "c", "turn_idx >= 0", on_violation="warn")
    t.add_constraint(spark, "c", "turn_idx >= 0")
    with pytest.raises(ValueError, match="already declared"):
        t.add_constraint(spark, "c", "turn_idx >= 0")
    # refs recorded sorted, logical names
    assert t.constraints()["c"]["refs"] == ["turn_idx"]
    with pytest.raises(ValueError, match="no constraint named"):
        t.drop_constraint("ghost")
    # raw props path is reserved
    with pytest.raises(ValueError, match="engine-managed"):
        t.set_props({"constraint.x": "{}"})


def test_declaration_refuses_partial_engine(spark, tmp_path):
    t = LakeTable.create(
        str(tmp_path / "p"),
        TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"],
        4,
        merge_engine="partial",
    )
    with pytest.raises(ValueError, match="lww merge engine"):
        t.add_constraint(spark, "c", "turn_idx >= 0")


def test_validate_existing_data(spark, tmp_path):
    t = _table(tmp_path / "t")
    apply_changes(
        spark, t, _batch(spark, ROWS0), epoch=0, cfg=EngineConfig(n_buckets=4)
    )
    # live state has a tool-turn without a tool -> declaration refused
    with pytest.raises(ValueError, match="existing live row"):
        t.add_constraint(spark, "tool_named", EXPR)
    # forward-only declaration skips the scan
    t.add_constraint(spark, "tool_named", EXPR, validate=False)
    assert set(t.constraints()) == {"tool_named"}


def test_fail_mode_keeps_epoch_pending(spark, tmp_path):
    t = _table(tmp_path / "t")
    t.add_constraint(spark, "tool_named", EXPR, on_violation="fail")
    with pytest.raises(ConstraintViolationError) as ei:
        apply_changes(
            spark, t, _batch(spark, ROWS0), epoch=0,
            cfg=EngineConfig(n_buckets=4),
        )
    assert ei.value.counts == {"tool_named": 1}
    assert t.applied_epochs() == set()  # exactly-once: nothing committed
    # a fixed upstream re-extraction replays the same epoch cleanly
    fixed = [r for r in ROWS0 if not (r[2] == "tool" and r[4] is None)]
    m = apply_changes(
        spark, t, _batch(spark, fixed), epoch=0, cfg=EngineConfig(n_buckets=4)
    )
    assert m["rows_applied"] == 3
    assert m["constraint_violations"] == {"tool_named": 0}


def test_drop_mode_previous_version_survives(spark, tmp_path):
    t = _table(tmp_path / "t")
    t.add_constraint(spark, "tool_named", EXPR, on_violation="drop")
    m0 = apply_changes(
        spark, t, _batch(spark, ROWS0), epoch=0, cfg=EngineConfig(n_buckets=4)
    )
    assert m0["rows_applied"] == 3
    assert m0["constraint_violations"] == {"tool_named": 1}
    # a violating UPDATE of a valid key is dropped -> old version stays
    upd = [
        ("c1", 2, "tool", "out-v2", None, TS, "U", 10, 1),  # violates
        ("c2", 0, "assistant", "ok", None, TS, "U", 11, 1),
    ]
    m1 = apply_changes(
        spark, t, _batch(spark, upd), epoch=1, cfg=EngineConfig(n_buckets=4)
    )
    assert m1["constraint_violations"] == {"tool_named": 1}
    state = {
        (r.conv_id, r.turn_idx): (r.text, r.tool)
        for r in t.read(spark).collect()
    }
    assert state[("c1", 2)] == ("out", "browser")  # previous valid version
    assert state[("c2", 0)] == ("ok", None)
    assert ("c1", 1) not in state  # dropped at insert time


def test_dlq_mode_persists_violations_idempotently(spark, tmp_path):
    t = _table(tmp_path / "t")
    t.add_constraint(spark, "tool_named", EXPR, on_violation="dlq")
    t.add_constraint(
        spark, "text_bounded", "length(text) <= 2", on_violation="dlq"
    )
    cfg = EngineConfig(n_buckets=4)
    m = apply_changes(spark, t, _batch(spark, ROWS0), epoch=0, cfg=cfg)
    # 'out' violates text_bounded on rows 1 and 2; row 1 violates both
    assert m["constraint_violations"] == {
        "text_bounded": 2, "tool_named": 1,
    }
    dlq = spark.read.parquet(str(tmp_path / "t/_dlq/constraints/epoch=0"))
    got = {
        (r.conv_id, r.turn_idx): sorted(r.violated) for r in dlq.collect()
    }
    assert got == {
        ("c1", 1): ["text_bounded", "tool_named"],
        ("c1", 2): ["text_bounded"],
    }
    assert t.read(spark).count() == 2
    # crash-replay: the epoch is skipped, the DLQ stays as written
    m2 = apply_changes(spark, t, _batch(spark, ROWS0), epoch=0, cfg=cfg)
    assert m2["skipped"]
    assert spark.read.parquet(
        str(tmp_path / "t/_dlq/constraints/epoch=0")
    ).count() == 2


def test_null_passes_and_deletes_exempt(spark, tmp_path):
    t = _table(tmp_path / "t")
    t.add_constraint(spark, "short", "length(text) <= 5", on_violation="fail")
    rows = [
        ("c1", 0, "user", None, None, TS, "I", 1, 0),  # NULL text passes
        ("c1", 1, "user", "ok", None, TS, "I", 2, 0),
        ("c1", 1, None, None, None, TS, "D", 3, 0),  # delete exempt
    ]
    m = apply_changes(
        spark, t, _batch(spark, rows), epoch=0, cfg=EngineConfig(n_buckets=4)
    )
    assert m["constraint_violations"] == {"short": 0}
    assert t.read(spark).count() == 1


def test_missing_ref_column_in_batch_passes(spark, tmp_path):
    # an old producer predating an additive evolution: the batch lacks the
    # referenced column entirely -> absent == NULL == passes
    t = _table(tmp_path / "t")
    t.add_column("tool_meta", __import__("pyspark").sql.types.StringType())
    t.add_constraint(
        spark, "meta_short", "length(tool_meta) <= 4", on_violation="fail"
    )
    m = apply_changes(
        spark, t, _batch(spark, ROWS0), epoch=0, cfg=EngineConfig(n_buckets=4)
    )
    assert m["constraint_violations"] == {"meta_short": 0}


def test_evolution_guards(spark, tmp_path):
    t = _table(tmp_path / "t")
    t.add_constraint(spark, "tool_named", EXPR)
    with pytest.raises(ValueError, match="referenced by CHECK"):
        t.rename_column("tool", "tool2")
    with pytest.raises(ValueError, match="referenced by CHECK"):
        t.drop_column("role")
    t.drop_constraint("tool_named")
    t.rename_column("tool", "tool2")
    # a constraint declared against a RENAMED column records the logical
    # name and guards it
    t.add_constraint(spark, "t2", "tool2 IS NULL OR length(tool2) > 0")
    assert t.constraints()["t2"]["refs"] == ["tool2"]
    with pytest.raises(ValueError, match="referenced by CHECK"):
        t.rename_column("tool2", "tool3")


def test_stream_routing_copart_vs_general(spark, tmp_path):
    """fail-mode keeps the zero-shuffle copart path; drop-mode routes the
    same bucket-aligned WAL through the general path and filters."""
    n_epochs, nb = 2, 4
    ch = gen_changes(spark, n_events=2_000, n_convs=60, n_epochs=n_epochs)
    wal = str(tmp_path / "wal")
    for e, b in epoch_batches(ch, n_epochs):
        cs.write_epoch_bucketed(b, wal, e, ["conv_id", "turn_idx"], nb)

    # fail mode, satisfied by construction (turn_idx is never negative)
    lake_f = str(tmp_path / "lake_f")
    job = IngestJob(lake_f, EngineConfig(n_buckets=nb))
    tf = job.ensure_table()
    tf.add_constraint(spark, "nonneg", "turn_idx >= 0", on_violation="fail")
    mf = job.run_stream(spark, wal)
    assert all(m.get("copartitioned") for m in mf)
    assert all(m["constraint_violations"] == {"nonneg": 0} for m in mf)

    # drop mode: routed off the copart path, violations filtered
    lake_d = str(tmp_path / "lake_d")
    job_d = IngestJob(lake_d, EngineConfig(n_buckets=nb))
    td = job_d.ensure_table()
    td.add_constraint(
        spark, "no_delta", "text IS NULL OR text NOT LIKE '%delta%'",
        on_violation="drop",
    )
    md = job_d.run_stream(spark, wal)
    assert not any(m.get("copartitioned") for m in md)
    assert sum(m["constraint_violations"]["no_delta"] for m in md) > 0
    # final state == pandas oracle over the ADMITTED change stream
    pdf = ch.toPandas()
    keep = (pdf["op"] == "D") | pdf["text"].isna() | ~pdf[
        "text"
    ].str.contains("delta", na=False)
    got = (
        LakeTable.load(lake_d)
        .read(spark)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        got, final_state(pdf[keep]), check_dtype=False
    )


def test_stream_fail_mode_violation_raises_on_copart(spark, tmp_path):
    n_epochs, nb = 2, 4
    ch = gen_changes(spark, n_events=1_000, n_convs=40, n_epochs=n_epochs)
    wal = str(tmp_path / "wal")
    for e, b in epoch_batches(ch, n_epochs):
        cs.write_epoch_bucketed(b, wal, e, ["conv_id", "turn_idx"], nb)
    lake = str(tmp_path / "lake")
    job = IngestJob(lake, EngineConfig(n_buckets=nb))
    t = job.ensure_table()
    t.add_constraint(
        spark, "no_delta", "text IS NULL OR text NOT LIKE '%delta%'",
        on_violation="fail",
    )
    with pytest.raises(ConstraintViolationError):
        job.run_stream(spark, wal)
    assert LakeTable.load(lake).applied_epochs() == set()


def test_sql_surface_roundtrip(spark, tmp_path):
    from cnpj_data_pipeline_spark.lake.ddl import (
        execute_ddl,
        show_create_table,
    )

    tables: dict = {}
    execute_ddl(
        spark,
        f"""CREATE TABLE conv (
            conv_id STRING, turn_idx INT, role STRING, text STRING,
            tool STRING, ts TIMESTAMP,
            PRIMARY KEY (conv_id, turn_idx),
            CONSTRAINT tool_named CHECK ({EXPR}) ON VIOLATION DLQ
        ) USING lake CLUSTERED BY (conv_id, turn_idx) INTO 4 BUCKETS
        LOCATION '{tmp_path / "conv"}'""",
        tables,
    )
    t = tables["conv"]
    assert t.constraints()["tool_named"]["on_violation"] == "dlq"

    execute_ddl(
        spark,
        "ALTER TABLE conv ADD CONSTRAINT nonneg CHECK (turn_idx >= 0)",
        tables,
    )
    assert t.constraints()["nonneg"]["on_violation"] == "fail"
    stmt = show_create_table(t, "conv2")
    assert "CONSTRAINT tool_named CHECK" in stmt
    assert "ON VIOLATION DLQ" in stmt
    assert "constraint." not in stmt  # never leaks as raw TBLPROPERTIES
    # round-trip: the emitted statement declares an equivalent table
    execute_ddl(
        spark,
        stmt.replace("'<path>'", f"'{tmp_path / 'conv2'}'"),
        tables,
    )
    assert tables["conv2"].constraints() == t.constraints()

    execute_ddl(spark, "ALTER TABLE conv DROP CONSTRAINT nonneg", tables)
    assert set(t.constraints()) == {"tool_named"}
    # idempotent form
    execute_ddl(
        spark, "ALTER TABLE conv DROP CONSTRAINT IF EXISTS nonneg", tables
    )
    with pytest.raises(ValueError, match="no constraint"):
        execute_ddl(spark, "ALTER TABLE conv DROP CONSTRAINT nonneg", tables)
    # DESCRIBE EXTENDED surfaces the declaration
    rows = execute_ddl(spark, "DESCRIBE EXTENDED conv", tables).collect()
    cons_row = [r for r in rows if r[0] == "Check Constraints"]
    assert cons_row and "tool_named" in cons_row[0][1]
    # enforcement wired through the SQL-declared table
    with pytest.raises(ValueError, match="ON VIOLATION"):
        execute_ddl(
            spark,
            "ALTER TABLE conv ADD CONSTRAINT c2 CHECK (1=1) ON VIOLATION "
            "WARN",
            tables,
        )


def test_describe_carries_constraints(spark, tmp_path):
    # the operator CLI's `stats` op (tools/run_maintenance.py) prints
    # describe(); active constraints must surface there
    t = _table(tmp_path / "t")
    t.add_constraint(spark, "tool_named", EXPR, on_violation="dlq")
    d = t.describe()
    assert d["constraints"] == {
        "tool_named": {"check": EXPR, "on_violation": "dlq"}
    }
    t.drop_constraint("tool_named")
    assert t.describe()["constraints"] == {}


def test_constraints_compose_with_wap_staging(spark, tmp_path):
    """Constraint enforcement runs BEFORE write-audit-publish staging: a
    fail-mode violation aborts ahead of any staged files; a drop-mode
    filter stages only the admitted events."""
    from cnpj_data_pipeline_spark.plans.wap import WapIngestJob, max_null_rate

    cfg = EngineConfig(n_buckets=4, write_mode="mor")
    t = _table(tmp_path / "t")
    t.add_constraint(spark, "tool_named", EXPR, on_violation="fail")
    job = WapIngestJob(str(tmp_path / "t"), [max_null_rate("role", 0.9)],
                       cfg=cfg)
    with pytest.raises(ConstraintViolationError):
        job.apply(spark, _batch(spark, ROWS0), epoch=0)
    assert t.list_staged() == []  # nothing staged, nothing visible
    t.drop_constraint("tool_named")
    t.add_constraint(spark, "tool_named", EXPR, on_violation="drop")
    m = job.apply(spark, _batch(spark, ROWS0), epoch=0)
    assert m["published"] and m["rows_applied"] == 3


def test_rollback_reverts_constraint_declarations(spark, tmp_path):
    """Constraints live in snapshot props, so RESTORE/rollback reverts the
    declaration set with the data — a constraint added after the restore
    point stops enforcing."""
    t = _table(tmp_path / "t")
    pre = t.current_snapshot_id()
    t.add_constraint(spark, "tool_named", EXPR, on_violation="fail")
    with pytest.raises(ConstraintViolationError):
        apply_changes(
            spark, t, _batch(spark, ROWS0), epoch=0,
            cfg=EngineConfig(n_buckets=4),
        )
    t.rollback(pre)
    assert t.constraints() == {}
    m = apply_changes(
        spark, t, _batch(spark, ROWS0), epoch=0, cfg=EngineConfig(n_buckets=4)
    )
    assert m["rows_applied"] == 4  # unconstrained again


def test_streaming_micro_batches_enforce_constraints(spark, tmp_path):
    """The Structured-Streaming ingest (foreachBatch -> apply_changes)
    inherits enforcement: drop-mode filters inside every micro-batch."""
    from cnpj_data_pipeline_spark.streaming.stream_job import stream_ingest

    wal = str(tmp_path / "wal")
    n_epochs = 2
    ch = gen_changes(spark, n_events=800, n_convs=30, n_epochs=n_epochs)
    for e, b in epoch_batches(ch, n_epochs):
        b.write.mode("append").parquet(wal)  # flat file-source layout
    lake = str(tmp_path / "lake")
    t = LakeTable.create(
        lake, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], 4
    )
    t.add_constraint(
        spark, "no_delta", "text IS NULL OR text NOT LIKE '%delta%'",
        on_violation="drop",
    )
    q = stream_ingest(
        spark, wal, t, str(tmp_path / "ckpt"), CHANGE_SCHEMA,
        cfg=EngineConfig(n_buckets=4),
    )
    q.awaitTermination(120)
    got = t.read(spark)
    assert got.count() > 0
    assert got.filter("text LIKE '%delta%'").count() == 0
