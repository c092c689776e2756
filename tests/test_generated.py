"""GENERATED columns (lake/generated.py): fail-closed declaration,
compute-when-absent / verify-when-supplied enforcement on both apply
paths, evolution interplay (rename keeps the declaration, drop retires
it, referenced columns are guarded), and the SQL DDL surface."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import types as T

from cnpj_data_pipeline_spark import EngineConfig, IngestJob, LakeTable
from cnpj_data_pipeline_spark.gen import epoch_batches, gen_changes
from cnpj_data_pipeline_spark.lake.generated import (
    GeneratedColumnMismatchError,
)
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA
from cnpj_data_pipeline_spark.sources import change_stream as cs

TS = datetime.datetime(2026, 3, 5, 10, 0)
DAY_EXPR = "CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)"
DAY_OF_TS = 20517  # epoch-day of TS


def _table(path, n_buckets=4):
    return LakeTable.create(
        str(path), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], n_buckets
    )


def _with_day(value):
    return T.StructType(
        CHANGE_SCHEMA.fields[:6]
        + [T.StructField("day_bucket", T.LongType(), True)]
        + CHANGE_SCHEMA.fields[6:]
    )


def test_declaration_fail_closed(spark, tmp_path):
    t = _table(tmp_path / "t")
    for name, dtype, expr, msg in [
        ("day", T.DateType(), "CAST(nope AS DATE)", "unknown column"),
        ("day", T.DateType(), "rand()", "non-deterministic"),
        ("role", T.StringType(), "upper(text)", "already exists"),
        ("day", T.DateType(), "", "non-empty"),
        ("bad name", T.DateType(), "CAST(ts AS DATE)", "invalid generated"),
    ]:
        with pytest.raises(ValueError, match=msg):
            t.add_generated_column(spark, name, dtype, expr)
    with pytest.raises(ValueError, match="concrete type"):
        t.add_generated_column(spark, "day", T.NullType(), "CAST(ts AS DATE)")
    t.add_generated_column(spark, "day_bucket", T.LongType(), DAY_EXPR)
    assert t.generated_columns()["day_bucket"]["refs"] == ["ts"]
    assert t.logical_schema().fieldNames()[-1] == "day_bucket"
    # raw props path reserved
    with pytest.raises(ValueError, match="engine-managed"):
        t.set_props({"generated.x": "{}"})
    with pytest.raises(ValueError, match="no GENERATED declaration"):
        t.drop_generated_expression("ghost")


def test_declaration_refuses_partial_engine(spark, tmp_path):
    t = LakeTable.create(
        str(tmp_path / "p"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], 4,
        merge_engine="partial",
    )
    with pytest.raises(ValueError, match="lww merge engine"):
        t.add_generated_column(spark, "day", T.LongType(), DAY_EXPR)


def test_computed_when_absent_verified_when_supplied(spark, tmp_path):
    t = _table(tmp_path / "t")
    t.add_generated_column(spark, "day_bucket", T.LongType(), DAY_EXPR)
    cfg = EngineConfig(n_buckets=4)
    rows = [
        ("c1", 0, "user", "hi", None, TS, "I", 1, 0),
        ("c1", 1, None, None, None, None, "D", 2, 0),
    ]
    apply_changes(
        spark, t, spark.createDataFrame(rows, CHANGE_SCHEMA), epoch=0,
        cfg=cfg,
    )
    out = {(r.conv_id, r.turn_idx): r.day_bucket for r in t.read(spark).collect()}
    assert out == {("c1", 0): DAY_OF_TS}

    # supplied-and-correct applies; supplied-and-wrong aborts the epoch
    sch = _with_day(None)
    ok = [("c2", 0, "user", "yo", None, TS, DAY_OF_TS, "I", 3, 1)]
    m = apply_changes(
        spark, t, spark.createDataFrame(ok, sch), epoch=1, cfg=cfg
    )
    assert m["rows_applied"] == 1
    bad = [("c3", 0, "user", "yo", None, TS, 123, "I", 4, 2)]
    with pytest.raises(GeneratedColumnMismatchError) as ei:
        apply_changes(
            spark, t, spark.createDataFrame(bad, sch), epoch=2, cfg=cfg
        )
    assert ei.value.counts == {"day_bucket": 1}
    assert sorted(t.applied_epochs()) == [0, 1]  # exactly-once: 2 pending
    # a delete row's supplied NULL never counts as a mismatch
    del_ok = [("c2", 0, None, None, None, None, None, "D", 5, 2)]
    m2 = apply_changes(
        spark, t, spark.createDataFrame(del_ok, sch), epoch=2, cfg=cfg
    )
    assert not m2["skipped"]


def test_evolution_interplay(spark, tmp_path):
    t = _table(tmp_path / "t")
    t.add_generated_column(spark, "day_bucket", T.LongType(), DAY_EXPR)
    # referenced column guarded
    with pytest.raises(ValueError, match="GENERATED column"):
        t.rename_column("ts", "event_ts")
    with pytest.raises(ValueError, match="GENERATED column"):
        t.drop_column("ts")
    # renaming the generated column itself moves the declaration
    t.rename_column("day_bucket", "day")
    assert set(t.generated_columns()) == {"day"}
    assert t.generated_columns()["day"]["expr"] == DAY_EXPR
    # retiring the declaration keeps the column as plain payload
    t.drop_generated_expression("day")
    assert t.generated_columns() == {}
    assert "day" in t.logical_schema().fieldNames()
    t.rename_column("ts", "event_ts")  # guard released
    # dropping a generated column retires its declaration with it
    t2 = _table(tmp_path / "t2")
    t2.add_generated_column(spark, "day_bucket", T.LongType(), DAY_EXPR)
    t2.drop_column("day_bucket")
    assert t2.generated_columns() == {}
    assert "day_bucket" not in t2.logical_schema().fieldNames()


def test_copart_requires_supplied_and_verifies(spark, tmp_path):
    import pyspark.sql.functions as F

    n_epochs, nb = 2, 4
    ch = gen_changes(spark, n_events=1_200, n_convs=50, n_epochs=n_epochs)
    keys = ["conv_id", "turn_idx"]

    # producer does NOT supply the column -> copart epoch fails loud
    wal_missing = str(tmp_path / "wal_missing")
    for e, b in epoch_batches(ch, n_epochs):
        cs.write_epoch_bucketed(b, wal_missing, e, keys, nb)
    lake1 = str(tmp_path / "lake1")
    job1 = IngestJob(lake1, EngineConfig(n_buckets=nb))
    t1 = job1.ensure_table()
    t1.add_generated_column(spark, "day_bucket", T.LongType(), DAY_EXPR)
    with pytest.raises(ValueError, match="does not carry GENERATED"):
        job1.run_stream(spark, wal_missing)
    # ...and the general path (copart off) computes it instead
    m = IngestJob(
        lake1, EngineConfig(n_buckets=nb, copart="off")
    ).run_stream(spark, wal_missing)
    assert len(m) == n_epochs
    got = LakeTable.load(lake1).read(spark)
    assert got.filter(
        ~F.col("day_bucket").eqNullSafe(F.expr(DAY_EXPR))
    ).count() == 0

    # producer pre-computes it -> copart verifies and stays zero-shuffle
    wal_ok = str(tmp_path / "wal_ok")
    ch_gen = ch.withColumn(
        "day_bucket",
        F.when(F.col("op") != "D", F.expr(DAY_EXPR)),
    )
    for e, b in epoch_batches(ch_gen, n_epochs):
        cs.write_epoch_bucketed(b, wal_ok, e, keys, nb)
    lake2 = str(tmp_path / "lake2")
    job2 = IngestJob(lake2, EngineConfig(n_buckets=nb))
    t2 = job2.ensure_table()
    t2.add_generated_column(spark, "day_bucket", T.LongType(), DAY_EXPR)
    m2 = job2.run_stream(spark, wal_ok)
    assert all(x.get("copartitioned") for x in m2)
    a = LakeTable.load(lake1).read(spark).orderBy("conv_id", "turn_idx")
    b = LakeTable.load(lake2).read(spark).orderBy("conv_id", "turn_idx")
    assert [r.asDict() for r in a.collect()] == [
        r.asDict() for r in b.collect()
    ]

    # a tampered producer value is caught by the copart verification
    wal_bad = str(tmp_path / "wal_bad")
    ch_bad = ch_gen.withColumn(
        "day_bucket",
        F.when(F.col("lsn") % 97 == 0, F.lit(1)).otherwise(
            F.col("day_bucket")
        ),
    )
    for e, b2 in epoch_batches(ch_bad, n_epochs):
        cs.write_epoch_bucketed(b2, wal_bad, e, keys, nb)
    lake3 = str(tmp_path / "lake3")
    job3 = IngestJob(lake3, EngineConfig(n_buckets=nb))
    t3 = job3.ensure_table()
    t3.add_generated_column(spark, "day_bucket", T.LongType(), DAY_EXPR)
    with pytest.raises(GeneratedColumnMismatchError):
        job3.run_stream(spark, wal_bad)


def test_sql_surface(spark, tmp_path):
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
            day_bucket BIGINT GENERATED ALWAYS AS ({DAY_EXPR}),
            PRIMARY KEY (conv_id, turn_idx)
        ) USING lake CLUSTERED BY (conv_id, turn_idx) INTO 4 BUCKETS
        LOCATION '{tmp_path / "conv"}'""",
        tables,
    )
    t = tables["conv"]
    assert t.generated_columns()["day_bucket"]["expr"] == DAY_EXPR
    stmt = show_create_table(t, "conv2")
    assert f"day_bucket BIGINT GENERATED ALWAYS AS ({DAY_EXPR})" in stmt
    assert "generated." not in stmt  # never leaks as raw TBLPROPERTIES
    execute_ddl(
        spark, stmt.replace("'<path>'", f"'{tmp_path / 'conv2'}'"), tables
    )
    assert tables["conv2"].generated_columns() == t.generated_columns()
    # ALTER form
    execute_ddl(
        spark,
        "ALTER TABLE conv ADD COLUMN week_bucket BIGINT GENERATED ALWAYS "
        f"AS (({DAY_EXPR}) DIV 7)",
        tables,
    )
    assert set(t.generated_columns()) == {"day_bucket", "week_bucket"}
    # DESCRIBE marks the derivation
    rows = execute_ddl(spark, "DESCRIBE conv", tables).collect()
    marked = {r[0]: r[2] for r in rows}
    assert "generated:" in marked["day_bucket"]


def test_default_mode_keeps_writer_values(spark, tmp_path):
    t = _table(tmp_path / "t")
    t.add_generated_column(
        spark, "day_bucket", T.LongType(), DAY_EXPR, mode="default"
    )
    cfg = EngineConfig(n_buckets=4)
    # absent -> computed
    rows = [("c1", 0, "user", "hi", None, TS, "I", 1, 0)]
    apply_changes(
        spark, t, spark.createDataFrame(rows, CHANGE_SCHEMA), epoch=0,
        cfg=cfg,
    )
    # supplied (even 'wrong' and even NULL) -> writer's values kept,
    # no verification pass
    sch = _with_day(None)
    sup = [
        ("c2", 0, "user", "yo", None, TS, 999, "I", 2, 1),
        ("c3", 0, "user", "yo", None, TS, None, "I", 3, 1),
    ]
    apply_changes(
        spark, t, spark.createDataFrame(sup, sch), epoch=1, cfg=cfg
    )
    out = {r.conv_id: r.day_bucket for r in t.read(spark).collect()}
    assert out == {"c1": DAY_OF_TS, "c2": 999, "c3": None}
    with pytest.raises(ValueError, match="unknown generated-column mode"):
        t.add_generated_column(
            spark, "x", T.LongType(), DAY_EXPR, mode="sometimes"
        )


def test_default_mode_sql_surface(spark, tmp_path):
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
            src STRING DEFAULT ('wal'),
            PRIMARY KEY (conv_id, turn_idx)
        ) USING lake CLUSTERED BY (conv_id, turn_idx) INTO 4 BUCKETS
        LOCATION '{tmp_path / "conv"}'""",
        tables,
    )
    t = tables["conv"]
    assert t.generated_columns()["src"]["mode"] == "default"
    stmt = show_create_table(t, "conv2")
    assert "src STRING DEFAULT ('wal')" in stmt
    execute_ddl(
        spark, stmt.replace("'<path>'", f"'{tmp_path / 'conv2'}'"), tables
    )
    assert tables["conv2"].generated_columns() == t.generated_columns()
    execute_ddl(
        spark,
        "ALTER TABLE conv ADD COLUMN batch_tag STRING DEFAULT ('v1')",
        tables,
    )
    assert t.generated_columns()["batch_tag"]["mode"] == "default"
