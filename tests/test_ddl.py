"""SQL DDL surface: CREATE TABLE / ALTER TABLE statements compiling to
the engine's table-format operations (lake/ddl.py). The reference is
DDL-driven end to end — its schema system IS the CREATE TABLE text in
init-db/postgres.sql; these tests prove a pure-SQL deployment can declare
and evolve lake tables with the same guarantees as the Python API, and
that the explicit ADD COLUMN / ALTER COLUMN TYPE forms compose with the
ingest path's implicit evolution."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.types as T
import pytest

from cnpj_data_pipeline_spark import (
    EngineConfig,
    LakeTable,
    apply_changes,
    execute_ddl,
    merge_into,
)
from cnpj_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA

CFG = EngineConfig(n_buckets=4, salt_factor=1, compact_threshold=None)
TS = dt.datetime(2026, 1, 1)

CREATE = """
CREATE TABLE transcripts (
    conv_id STRING,
    turn_idx INT,
    role STRING,
    text STRING,
    tool STRING,
    ts TIMESTAMP,
    PRIMARY KEY (conv_id, turn_idx)
)
USING lake
CLUSTERED BY (conv_id) INTO 8 BUCKETS
LOCATION '{loc}'
TBLPROPERTIES ('owner'='ddl-test')
"""


def _batch_df(spark, rows, schema=TRANSCRIPT_SCHEMA):
    sch = T.StructType(
        list(schema.fields)
        + [
            T.StructField("op", T.StringType(), False),
            T.StructField("lsn", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(rows, sch)


ROWS0 = [
    ("a", 0, "user", "hi", None, TS, "I", 1),
    ("b", 0, "user", "yo", None, TS, "I", 2),
    ("a", 1, "assistant", "hello", "search", TS, "I", 3),
]


def test_create_table(spark, tmp_path):
    tables: dict = {}
    t = execute_ddl(spark, CREATE.format(loc=tmp_path / "t"), tables)
    assert isinstance(t, LakeTable)
    assert tables["transcripts"] is t
    assert t.key_cols() == ["conv_id", "turn_idx"]
    assert t.bucket_cols() == ["conv_id"]
    assert t.n_buckets() == 8
    assert t.props()["owner"] == "ddl-test"
    assert [f.name for f in t.schema().fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    # the created table ingests normally
    apply_changes(spark, t, _batch_df(spark, ROWS0), epoch=0, cfg=CFG)
    assert t.read(spark).count() == 3


def test_create_keyless_and_engines(spark, tmp_path):
    tables: dict = {}
    t = execute_ddl(
        spark,
        f"CREATE TABLE log (k STRING, n INT) LOCATION '{tmp_path}/log'",
        tables,
    )
    assert t.key_cols() is None  # no PRIMARY KEY -> append-only
    agg = execute_ddl(
        spark,
        "CREATE TABLE counters (k STRING, n BIGINT, PRIMARY KEY (k)) "
        f"LOCATION '{tmp_path}/agg' "
        "TBLPROPERTIES ('merge_engine'='aggregate', 'agg.n'='sum')",
        tables,
    )
    snap = agg.snapshot()
    assert snap["merge_engine"] == "aggregate"
    assert snap["agg_spec"] == {"n": "sum"}
    assert set(tables) == {"log", "counters"}


def test_create_validation(spark, tmp_path):
    tables: dict = {}
    with pytest.raises(ValueError, match="LOCATION"):
        execute_ddl(spark, "CREATE TABLE t (a INT)", tables)
    with pytest.raises(ValueError, match="PRIMARY KEY column"):
        execute_ddl(
            spark,
            "CREATE TABLE t (a INT, PRIMARY KEY (b)) "
            f"LOCATION '{tmp_path}/x'",
            tables,
        )
    execute_ddl(
        spark, f"CREATE TABLE t (a INT) LOCATION '{tmp_path}/t'", tables
    )
    with pytest.raises(ValueError, match="already registered"):
        execute_ddl(
            spark, f"CREATE TABLE t (a INT) LOCATION '{tmp_path}/t2'", tables
        )


def _mk(spark, tmp_path, tables):
    t = execute_ddl(spark, CREATE.format(loc=tmp_path / "t"), tables)
    apply_changes(spark, t, _batch_df(spark, ROWS0), epoch=0, cfg=CFG)
    return t


def test_alter_rename_drop(spark, tmp_path):
    tables: dict = {}
    t = _mk(spark, tmp_path, tables)
    execute_ddl(spark, "ALTER TABLE transcripts RENAME COLUMN tool TO fn", tables)
    assert "fn" in [f.name for f in t.logical_schema().fields]
    execute_ddl(spark, "ALTER TABLE transcripts DROP COLUMN fn", tables)
    names = [f.name for f in t.schema().fields]
    assert "tool" not in names and "fn" not in names
    # the data read reflects both evolutions
    assert "fn" not in t.read(spark).columns


def test_alter_add_and_widen(spark, tmp_path):
    tables: dict = {}
    t = _mk(spark, tmp_path, tables)
    execute_ddl(spark, "ALTER TABLE transcripts ADD COLUMN score FLOAT", tables)
    execute_ddl(
        spark,
        "ALTER TABLE transcripts ADD COLUMNS (meta MAP<STRING,STRING>, "
        "n_tokens INT)",
        tables,
    )
    by_name = {f.name: f.dataType for f in t.schema().fields}
    assert isinstance(by_name["score"], T.FloatType)
    assert isinstance(by_name["meta"], T.MapType)
    # pre-evolution files read back NULL for the new columns
    row = t.read(spark).filter("conv_id = 'a' AND turn_idx = 0").first()
    assert row["score"] is None and row["n_tokens"] is None
    # explicit widening, declared ahead of the data that needs the range
    execute_ddl(
        spark, "ALTER TABLE transcripts ALTER COLUMN score TYPE DOUBLE", tables
    )
    execute_ddl(
        spark, "ALTER TABLE transcripts ALTER COLUMN n_tokens TYPE BIGINT", tables
    )
    by_name = {f.name: f.dataType for f in t.schema().fields}
    assert isinstance(by_name["score"], T.DoubleType)
    assert isinstance(by_name["n_tokens"], T.LongType)
    # and a post-widen ingest carrying wide values lands intact
    sch = T.StructType(
        list(t.schema().fields)
        + [
            T.StructField("op", T.StringType(), False),
            T.StructField("lsn", T.LongType(), False),
        ]
    )
    big = 2**40
    batch = spark.createDataFrame(
        [("z", 0, "user", "wide", None, TS, 0.5, None, big, "I", 10)], sch
    )
    apply_changes(spark, t, batch, epoch=1, cfg=CFG)
    got = t.read(spark).filter("conv_id = 'z'").first()
    assert got["n_tokens"] == big


def test_alter_validation(spark, tmp_path):
    tables: dict = {}
    t = _mk(spark, tmp_path, tables)
    with pytest.raises(ValueError, match="already exists"):
        execute_ddl(spark, "ALTER TABLE transcripts ADD COLUMN role INT", tables)
    with pytest.raises(ValueError, match="key/bucket"):
        execute_ddl(
            spark,
            "ALTER TABLE transcripts ALTER COLUMN turn_idx TYPE BIGINT",
            tables,
        )
    with pytest.raises(ValueError, match="not a widening"):
        # first widen up, then try to narrow back
        execute_ddl(
            spark, "ALTER TABLE transcripts ADD COLUMN n BIGINT", tables
        )
        execute_ddl(
            spark, "ALTER TABLE transcripts ALTER COLUMN n TYPE INT", tables
        )
    with pytest.raises(ValueError, match="in-family"):
        execute_ddl(
            spark, "ALTER TABLE transcripts ALTER COLUMN n TYPE DOUBLE", tables
        )
    execute_ddl(spark, "ALTER TABLE transcripts DROP COLUMN tool", tables)
    with pytest.raises(ValueError, match="tombstone"):
        execute_ddl(spark, "ALTER TABLE transcripts ADD COLUMN tool INT", tables)
    with pytest.raises(ValueError, match="unknown DDL target"):
        execute_ddl(spark, "ALTER TABLE nope ADD COLUMN x INT", tables)
    with pytest.raises(ValueError, match="unsupported clause"):
        execute_ddl(spark, "ALTER TABLE transcripts FROBNICATE", tables)
    with pytest.raises(ValueError, match="engine-managed"):
        execute_ddl(
            spark,
            "ALTER TABLE transcripts SET TBLPROPERTIES ('sort_order'='ts')",
            tables,
        )


def test_alter_props_and_sort_order(spark, tmp_path):
    tables: dict = {}
    t = _mk(spark, tmp_path, tables)
    execute_ddl(
        spark,
        "ALTER TABLE transcripts SET TBLPROPERTIES ('retention'='30d', "
        "'team'='ml-infra')",
        tables,
    )
    assert t.props()["retention"] == "30d"
    execute_ddl(spark, "ALTER TABLE transcripts WRITE ORDERED BY (ts)", tables)
    assert t.sort_order() == ["ts"]
    execute_ddl(
        spark,
        "ALTER TABLE transcripts WRITE ORDERED BY ZORDER (ts, turn_idx)",
        tables,
    )
    assert t.sort_order() == ["ts", "turn_idx"]
    assert t.props()["sort_order_kind"] == "zorder"
    execute_ddl(spark, "ALTER TABLE transcripts WRITE UNORDERED", tables)
    assert t.sort_order() is None


def test_ddl_then_dml_roundtrip(spark, tmp_path):
    """A deployment speaking ONLY SQL: CREATE, MERGE, ALTER, MERGE — the
    declared evolution composes with the ingest path's implicit one."""
    tables: dict = {}
    t = execute_ddl(spark, CREATE.format(loc=tmp_path / "t"), tables)
    _batch_df(spark, ROWS0).createOrReplaceTempView("b0")
    merge_into(
        spark,
        "MERGE INTO transcripts AS t USING b0 AS s "
        "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx "
        "WHEN MATCHED AND s.op = 'D' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        tables,
        epoch=0,
        cfg=CFG,
    )
    execute_ddl(spark, "ALTER TABLE transcripts ADD COLUMN lang STRING", tables)
    sch = T.StructType(
        list(t.schema().fields)
        + [
            T.StructField("op", T.StringType(), False),
            T.StructField("lsn", T.LongType(), False),
        ]
    )
    spark.createDataFrame(
        [("a", 0, "user", "hi!", None, TS, "en", "U", 9)], sch
    ).createOrReplaceTempView("b1")
    merge_into(
        spark,
        "MERGE INTO transcripts AS t USING b1 AS s "
        "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        tables,
        epoch=1,
        cfg=CFG,
    )
    rows = {
        (r["conv_id"], r["turn_idx"]): r
        for r in t.read(spark).collect()
    }
    assert rows[("a", 0)]["text"] == "hi!" and rows[("a", 0)]["lang"] == "en"
    assert rows[("b", 0)]["lang"] is None
    assert len(rows) == 3


def test_show_create_roundtrip(spark, tmp_path):
    """SHOW CREATE TABLE round-trips through execute_ddl: the recreated
    table carries the same logical schema, key, layout, merge engine, agg
    spec, and user properties — the replication twin of the outbound
    change feed (SHOW CREATE + the Debezium epoch stream stands up a live
    replica elsewhere)."""
    tables: dict = {}
    execute_ddl(
        spark,
        "CREATE TABLE counters (k STRING, n BIGINT, note STRING, "
        "PRIMARY KEY (k, n)) "
        "CLUSTERED BY (k) INTO 8 BUCKETS "
        f"LOCATION '{tmp_path}/a' "
        "TBLPROPERTIES ('merge_engine'='aggregate', 'agg.note'='last', "
        "'owner'='ml')",
        tables,
    )
    stmt = execute_ddl(spark, "SHOW CREATE TABLE counters", tables)
    assert isinstance(stmt, str) and "'agg.note'='last'" in stmt
    twin_tables: dict = {}
    twin = execute_ddl(
        spark, stmt.replace("<path>", f"{tmp_path}/b"), twin_tables
    )
    src = tables["counters"]
    assert twin.schema() == src.schema()
    assert twin.key_cols() == src.key_cols()
    assert twin.bucket_cols() == src.bucket_cols()
    assert twin.n_buckets() == src.n_buckets()
    assert twin.snapshot()["merge_engine"] == "aggregate"
    assert twin.snapshot()["agg_spec"] == src.snapshot()["agg_spec"]
    assert twin.props()["owner"] == "ml"


def test_show_create_roundtrip_keyless_and_renamed(spark, tmp_path):
    tables: dict = {}
    execute_ddl(
        spark,
        f"CREATE TABLE log (k STRING, v INT) CLUSTERED INTO 4 BUCKETS "
        f"LOCATION '{tmp_path}/log'",
        tables,
    )
    stmt = execute_ddl(spark, "SHOW CREATE TABLE log", tables)
    assert "CLUSTERED INTO 4 BUCKETS" in stmt and "PRIMARY KEY" not in stmt
    twin = execute_ddl(
        spark, stmt.replace("<path>", f"{tmp_path}/log2"), {}
    )
    assert twin.key_cols() is None and twin.n_buckets() == 4
    # renamed source -> the replica declares the LOGICAL name natively
    t = _mk(spark, tmp_path, tables)
    execute_ddl(spark, "ALTER TABLE transcripts RENAME COLUMN tool TO fn", tables)
    stmt = execute_ddl(spark, "SHOW CREATE TABLE transcripts", tables)
    assert " fn " in stmt.replace("\n", " ") and "tool" not in stmt
    twin = execute_ddl(
        spark, stmt.replace("<path>", f"{tmp_path}/t2"), {}
    )
    assert [f.name for f in twin.schema().fields] == [
        f.name for f in t.logical_schema().fields
    ]


def test_describe(spark, tmp_path):
    tables: dict = {}
    t = _mk(spark, tmp_path, tables)
    execute_ddl(spark, "ALTER TABLE transcripts WRITE ORDERED BY (ts)", tables)
    rows = execute_ddl(spark, "DESCRIBE transcripts", tables).collect()
    by_col = {r["col_name"]: r for r in rows}
    assert by_col["conv_id"]["info"] == "key, bucket"
    assert by_col["turn_idx"]["info"] == "key"  # bucketed on conv_id only
    assert by_col["ts"]["info"] == "sort#0"
    ext = execute_ddl(spark, "DESCRIBE EXTENDED transcripts", tables).collect()
    meta = {r["col_name"]: r["data_type"] for r in ext}
    assert meta["Location"] == t.root
    assert meta["Num Buckets"] == "8"
    assert meta["Sort Order"] == "ts"

    # SHOW CREATE emits the declared sort order and round-trips it
    stmt = execute_ddl(spark, "SHOW CREATE TABLE transcripts", tables)
    assert "WRITE ORDERED BY (ts)" in stmt
    twin = execute_ddl(
        spark, stmt.replace("<path>", f"{tmp_path}/sorted2"), {}
    )
    assert twin.sort_order() == ["ts"]

    # a renamed sorted column keeps its sort annotation under the NEW name
    execute_ddl(spark, "ALTER TABLE transcripts RENAME COLUMN ts TO at", tables)
    rows = execute_ddl(spark, "DESCRIBE transcripts", tables).collect()
    by_col = {r["col_name"]: r for r in rows}
    assert "ts" not in by_col and by_col["at"]["info"] == "sort#0"
    ext = execute_ddl(spark, "DESCRIBE EXTENDED transcripts", tables).collect()
    meta = {r["col_name"]: r["data_type"] for r in ext}
    assert meta["Sort Order"] == "at"
    # ... and SHOW CREATE emits the logical name too (ZORDER keyword kept)
    execute_ddl(
        spark,
        "ALTER TABLE transcripts WRITE ORDERED BY ZORDER (at, turn_idx)",
        tables,
    )
    stmt = execute_ddl(spark, "SHOW CREATE TABLE transcripts", tables)
    assert "WRITE ORDERED BY ZORDER (at, turn_idx)" in stmt


def test_if_exists_forms(spark, tmp_path):
    tables: dict = {}
    t = _mk(spark, tmp_path, tables)
    # CREATE IF NOT EXISTS: registered -> returns it; on-disk -> loads it
    same = execute_ddl(
        spark,
        "CREATE TABLE IF NOT EXISTS transcripts (x INT) "
        f"LOCATION '{tmp_path}/other'",
        tables,
    )
    assert same is t  # never re-created, statement schema NOT reconciled
    fresh: dict = {}
    loaded = execute_ddl(
        spark,
        "CREATE TABLE IF NOT EXISTS transcripts (x INT) "
        f"LOCATION '{t.root}'",
        fresh,
    )
    assert loaded.root == t.root and "x" not in [
        f.name for f in loaded.schema().fields
    ]
    # ADD COLUMN IF NOT EXISTS / DROP COLUMN IF EXISTS are idempotent
    sid1 = execute_ddl(
        spark, "ALTER TABLE transcripts ADD COLUMN IF NOT EXISTS lang STRING",
        tables,
    )
    sid2 = execute_ddl(
        spark, "ALTER TABLE transcripts ADD COLUMN IF NOT EXISTS lang STRING",
        tables,
    )
    assert sid2 == sid1  # second run is a metadata no-op
    execute_ddl(
        spark, "ALTER TABLE transcripts DROP COLUMN IF EXISTS lang", tables
    )
    sid3 = execute_ddl(
        spark, "ALTER TABLE transcripts DROP COLUMN IF EXISTS lang", tables
    )
    assert sid3 == t.current_snapshot_id()
    # without IF NOT EXISTS the duplicate add still raises
    with pytest.raises(ValueError, match="already registered"):
        execute_ddl(
            spark,
            f"CREATE TABLE transcripts (x INT) LOCATION '{tmp_path}/z'",
            tables,
        )


BOOTSTRAP = """
-- bootstrap: declare, seed, evolve, repair — one resumable script
CREATE TABLE IF NOT EXISTS transcripts (
    conv_id STRING,
    turn_idx INT,
    role STRING,
    text STRING,
    tool STRING,
    ts TIMESTAMP,
    PRIMARY KEY (conv_id, turn_idx)
) CLUSTERED BY (conv_id, turn_idx) INTO 4 BUCKETS
  LOCATION '{loc}';

MERGE INTO transcripts AS t USING seed AS s
ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
WHEN MATCHED AND s.op = 'D' THEN DELETE
WHEN MATCHED THEN UPDATE SET *
WHEN NOT MATCHED THEN INSERT *;

ALTER TABLE transcripts ADD COLUMN IF NOT EXISTS lang STRING;

UPDATE transcripts SET lang = 'en' WHERE role = 'user';  -- backfill
"""


def test_run_sql_script_resumable(spark, tmp_path):
    from cnpj_data_pipeline_spark.lake.ddl import run_sql_script

    _batch_df(spark, ROWS0).createOrReplaceTempView("seed")
    script = BOOTSTRAP.format(loc=tmp_path / "t")
    tables: dict = {}
    res = run_sql_script(spark, script, tables, epoch_base=100)
    assert [r["kind"] for r in res] == ["ddl", "dml", "ddl", "dml"]
    t = tables["transcripts"]
    rows = {(r["conv_id"], r["turn_idx"]): r for r in t.read(spark).collect()}
    assert rows[("a", 0)]["lang"] == "en" and rows[("a", 1)]["lang"] is None

    # re-run: every statement is a skip/no-op, state unchanged
    res2 = run_sql_script(spark, script, {}, epoch_base=100)
    assert res2[1]["result"]["skipped"] and res2[3]["result"]["skipped"]
    assert t.current_snapshot_id() == res[3]["result"]["snapshot_id"]


def test_create_table_clone(spark, tmp_path):
    tables: dict = {}
    t = execute_ddl(spark, CREATE.format(loc=tmp_path / "t"), tables)
    apply_changes(spark, t, _batch_df(spark, ROWS0), epoch=0, cfg=CFG)
    sid1 = t.current_snapshot_id()
    t.create_tag("fork-here", sid1)
    apply_changes(
        spark,
        t,
        _batch_df(spark, [("c", 0, "user", "new", None, TS, "I", 9)]),
        epoch=1,
        cfg=CFG,
    )

    head = execute_ddl(
        spark,
        f"CREATE TABLE fork SHALLOW CLONE transcripts LOCATION '{tmp_path}/f1'",
        tables,
    )
    assert isinstance(head, LakeTable) and tables["fork"] is head
    assert head.read(spark).count() == 4
    assert head.foreign_files()  # zero-copy

    by_ver = execute_ddl(
        spark,
        "CREATE TABLE fork_v CLONE transcripts "
        f"VERSION AS OF {sid1} LOCATION '{tmp_path}/f2'",
        tables,
    )
    by_tag = execute_ddl(
        spark,
        "CREATE TABLE fork_t CLONE transcripts TAG 'fork-here' "
        f"LOCATION '{tmp_path}/f3'",
        tables,
    )
    assert by_ver.read(spark).count() == 3
    assert by_tag.read(spark).count() == 3

    # IF NOT EXISTS resumability: re-running the bootstrap with a fresh
    # registry loads the landed fork instead of failing
    fresh = {"transcripts": t}
    again = execute_ddl(
        spark,
        "CREATE TABLE IF NOT EXISTS fork SHALLOW CLONE transcripts "
        f"LOCATION '{tmp_path}/f1'",
        fresh,
    )
    assert again.root == head.root

    with pytest.raises(ValueError, match="already registered"):
        execute_ddl(
            spark,
            f"CREATE TABLE fork CLONE transcripts LOCATION '{tmp_path}/f4'",
            tables,
        )
    with pytest.raises(ValueError, match="not registered"):
        execute_ddl(
            spark,
            f"CREATE TABLE x CLONE nope LOCATION '{tmp_path}/f5'",
            tables,
        )


def test_maintenance_statements(spark, tmp_path):
    """A pure-SQL deployment running its own upkeep: OPTIMIZE / VACUUM /
    RESTORE / tag DDL / SHOW SNAPSHOTS|TAGS, each compiling to the same
    engine op the maintenance CLI (tools/run_maintenance.py) invokes."""
    tables: dict = {}
    t = execute_ddl(spark, CREATE.format(loc=tmp_path / "t"), tables)
    apply_changes(spark, t, _batch_df(spark, ROWS0), epoch=0, cfg=CFG)
    sid_good = t.current_snapshot_id()
    execute_ddl(spark, "ALTER TABLE transcripts CREATE TAG 'good'", tables)

    # epoch 1: an edit and a delete -> multi-generation MoR buckets plus
    # a live tombstone
    apply_changes(
        spark,
        t,
        _batch_df(
            spark,
            [
                ("a", 0, "user", "EDITED", None, TS, "U", 10),
                ("b", 0, "user", "yo", None, TS, "D", 11),
            ],
        ),
        epoch=1,
        cfg=CFG,
    )
    snap = t.snapshot()
    assert any(
        not info.get("merged", True) for info in snap["buckets"].values()
    )
    assert t.read(spark, include_tombstones=True).count() > t.read(
        spark
    ).count()

    # OPTIMIZE -> compact: every bucket back to one generation, state
    # byte-identical
    before = t.read(spark).orderBy("conv_id", "turn_idx").collect()
    sid = execute_ddl(spark, "OPTIMIZE transcripts", tables)
    snap = t.snapshot()
    assert snap["snapshot_id"] == sid
    assert all(
        info.get("merged", True) for info in snap["buckets"].values()
    )
    assert t.read(spark).orderBy("conv_id", "turn_idx").collect() == before

    # VACUUM ... TOMBSTONES BELOW LSN -> settled deletes physically gone
    execute_ddl(
        spark, "VACUUM transcripts TOMBSTONES BELOW LSN 12", tables
    )
    assert t.read(spark, include_tombstones=True).count() == t.read(
        spark
    ).count()

    # SHOW TAGS / SHOW SNAPSHOTS are DataFrames over the metadata
    tags = {
        r["tag"]: r["snapshot_id"]
        for r in execute_ddl(spark, "SHOW TAGS transcripts", tables).collect()
    }
    assert tags == {"good": sid_good}
    hist = execute_ddl(spark, "SHOW SNAPSHOTS transcripts", tables)
    hrows = hist.collect()
    assert len(hrows) == len(t.snapshots())
    assert any("good" in r["tags"] for r in hrows)

    # RESTORE TABLE ... TO TAG -> the epoch-0 state, history preserved
    execute_ddl(spark, "RESTORE TABLE transcripts TO TAG 'good'", tables)
    rows = {
        (r["conv_id"], r["turn_idx"]): r for r in t.read(spark).collect()
    }
    assert rows[("a", 0)]["text"] == "hi" and ("b", 0) in rows

    # DROP TAG: strict form errors when absent, IF EXISTS is idempotent
    execute_ddl(spark, "ALTER TABLE transcripts DROP TAG 'good'", tables)
    execute_ddl(
        spark, "ALTER TABLE transcripts DROP TAG IF EXISTS 'good'", tables
    )
    with pytest.raises(ValueError, match="no tag"):
        execute_ddl(spark, "ALTER TABLE transcripts DROP TAG 'good'", tables)

    # VACUUM RETAIN n SNAPSHOTS -> history beyond the horizon expired
    stats = execute_ddl(
        spark, "VACUUM transcripts RETAIN 1 SNAPSHOTS", tables
    )
    assert stats["snapshots_removed"] > 0
    assert len(t.snapshots()) == 1
    rows = {
        (r["conv_id"], r["turn_idx"]): r for r in t.read(spark).collect()
    }
    assert rows[("a", 0)]["text"] == "hi" and len(rows) == 3


def test_maintenance_statements_refused_inside_transaction(spark, tmp_path):
    """OPTIMIZE/VACUUM/RESTORE commit their own metadata CAS and cannot
    stage — the script runner refuses them inside BEGIN blocks (the SHOW
    forms remain allowed anywhere)."""
    from cnpj_data_pipeline_spark.lake.ddl import run_sql_script
    from cnpj_data_pipeline_spark.lake.txn_catalog import Catalog

    tables: dict = {}
    t = execute_ddl(spark, CREATE.format(loc=tmp_path / "t"), tables)
    apply_changes(spark, t, _batch_df(spark, ROWS0), epoch=0, cfg=CFG)
    cat = Catalog.create(str(tmp_path / "cat"))
    cat.register("transcripts", t)
    with pytest.raises(ValueError, match="DDL inside a transaction"):
        run_sql_script(
            spark,
            "BEGIN; OPTIMIZE transcripts; COMMIT;",
            tables,
            catalog=cat,
        )
    res = run_sql_script(
        spark,
        "BEGIN; SHOW SNAPSHOTS transcripts; COMMIT;",
        tables,
        catalog=cat,
    )
    assert res[1]["kind"] == "ddl" and res[1]["result"].count() >= 1


def test_add_columns_if_not_exists_resumable(spark, tmp_path):
    """ADD COLUMNS compiles to one commit per column; the IF NOT EXISTS
    form makes a crash mid-list re-runnable (already-landed columns skip,
    the rest still apply) — the plural twin of ADD COLUMN IF NOT EXISTS."""
    tables: dict = {}
    t = execute_ddl(spark, CREATE.format(loc=tmp_path / "t"), tables)
    # simulate the crash: the first column already landed
    execute_ddl(spark, "ALTER TABLE transcripts ADD COLUMN lang STRING", tables)
    execute_ddl(
        spark,
        "ALTER TABLE transcripts ADD COLUMNS IF NOT EXISTS "
        "(lang STRING, score DOUBLE)",
        tables,
    )
    names = [f.name for f in t.logical_schema().fields]
    assert names.count("lang") == 1 and "score" in names
    # the strict form still surfaces drift loudly
    with pytest.raises(ValueError, match="already exists"):
        execute_ddl(
            spark,
            "ALTER TABLE transcripts ADD COLUMNS (lang STRING)",
            tables,
        )
