"""SQL surface: spark.sql over lake tables via temp-view registration.

The reference's downstream consumers run plain SQL against the sink after
ingest (multi-table join examples, ``docs/data-schema/relationships.md:
36-60,96-118``); these tests prove the same workflows run against the lake
engine's resolved state, with snapshot pinning, time travel, history, and
change-window views."""

from __future__ import annotations

import pandas as pd

from cnpj_data_pipeline_spark import EngineConfig, LakeTable, apply_changes
from cnpj_data_pipeline_spark.lake.sql import (
    register_catalog,
    register_changes_view,
    register_history_view,
    register_view,
)
from cnpj_data_pipeline_spark.queries.multitable import CONV_SCHEMA
from cnpj_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA

TS = pd.Timestamp("2026-01-01")


def _changes(spark, rows, cols, schema_cols):
    df = spark.createDataFrame(pd.DataFrame(rows, columns=cols))
    return df.select(*schema_cols, "op", "lsn")


def _build_tables(spark, tmp_path):
    cfg = EngineConfig(n_buckets=4, salt_factor=2)
    convs = LakeTable.create(
        str(tmp_path / "convs"), CONV_SCHEMA, ("conv_id",), n_buckets=4
    )
    turns = LakeTable.create(
        str(tmp_path / "turns"), TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"), n_buckets=4
    )
    conv_rows = [(f"c{i}", f"title-{i}", TS, "I", i) for i in range(6)]
    apply_changes(
        spark,
        convs,
        _changes(
            spark,
            conv_rows,
            ["conv_id", "title", "ts", "op", "lsn"],
            ["conv_id", "title", "ts"],
        ),
        epoch=0,
        cfg=cfg,
    )
    turn_rows = [
        (f"c{i}", t, "user" if t % 2 == 0 else "assistant", f"msg {i}-{t}", None, TS, "I", 100 + 10 * i + t)
        for i in range(6)
        for t in range(i % 3 + 1)
    ]
    apply_changes(
        spark,
        turns,
        _changes(
            spark,
            turn_rows,
            ["conv_id", "turn_idx", "role", "text", "tool", "ts", "op", "lsn"],
            ["conv_id", "turn_idx", "role", "text", "tool", "ts"],
        ),
        epoch=0,
        cfg=cfg,
    )
    return cfg, convs, turns


def test_sql_join_over_registered_catalog(spark, tmp_path):
    _, convs, turns = _build_tables(spark, tmp_path)
    register_catalog(spark, {"convs": convs, "turns": turns}, history=True)

    # the reference-style downstream join: dimension x fact + aggregate
    got = spark.sql(
        """
        SELECT c.conv_id, c.title, COUNT(t.turn_idx) AS n_turns
        FROM convs c LEFT JOIN turns t USING (conv_id)
        GROUP BY c.conv_id, c.title
        ORDER BY c.conv_id
        """
    ).toPandas()
    expected = {f"c{i}": i % 3 + 1 for i in range(6)}
    assert dict(zip(got.conv_id, got.n_turns)) == expected
    assert list(got.columns) == ["conv_id", "title", "n_turns"]

    # history companion views exist and carry one row per applied epoch
    hist = spark.sql(
        "SELECT DISTINCT snapshot_id, op FROM convs_history"
    ).toPandas()
    assert len(hist) == 1 and set(hist.op) <= {"append", "merge", "evolve"}


def test_view_is_snapshot_pinned_and_refreshable(spark, tmp_path):
    cfg, convs, _ = _build_tables(spark, tmp_path)
    register_view(spark, convs, "convs_pinned")
    before = spark.sql("SELECT count(*) AS n FROM convs_pinned").collect()[0].n

    # a commit AFTER registration must not shift the view (snapshot isolation)
    apply_changes(
        spark,
        convs,
        _changes(
            spark,
            [("c99", "late", TS, "I", 999)],
            ["conv_id", "title", "ts", "op", "lsn"],
            ["conv_id", "title", "ts"],
        ),
        epoch=1,
        cfg=cfg,
    )
    assert spark.sql("SELECT count(*) AS n FROM convs_pinned").collect()[0].n == before

    # re-register = refresh to the new head
    register_view(spark, convs, "convs_pinned")
    assert (
        spark.sql("SELECT count(*) AS n FROM convs_pinned").collect()[0].n
        == before + 1
    )

    # explicit time travel back to the first apply snapshot
    first_sid = min(
        s["snapshot_id"]
        for s in convs.snapshots()
        if s["op"] in ("append", "merge", "evolve")
    )
    register_view(spark, convs, "convs_v1", snapshot_id=first_sid)
    assert spark.sql("SELECT count(*) AS n FROM convs_v1").collect()[0].n == before


def test_changes_window_view(spark, tmp_path):
    cfg, convs, _ = _build_tables(spark, tmp_path)
    head_after_e0 = convs.current_snapshot_id()
    apply_changes(
        spark,
        convs,
        _changes(
            spark,
            [("c0", "renamed", TS, "U", 1000), ("c1", None, TS, "D", 1001)],
            ["conv_id", "title", "ts", "op", "lsn"],
            ["conv_id", "title", "ts"],
        ),
        epoch=1,
        cfg=cfg,
    )
    register_changes_view(spark, convs, "convs_changes", from_snapshot=head_after_e0)
    got = spark.sql(
        "SELECT conv_id, __op FROM convs_changes ORDER BY conv_id"
    ).toPandas()
    assert list(map(tuple, got.itertuples(index=False))) == [
        ("c0", "U"),
        ("c1", "D"),
    ]


def test_consistent_frontier_hides_torn_multi_table_state(spark, tmp_path):
    """Crash between a parent's epoch-1 commit and its child's: head reads
    are torn (convs at e1, turns at e0); the consistent frontier pins both
    at e0 until the child catches up."""
    import pandas as pd_
    from cnpj_data_pipeline_spark import (
        MultiTableIngestJob,
        TableCatalog,
        TableSpec,
    )
    from cnpj_data_pipeline_spark.lake.sql import consistent_frontier
    import pytest as pytest_

    catalog = TableCatalog(
        [
            TableSpec("convs", CONV_SCHEMA, key_cols=("conv_id",)),
            TableSpec(
                "turns",
                TRANSCRIPT_SCHEMA,
                key_cols=("conv_id", "turn_idx"),
                depends_on=("convs",),
            ),
        ]
    )
    wal = str(tmp_path / "wal")
    conv_cols = ["conv_id", "title", "ts", "op", "lsn"]
    turn_cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "op", "lsn"]
    batches = {
        ("convs", 0): ([("c0", "t0", TS, "I", 1), ("c1", "t1", TS, "I", 2)], conv_cols),
        ("turns", 0): ([("c0", 0, "user", "hi", None, TS, "I", 3)], turn_cols),
        ("convs", 1): ([("c2", "t2", TS, "I", 10)], conv_cols),
        ("turns", 1): ([("c2", 0, "user", "new", None, TS, "I", 11)], turn_cols),
    }
    for (name, e), (rows, cols) in batches.items():
        spark.createDataFrame(pd_.DataFrame(rows, columns=cols)).write.mode(
            "overwrite"
        ).parquet(f"{wal}/{name}/epoch={e}")

    job = MultiTableIngestJob(str(tmp_path / "mt"), catalog, EngineConfig(n_buckets=4))
    # crash after 3 applies: convs e0, turns e0, convs e1 — turns e1 pending
    with pytest_.raises(RuntimeError, match="injected failure"):
        job.run_stream(spark, wal, fail_after=3)

    tables = {
        "convs": LakeTable.load(job.table_path("convs")),
        "turns": LakeTable.load(job.table_path("turns")),
    }
    # head reads are torn: c2 exists in convs but has no turns yet
    assert tables["convs"].read(spark).count() == 3
    assert tables["turns"].read(spark).count() == 1

    frontier, pins = consistent_frontier(tables)
    assert frontier == 0
    consistent_convs = tables["convs"].read(spark, snapshot_id=pins["convs"])
    assert sorted(
        r.conv_id for r in consistent_convs.select("conv_id").collect()
    ) == ["c0", "c1"]

    # registered consistent views join without the orphan parent
    from cnpj_data_pipeline_spark.lake.sql import register_catalog

    register_catalog(spark, tables, consistent=True)
    got = spark.sql(
        "SELECT c.conv_id FROM convs c LEFT ANTI JOIN turns t USING (conv_id)"
    ).collect()
    assert [r.conv_id for r in got] == ["c1"]  # c1 has no turns BY DATA; c2 hidden

    # after resume, the frontier advances to e1 and c2 appears
    job.run_stream(spark, wal)
    frontier2, pins2 = consistent_frontier(tables)
    assert frontier2 == 1
    assert (
        LakeTable.load(job.table_path("turns"))
        .read(spark, snapshot_id=pins2["turns"])
        .count()
        == 2
    )


def test_history_view_accepts_path_string(spark, tmp_path):
    _, convs, _ = _build_tables(spark, tmp_path)
    register_history_view(spark, convs.root, "hist_by_path")
    n = spark.sql("SELECT count(*) AS n FROM hist_by_path").collect()[0].n
    assert n >= 1
