"""SQL MATERIALIZED VIEW surface (lake/ddl.py): CREATE MATERIALIZED VIEW /
REFRESH MATERIALIZED VIEW compiling to plans/ivm.AggSyncJob with a persisted
sidecar definition.

Invariants: the view equals a full GROUP BY recompute after every REFRESH;
refresh is idempotent; the definition survives re-registration from a fresh
process (fresh ``tables`` dict); the parser rejects every non-maintainable
or ambiguous form loudly.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark import EngineConfig, LakeTable
from cnpj_data_pipeline_spark.lake.ddl import (
    _parse_mview_query,
    execute_ddl,
    read_mview,
    run_sql_script,
)
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA

KEY = ["conv_id", "turn_idx"]


def _rows(n0=0, n=6, day=1):
    return pd.DataFrame(
        {
            "conv_id": [f"c{i % 3}" for i in range(n0, n0 + n)],
            "turn_idx": list(range(n0, n0 + n)),
            "role": ["user" if i % 2 == 0 else "assistant" for i in range(n0, n0 + n)],
            "text": [f"t{i}" * (i % 4 + 1) for i in range(n0, n0 + n)],
            "tool": [None] * n,
            "ts": [pd.Timestamp(f"2026-01-{day + i % 2:02d} 12:00:00") for i in range(n0, n0 + n)],
            "op": ["I"] * n,
            "lsn": list(range(100 + n0, 100 + n0 + n)),
        }
    )


MV_SQL = """
CREATE MATERIALIZED VIEW by_role LOCATION '{loc}' AS
SELECT role, count(*) AS n_turns, sum(coalesce(length(text), 0)) AS chars
FROM transcripts GROUP BY role
"""


def _recompute(spark, base):
    return {
        r.role: (r.n_turns, r.chars)
        for r in base.read(spark)
        .groupBy("role")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.expr("coalesce(length(text), 0)")).alias("chars"),
        )
        .collect()
    }


def _view_state(spark, loc):
    return {
        r.role: (r.n_turns, r.chars)
        for r in read_mview(spark, loc).collect()
    }


def test_mview_create_refresh_matches_recompute(spark, tmp_table, tmp_path):
    cfg = EngineConfig(n_buckets=4)
    base = LakeTable.create(tmp_table, TRANSCRIPT_SCHEMA, KEY, 4)
    loc = str(tmp_path / "view")
    tables = {"transcripts": base}

    # create BEFORE any data: empty view, declared schema
    v = execute_ddl(spark, MV_SQL.format(loc=loc), tables)
    assert isinstance(v, LakeTable)
    assert read_mview(spark, loc).columns == ["role", "n_turns", "chars"]
    assert read_mview(spark, loc).count() == 0
    assert tables["by_role"] == loc

    apply_changes(spark, base, spark.createDataFrame(_rows(0, 6)), epoch=0, cfg=cfg)
    m = execute_ddl(spark, "REFRESH MATERIALIZED VIEW by_role", tables)
    assert m["epochs_synced"] == [0]
    assert _view_state(spark, loc) == _recompute(spark, base)

    # second epoch incl. a delete, then refresh again
    batch = _rows(6, 4)
    batch.loc[batch.index[-1], ["op", "text"]] = ["D", None]
    batch.loc[batch.index[-1], ["conv_id", "turn_idx"]] = ["c0", 0]
    apply_changes(spark, base, spark.createDataFrame(batch), epoch=1, cfg=cfg)
    m = execute_ddl(spark, "REFRESH MATERIALIZED VIEW by_role", tables)
    assert m["epochs_synced"] == [1]
    assert _view_state(spark, loc) == _recompute(spark, base)

    # idempotent: nothing pending
    m = execute_ddl(spark, "REFRESH MATERIALIZED VIEW by_role", tables)
    assert m["epochs_synced"] == [] and m["rows_applied"] == 0


def test_mview_definition_survives_fresh_registry(spark, tmp_table, tmp_path):
    """A new process re-registers from the sidecar spec (IF NOT EXISTS) and
    REFRESH reconstructs the job from disk — the definition is durable."""
    cfg = EngineConfig(n_buckets=4)
    base = LakeTable.create(tmp_table, TRANSCRIPT_SCHEMA, KEY, 4)
    loc = str(tmp_path / "view")
    execute_ddl(spark, MV_SQL.format(loc=loc), {"transcripts": base})
    apply_changes(spark, base, spark.createDataFrame(_rows()), epoch=0, cfg=cfg)

    fresh: dict = {"transcripts": tmp_table}
    with pytest.raises(ValueError, match="already exists"):
        execute_ddl(spark, MV_SQL.format(loc=loc), fresh)
    execute_ddl(
        spark,
        MV_SQL.format(loc=loc).replace(
            "MATERIALIZED VIEW by_role", "MATERIALIZED VIEW IF NOT EXISTS by_role"
        ),
        fresh,
    )
    m = execute_ddl(spark, "REFRESH MATERIALIZED VIEW by_role", fresh)
    assert m["epochs_synced"] == [0]
    assert _view_state(spark, loc) == _recompute(spark, base)


def test_mview_in_script_with_derived_bucket(spark, tmp_table, tmp_path):
    """run_sql_script path + a derived time-bucket grouping expression."""
    cfg = EngineConfig(n_buckets=4)
    base = LakeTable.create(tmp_table, TRANSCRIPT_SCHEMA, KEY, 4)
    apply_changes(spark, base, spark.createDataFrame(_rows()), epoch=0, cfg=cfg)
    loc = str(tmp_path / "view")
    script = f"""
    CREATE MATERIALIZED VIEW daily LOCATION '{loc}' AS
    SELECT CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT) AS day_bucket,
           count(*) AS n, sum(coalesce(length(text), 0)) AS chars
    FROM transcripts GROUP BY day_bucket;
    REFRESH MATERIALIZED VIEW daily;
    """
    res = run_sql_script(spark, script, {"transcripts": base})
    assert [r["kind"] for r in res] == ["ddl", "ddl"]
    exp = {
        r.day_bucket: (r.n, r.chars)
        for r in base.read(spark)
        .groupBy(
            F.expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)").alias(
                "day_bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("coalesce(length(text), 0)")).alias("chars"),
        )
        .collect()
    }
    got = {
        r.day_bucket: (r.n, r.chars)
        for r in read_mview(spark, loc).collect()
    }
    assert got == exp


@pytest.mark.parametrize(
    "query, err",
    [
        ("SELECT role FROM t GROUP BY role", "count"),
        (
            "SELECT role, count(*) AS n, approx_count_distinct(lsn) AS m "
            "FROM t GROUP BY role",
            "unsupported aggregate",
        ),
        (
            "SELECT role, count(*) AS a, count(*) AS b FROM t GROUP BY role",
            "more than one",
        ),
        (
            "SELECT role, count(*) AS n FROM t GROUP BY role, ts",
            "GROUP BY",
        ),
        (
            "SELECT length(text), count(*) AS n FROM t GROUP BY length(text)",
            "alias",
        ),
        ("UPDATE t SET x = 1", "GROUP BY"),
    ],
)
def test_mview_parser_rejects(query, err):
    with pytest.raises(ValueError, match=err):
        _parse_mview_query(query)


def test_mview_refresh_unknown_name(spark):
    with pytest.raises(ValueError, match="unknown materialized view"):
        execute_ddl(spark, "REFRESH MATERIALIZED VIEW nope", {})


def test_mview_avg_and_count_col(spark, tmp_table, tmp_path):
    """avg(expr) (hidden exact-decimal sum/count pair, divided at read) and
    count(expr) (non-null indicator sum) under insert, update and delete
    churn — NULL texts drop out of both, an emptied avg reads NULL."""
    cfg = EngineConfig(n_buckets=4)
    base = LakeTable.create(tmp_table, TRANSCRIPT_SCHEMA, KEY, 4)
    loc = str(tmp_path / "view")
    tables = {"transcripts": base}
    execute_ddl(
        spark,
        f"""
        CREATE MATERIALIZED VIEW stats LOCATION '{loc}' AS
        SELECT role, count(*) AS n, count(text) AS n_texts,
               avg(length(text)) AS avg_len
        FROM transcripts GROUP BY role
        """,
        tables,
    )
    rows = _rows(0, 6)
    rows.loc[rows.index[1], "text"] = None  # a NULL text (assistant)
    apply_changes(spark, base, spark.createDataFrame(rows), epoch=0, cfg=cfg)
    execute_ddl(spark, "REFRESH MATERIALIZED VIEW stats", tables)

    def state():
        return {
            r.n_role: (r.n, r.n_texts, r.avg_len)
            for r in read_mview(spark, loc)
            .withColumnRenamed("role", "n_role")
            .collect()
        }

    def expect():
        return {
            r.n_role: (r.n, r.n_texts, r.avg_len)
            for r in base.read(spark)
            .groupBy(F.col("role").alias("n_role"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count("text").alias("n_texts"),
                F.avg(F.length("text")).alias("avg_len"),
            )
            .collect()
        }

    assert state() == expect()

    # update churn: change texts (incl. NULL->value and value->NULL)
    upd = rows.iloc[:3].copy().assign(op="U", lsn=[201, 202, 203])
    upd["text"] = ["changed-longer-text", "now-set", None]
    apply_changes(spark, base, spark.createDataFrame(upd), epoch=1, cfg=cfg)
    execute_ddl(spark, "REFRESH MATERIALIZED VIEW stats", tables)
    assert state() == expect()

    # delete every assistant row: its avg group disappears with it
    dels = rows[rows["role"] == "assistant"].assign(op="D", text=None)
    dels["lsn"] = [300 + i for i in range(len(dels))]
    apply_changes(spark, base, spark.createDataFrame(dels), epoch=2, cfg=cfg)
    execute_ddl(spark, "REFRESH MATERIALIZED VIEW stats", tables)
    assert state() == expect()
    assert set(state()) == {"user"}


def test_mview_avg_alias_collision_rejected():
    with pytest.raises(ValueError, match="__sum"):
        _parse_mview_query(
            "SELECT role, count(*) AS n, avg(lsn) AS a, sum(lsn) AS a__sum "
            "FROM t GROUP BY role"
        )


def test_mview_minmax_routes_to_group_refresh(spark, tmp_table, tmp_path):
    """Any MIN/MAX switches the view to the group-refresh strategy: after
    deleting the current extremum the runner-up surfaces (the case the
    delta algebra cannot maintain), and a derived time-bucket group moves
    correctly when an update changes ts."""
    spec = _parse_mview_query(
        "SELECT role, count(*) AS n, min(lsn) AS lo FROM t GROUP BY role"
    )
    assert spec["kind"] == "refresh"
    assert spec["measures"] == {"n": "count(*)", "lo": "min(lsn)"}

    cfg = EngineConfig(n_buckets=4)
    base = LakeTable.create(tmp_table, TRANSCRIPT_SCHEMA, KEY, 4)
    loc = str(tmp_path / "view")
    tables = {"transcripts": base}
    execute_ddl(
        spark,
        f"""
        CREATE MATERIALIZED VIEW extrema LOCATION '{loc}' AS
        SELECT CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)
                   AS day_bucket,
               count(*) AS n, max(length(text)) AS max_len,
               min(length(text)) AS min_len
        FROM transcripts GROUP BY day_bucket
        """,
        tables,
    )
    assert read_mview(spark, loc).columns == [
        "day_bucket", "n", "max_len", "min_len",
    ]

    rows = _rows(0, 6)
    apply_changes(spark, base, spark.createDataFrame(rows), epoch=0, cfg=cfg)
    execute_ddl(spark, "REFRESH MATERIALIZED VIEW extrema", tables)

    def expect():
        return {
            r.day_bucket: (r.n, r.max_len, r.min_len)
            for r in base.read(spark)
            .groupBy(
                F.expr(
                    "CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)"
                ).alias("day_bucket")
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.max(F.length("text")).alias("max_len"),
                F.min(F.length("text")).alias("min_len"),
            )
            .collect()
        }

    def state():
        return {
            r.day_bucket: (r.n, r.max_len, r.min_len)
            for r in read_mview(spark, loc).collect()
        }

    assert state() == expect()

    # delete the longest doc of day 1: the runner-up must surface
    lens = rows.assign(L=rows["text"].str.len())
    day1 = lens[lens["ts"].dt.day == 1]
    victim = day1.loc[day1["L"].idxmax()]
    dels = rows[rows["turn_idx"] == victim["turn_idx"]].assign(
        op="D", text=None, lsn=[500]
    )
    apply_changes(spark, base, spark.createDataFrame(dels), epoch=1, cfg=cfg)
    execute_ddl(spark, "REFRESH MATERIALIZED VIEW extrema", tables)
    assert state() == expect()

    # an update MOVES a row to a new day bucket (derived-group move)
    upd = rows[rows["turn_idx"] == 0].assign(
        op="U", ts=pd.Timestamp("2026-01-05 09:00:00"), lsn=[600]
    )
    apply_changes(spark, base, spark.createDataFrame(upd), epoch=2, cfg=cfg)
    execute_ddl(spark, "REFRESH MATERIALIZED VIEW extrema", tables)
    assert state() == expect()
    # idempotent
    m = execute_ddl(spark, "REFRESH MATERIALIZED VIEW extrema", tables)
    assert m["epochs_synced"] == []


def test_show_create_mview_roundtrips(spark, tmp_table, tmp_path):
    cfg = EngineConfig(n_buckets=4)
    base = LakeTable.create(tmp_table, TRANSCRIPT_SCHEMA, KEY, 4)
    apply_changes(spark, base, spark.createDataFrame(_rows()), epoch=0, cfg=cfg)
    loc = str(tmp_path / "v1")
    tables = {"transcripts": base}
    execute_ddl(spark, MV_SQL.format(loc=loc), tables)
    execute_ddl(spark, "REFRESH MATERIALIZED VIEW by_role", tables)

    stmt = execute_ddl(
        spark, "SHOW CREATE MATERIALIZED VIEW by_role", tables
    )
    assert stmt.startswith("CREATE MATERIALIZED VIEW by_role LOCATION")

    # round-trip: re-point the statement at a new location, execute, refresh
    loc2 = str(tmp_path / "v2")
    stmt2 = stmt.replace(f"'{loc}'", f"'{loc2}'").replace(
        "VIEW by_role", "VIEW by_role2"
    )
    execute_ddl(spark, stmt2, tables)
    execute_ddl(spark, "REFRESH MATERIALIZED VIEW by_role2", tables)
    assert _view_state(spark, loc2) == _view_state(spark, loc)


def test_mview_refresh_across_maintenance(spark, tmp_table, tmp_path):
    """Lagging consumer vs layout churn: epochs land, COMPACTION / REBUCKET
    / tombstone VACUUM / a sort-order flip rewrite the source's files, and
    only then does REFRESH catch up — the typed feed must resolve its
    pre-images across the rewritten generations (snapshot isolation of the
    window start), and the view must still equal the full recompute."""
    cfg = EngineConfig(n_buckets=4)
    base = LakeTable.create(tmp_table, TRANSCRIPT_SCHEMA, KEY, 4)
    loc = str(tmp_path / "view")
    tables = {"transcripts": base}
    execute_ddl(spark, MV_SQL.format(loc=loc), tables)

    apply_changes(spark, base, spark.createDataFrame(_rows(0, 8)), epoch=0, cfg=cfg)
    execute_ddl(spark, "REFRESH MATERIALIZED VIEW by_role", tables)
    assert _view_state(spark, loc) == _recompute(spark, base)

    # two more epochs (updates + a delete), NO refresh yet
    upd = _rows(0, 4).assign(op="U")
    upd["text"] = ["redone-" + str(i) for i in range(4)]
    upd["lsn"] = [400 + i for i in range(4)]
    apply_changes(spark, base, spark.createDataFrame(upd), epoch=1, cfg=cfg)
    dels = _rows(4, 2).assign(op="D", text=None)
    dels["lsn"] = [500, 501]
    apply_changes(spark, base, spark.createDataFrame(dels), epoch=2, cfg=cfg)

    # layout churn between the pending epochs and the catch-up refresh
    base.compact(spark)
    base.rebucket(spark, 8)
    base.set_sort_order(["ts"])
    base.compact(spark)
    base.vacuum_tombstones(spark, lsn_horizon=600)

    m = execute_ddl(spark, "REFRESH MATERIALIZED VIEW by_role", tables)
    assert m["epochs_synced"] == [1, 2]
    assert _view_state(spark, loc) == _recompute(spark, base)

    # and one more epoch after all the churn
    late = _rows(10, 3)
    late["lsn"] = [700, 701, 702]
    apply_changes(spark, base, spark.createDataFrame(late), epoch=3, cfg=cfg)
    execute_ddl(spark, "REFRESH MATERIALIZED VIEW by_role", tables)
    assert _view_state(spark, loc) == _recompute(spark, base)
