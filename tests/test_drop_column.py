"""DROP COLUMN evolution: metadata-only removal from the declared schema.
Old files keep the bytes (no rewrite); every read path projects them out;
the name is tombstoned so it can never re-enter (old files would resurface
pre-drop values). Reference analogue: none — the reference recreates its
Postgres tables from fixed DDL."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.types as T
import pytest

from cnpj_data_pipeline_spark import EngineConfig, LakeTable
from cnpj_data_pipeline_spark.operators.merge import apply_changes

KEY = ["conv_id", "turn_idx"]
CFG = EngineConfig(n_buckets=4, salt_factor=1, compact_threshold=None)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("legacy", T.StringType(), True),
    ]
)


def _batch(spark, rows):
    sch = T.StructType(
        list(SCHEMA.fields)
        + [
            T.StructField("op", T.StringType(), False),
            T.StructField("lsn", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(rows, sch)


def _mk(spark, tmp_table):
    t = LakeTable.create(tmp_table, SCHEMA, KEY, CFG.n_buckets)
    apply_changes(
        spark, t,
        _batch(spark, [("a", 0, "t1", "L1", "I", 1),
                       ("b", 0, "t2", "L2", "I", 2)]),
        epoch=0, cfg=CFG,
    )
    return t


def test_drop_column_projects_out_and_tombstones(spark, tmp_table):
    t = _mk(spark, tmp_table)
    pre_sid = t.current_snapshot_id()
    t.drop_column("legacy")
    assert [f.name for f in t.schema().fields] == [
        "conv_id", "turn_idx", "text",
    ]
    assert t.snapshot()["dropped_cols"] == ["legacy"]
    assert t.snapshot()["op"] == "evolve"
    got = t.read(spark).orderBy(*KEY).toPandas()
    assert "legacy" not in got.columns and list(got["text"]) == ["t1", "t2"]
    # time travel to the pre-drop snapshot still shows the column
    old = t.read(spark, snapshot_id=pre_sid).orderBy(*KEY).toPandas()
    assert list(old["legacy"]) == ["L1", "L2"]

    # a stale producer still sending the column: applies, column ignored,
    # schema does NOT re-evolve
    apply_changes(
        spark, t,
        _batch(spark, [("c", 0, "t3", "ZOMBIE", "I", 3)]),
        epoch=1, cfg=CFG,
    )
    assert t.snapshot()["op"] != "evolve"
    got = t.read(spark).orderBy(*KEY).toPandas()
    assert "legacy" not in got.columns and len(got) == 3

    # compaction (map kernel) folds mixed with/without-column generations
    t.compact(spark)
    got2 = t.read(spark).orderBy(*KEY).toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got2, got.reset_index(drop=True), check_dtype=False
    )

    # genuinely-new columns still evolve in (additive path unaffected)
    sch = T.StructType(
        [f for f in SCHEMA.fields if f.name != "legacy"]
        + [
            T.StructField("fresh", T.StringType(), True),
            T.StructField("op", T.StringType(), False),
            T.StructField("lsn", T.LongType(), False),
        ]
    )
    apply_changes(
        spark, t,
        spark.createDataFrame([("d", 0, "t4", "F1", "I", 4)], sch),
        epoch=2, cfg=CFG,
    )
    names = [f.name for f in t.schema().fields]
    assert "fresh" in names and "legacy" not in names


def test_drop_column_validations(spark, tmp_table):
    t = _mk(spark, tmp_table)
    with pytest.raises(ValueError, match="key/bucket"):
        t.drop_column("conv_id")
    with pytest.raises(ValueError, match="not in schema"):
        t.drop_column("nope")
    t.set_sort_order(["legacy"])
    with pytest.raises(ValueError, match="sort_order"):
        t.drop_column("legacy")
    t.set_sort_order(None)
    t.drop_column("legacy")  # now allowed


def test_drop_column_agg_spec_refused(spark, tmp_table):
    sch = T.StructType(
        [
            T.StructField("user_id", T.StringType(), False),
            T.StructField("clicks", T.LongType(), True),
        ]
    )
    t = LakeTable.create(
        tmp_table, sch, ["user_id"], 4,
        merge_engine="aggregate", agg_spec={"clicks": "sum"},
    )
    with pytest.raises(ValueError, match="agg_spec"):
        t.drop_column("clicks")


def test_change_feed_spans_a_drop(spark, tmp_table):
    t = _mk(spark, tmp_table)
    s0 = t.current_snapshot_id()
    t.drop_column("legacy")
    apply_changes(
        spark, t,
        _batch(spark, [("c", 0, "t3", None, "I", 3)]),
        epoch=1, cfg=CFG,
    )
    feed = t.read_changes(spark, s0)
    assert feed.count() == 1
    assert "legacy" not in feed.columns  # window-end schema rules
