"""RENAME COLUMN evolution via the name-mapping layer (the lightweight
form of Iceberg field-id indirection / Delta columnMapping.mode=name):
data files always store a column under its PHYSICAL name; a rename only
updates the physical->logical map, metadata-only. Pre-rename files read
back under the new name; post-rename producers send the new name and the
apply boundary maps it back; stale producers sending the old name still
land in the same column. Reference analogue: the reference's schema
system is rename-driven (src/processor.py:507-519 positional->name
mapping)."""

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
        T.StructField("tool", T.StringType(), True),
    ]
)


def _batch(spark, rows, cols=("conv_id", "turn_idx", "text", "tool")):
    type_of = {
        "conv_id": T.StringType(),
        "turn_idx": T.IntegerType(),
    }
    sch = T.StructType(
        [
            T.StructField(c, type_of.get(c, T.StringType()), c in type_of)
            for c in cols
        ]
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
        _batch(spark, [("a", 0, "t1", "hammer", "I", 1),
                       ("b", 0, "t2", "wrench", "I", 2)]),
        epoch=0, cfg=CFG,
    )
    return t


def test_rename_reads_old_files_under_new_name(spark, tmp_table):
    t = _mk(spark, tmp_table)
    t.rename_column("tool", "tool_name")
    assert t.snapshot()["op"] == "evolve"
    assert t.renames() == {"tool": "tool_name"}
    assert [f.name for f in t.logical_schema().fields] == [
        "conv_id", "turn_idx", "text", "tool_name",
    ]
    # physical schema (files) unchanged — metadata-only
    assert [f.name for f in t.schema().fields] == [
        "conv_id", "turn_idx", "text", "tool",
    ]
    got = t.read(spark).orderBy(*KEY).toPandas()
    assert list(got.columns) == ["conv_id", "turn_idx", "text", "tool_name"]
    assert list(got["tool_name"]) == ["hammer", "wrench"]


def test_rename_applies_new_and_old_producer_names(spark, tmp_table):
    t = _mk(spark, tmp_table)
    t.rename_column("tool", "tool_name")
    # post-rename producer: sends the NEW logical name
    apply_changes(
        spark, t,
        _batch(
            spark, [("a", 0, "t1b", "saw", "U", 3)],
            cols=("conv_id", "turn_idx", "text", "tool_name"),
        ),
        epoch=1, cfg=CFG,
    )
    # stale producer: still sends the OLD (physical) name — same column
    apply_changes(
        spark, t,
        _batch(spark, [("b", 0, "t2b", "pliers", "U", 4)]),
        epoch=2, cfg=CFG,
    )
    got = (
        t.read(spark).orderBy(*KEY).toPandas().set_index("conv_id")
    )
    assert got.loc["a", "tool_name"] == "saw"
    assert got.loc["b", "tool_name"] == "pliers"
    # neither producer evolved a duplicate column in
    assert [f.name for f in t.schema().fields] == [
        "conv_id", "turn_idx", "text", "tool",
    ]


def test_rename_batch_with_both_names_is_ambiguous(spark, tmp_table):
    t = _mk(spark, tmp_table)
    t.rename_column("tool", "tool_name")
    both = _batch(
        spark, [("c", 0, "x", "old", "new", "I", 9)],
        cols=("conv_id", "turn_idx", "text", "tool", "tool_name"),
    )
    with pytest.raises(ValueError, match="ambiguous"):
        apply_changes(spark, t, both, epoch=5, cfg=CFG)


def test_rename_time_travel_reads_old_names(spark, tmp_table):
    t = _mk(spark, tmp_table)
    pre_sid = t.current_snapshot_id()
    t.rename_column("tool", "tool_name")
    old = t.read(spark, snapshot_id=pre_sid).orderBy(*KEY).toPandas()
    assert "tool" in old.columns and "tool_name" not in old.columns
    new = t.read(spark).orderBy(*KEY).toPandas()
    assert "tool_name" in new.columns and "tool" not in new.columns
    # values identical either way
    assert list(old["tool"]) == list(new["tool_name"])


def test_rename_validation(spark, tmp_table):
    t = _mk(spark, tmp_table)
    with pytest.raises(ValueError, match="key/bucket"):
        t.rename_column("conv_id", "conversation")
    with pytest.raises(ValueError, match="not in schema"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already in use"):
        t.rename_column("tool", "text")
    t.rename_column("tool", "tool_name")
    with pytest.raises(ValueError, match="already named"):
        t.rename_column("tool_name", "tool_name")
    # new name may not collide with another column's PHYSICAL name
    t.rename_column("text", "body")
    with pytest.raises(ValueError, match="physical"):
        t.rename_column("tool_name", "text")
    # renaming BACK to the physical name clears the map entry
    t.rename_column("body", "text")
    assert t.renames() == {"tool": "tool_name"}
    # dropped tombstones are off limits
    t.drop_column("text")
    with pytest.raises(ValueError, match="tombstone"):
        t.rename_column("tool_name", "text")


def test_rename_then_drop_uses_logical_name(spark, tmp_table):
    t = _mk(spark, tmp_table)
    t.rename_column("tool", "tool_name")
    t.drop_column("tool_name")  # logical name accepted
    assert t.snapshot()["dropped_cols"] == ["tool"]  # physical tombstone
    assert t.renames() == {}
    got = t.read(spark).orderBy(*KEY).toPandas()
    assert list(got.columns) == ["conv_id", "turn_idx", "text"]


def test_rename_survives_compaction_and_change_feed(spark, tmp_table):
    t = _mk(spark, tmp_table)
    sid0 = t.current_snapshot_id()
    t.rename_column("tool", "tool_name")
    apply_changes(
        spark, t,
        _batch(
            spark, [("a", 1, "t3", "drill", "I", 5)],
            cols=("conv_id", "turn_idx", "text", "tool_name"),
        ),
        epoch=1, cfg=CFG,
    )
    t.compact(spark)
    got = t.read(spark).orderBy(*KEY).toPandas()
    assert list(got.columns) == ["conv_id", "turn_idx", "text", "tool_name"]
    assert list(got["tool_name"]) == ["hammer", "drill", "wrench"]
    feed = t.read_changes(spark, sid0).toPandas()
    assert "tool_name" in feed.columns and "tool" not in feed.columns
    typed = t.read_changes_typed(spark, sid0).toPandas()
    assert "tool_name" in typed.columns and "tool" not in typed.columns
    ins = typed[typed["change_type"] == "insert"]
    assert set(ins["tool_name"]) == {"drill"}


def test_rename_new_column_shadowing_logical_name_refused(spark, tmp_table):
    t = _mk(spark, tmp_table)
    t.rename_column("tool", "tool_name")
    # a NEW column arriving under a name that is some column's logical
    # name is the renamed column itself (mapped at the boundary) — but a
    # rename RACING an evolve that adds that name must fail loudly: here,
    # rename to a name, then try evolving in a column with that same name
    # via commit-level validation (the batch path maps it, so exercise the
    # commit API directly)
    from cnpj_data_pipeline_spark.lake.format import CommitConflictError

    new_schema = T.StructType(
        list(t.schema().fields) + [T.StructField("tool_name", T.StringType(), True)]
    )
    with pytest.raises(CommitConflictError, match="collide"):
        t.commit(
            op="evolve", epoch=None, bucket_updates={},
            new_schema=new_schema, mode="append",
        )


def test_rename_point_lookup_and_range_read(spark, tmp_table):
    t = _mk(spark, tmp_table)
    t.rename_column("text", "body")
    keys = spark.createDataFrame([("a", 0)], "conv_id string, turn_idx int")
    got = t.read_keys(spark, keys).toPandas()
    assert list(got["body"]) == ["t1"]
    # range read accepts the logical name and filters correctly
    rr = t.read_range(spark, "body", lo="t1", hi="t1").toPandas()
    assert list(rr["body"]) == ["t1"]
    # sort order declared under the logical name resolves to physical
    t.set_sort_order(["body"])
    assert t.sort_order() == ["text"]
    t.compact(spark)
    assert list(
        t.read(spark).orderBy(*KEY).toPandas().columns
    ) == ["conv_id", "turn_idx", "body", "tool"]


def test_rename_copart_wal_maps_logical_names(spark, tmp_path):
    """The shuffle-free bucketed-WAL path: a post-rename producer writes
    epochs whose payload carries the LOGICAL name; the per-file Arrow
    normalize maps it back to physical, so the map-only apply neither
    duplicates the column nor null-pads it."""
    from cnpj_data_pipeline_spark import IngestJob
    from cnpj_data_pipeline_spark.sources.change_stream import (
        write_epoch_bucketed,
    )
    import pyspark.sql.functions as F

    lake = str(tmp_path / "lake")
    wal = str(tmp_path / "wal")
    t = LakeTable.create(lake, SCHEMA, KEY, 4)
    t.rename_column("tool", "tool_name")
    rows = [
        ("a", 0, "t1", "hammer", "I", 1),
        ("b", 0, "t2", "wrench", "I", 2),
        ("a", 0, "t1b", "saw", "U", 3),
    ]
    b = _batch(
        spark, rows, cols=("conv_id", "turn_idx", "text", "tool_name")
    ).withColumn("epoch", F.lit(0))
    write_epoch_bucketed(b.drop("epoch"), wal, 0, KEY, 4)
    cfg = EngineConfig(n_buckets=4, compact_threshold=None)
    m = IngestJob(lake, cfg).run_stream(spark, wal)
    assert m and m[0].get("copartitioned"), m
    got = t.read(spark).orderBy(*KEY).toPandas()
    assert list(got.columns) == ["conv_id", "turn_idx", "text", "tool_name"]
    assert list(got["tool_name"]) == ["saw", "wrench"]
    # physical files never learned the logical name
    assert [f.name for f in t.schema().fields] == [
        "conv_id", "turn_idx", "text", "tool",
    ]


def test_rename_streaming_cdf_source_emits_logical_names(spark, tmp_table):
    """The lake_cdf streaming source's schema and rows speak the logical
    names captured at query start."""
    from cnpj_data_pipeline_spark.streaming.cdf_source import (
        register_cdf_source,
    )

    t = _mk(spark, tmp_table)
    t.rename_column("tool", "tool_name")
    register_cdf_source(spark)
    feed = (
        spark.readStream.format("lake_cdf").load(tmp_table)
    )
    assert "tool_name" in feed.columns and "tool" not in feed.columns
    q = (
        feed.writeStream.format("memory")
        .queryName("rename_cdf")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from rename_cdf").toPandas()
    assert set(got["tool_name"]) == {"hammer", "wrench"}


def test_rename_on_partial_update_engine(spark, tmp_table):
    """RENAME on a merge_engine='partial' table: the per-column fold's
    ``__col_lsns`` meta is keyed by PHYSICAL names, and a rename is
    metadata-only — so patches sent under the OLD name (stale producer)
    and the NEW name (post-rename producer) must fold into the same
    column, preserving per-column origin LSNs, through both the incremental
    apply and the map-only compaction."""
    def _patch(rows, cols):
        sch = T.StructType(
            [
                T.StructField("conv_id", T.StringType(), False),
                T.StructField("turn_idx", T.IntegerType(), False),
            ]
            + [T.StructField(c, T.StringType(), True) for c in cols]
            + [
                T.StructField("op", T.StringType(), False),
                T.StructField("lsn", T.LongType(), False),
            ]
        )
        return spark.createDataFrame(rows, sch)

    t = LakeTable.create(
        tmp_table, SCHEMA, KEY, CFG.n_buckets, merge_engine="partial"
    )
    # epoch 0: disjoint-column patches under the original names
    apply_changes(
        spark, t,
        _patch([("a", 0, "t1", None, "U", 1),
                ("a", 0, None, "hammer", "U", 2)], ["text", "tool"]),
        epoch=0, cfg=CFG,
    )
    assert t.rename_column("tool", "tool_name") > 0

    # epoch 1: post-rename producer patches the NEW name; text untouched
    apply_changes(
        spark, t,
        _patch([("a", 0, "wrench", "U", 5)], ["tool_name"]),
        epoch=1, cfg=CFG,
    )
    # epoch 2: STALE producer still sends the old physical name — lower
    # LSN than epoch 1's patch, so it must LOSE the per-column fold
    apply_changes(
        spark, t,
        _patch([("a", 0, None, "chisel", "U", 4),
                ("b", 0, "t2", "saw", "I", 6)], ["text", "tool"]),
        epoch=2, cfg=CFG,
    )

    def state():
        rows = t.read(spark).orderBy(*KEY).collect()
        return [(r["conv_id"], r["turn_idx"], r["text"], r["tool_name"])
                for r in rows]

    expect = [("a", 0, "t1", "wrench"), ("b", 0, "t2", "saw")]
    assert state() == expect
    assert "tool" not in t.read(spark).columns

    # the map-only partial compaction folds mixed-name generations and
    # the state is layout-invariant
    t.compact(spark)
    assert state() == expect


def test_rename_inside_window_preserves_preimages(spark, tmp_table):
    """An in-window rename must NOT null the renamed column's pre-images:
    update_preimage/delete rows carry the real pre-rename values under the
    new logical name (the pre-image lookup reads physical names and
    aliases under the window-END rename map)."""
    t = _mk(spark, tmp_table)
    sid0 = t.current_snapshot_id()
    t.rename_column("tool", "tool_name")
    apply_changes(
        spark, t,
        _batch(
            spark,
            [("a", 0, "t1b", "drill", "U", 5),   # update pre-rename row
             ("b", 0, "x", "x", "D", 6)],        # delete pre-rename row
            cols=("conv_id", "turn_idx", "text", "tool_name"),
        ),
        epoch=1, cfg=CFG,
    )
    typed = t.read_changes_typed(spark, sid0).toPandas()
    assert "tool_name" in typed.columns and "tool" not in typed.columns
    pre = typed[typed["change_type"] == "update_preimage"].iloc[0]
    assert pre["tool_name"] == "hammer" and pre["text"] == "t1"
    post = typed[typed["change_type"] == "update_postimage"].iloc[0]
    assert post["tool_name"] == "drill" and post["text"] == "t1b"
    del_ = typed[typed["change_type"] == "delete"].iloc[0]
    assert del_["tool_name"] == "wrench" and del_["text"] == "t2"


def test_double_rename_retires_intermediate_name(spark, tmp_table):
    """tool -> tool_name -> tool_label: a stale producer still sending the
    INTERMEDIATE name maps into the same physical column (never a
    silently-evolved new one); reusing a retired name for anything else is
    refused; renaming back to a retired name of the SAME column is legal
    and un-retires it."""
    t = _mk(spark, tmp_table)
    t.rename_column("tool", "tool_name")
    t.rename_column("tool_name", "tool_label")
    assert t.renames() == {"tool": "tool_label"}
    assert t.snapshot()["retired_names"] == {"tool_name": "tool"}

    # all three historical names land in the same physical column
    apply_changes(
        spark, t,
        _batch(spark, [("c", 0, "t3", "saw", "U", 10)],
               cols=("conv_id", "turn_idx", "text", "tool_name")),
        epoch=1, cfg=CFG,
    )
    apply_changes(
        spark, t,
        _batch(spark, [("d", 0, "t4", "drill", "U", 11)],
               cols=("conv_id", "turn_idx", "text", "tool")),
        epoch=2, cfg=CFG,
    )
    got = t.read(spark).orderBy(*KEY).toPandas()
    assert list(got.columns) == ["conv_id", "turn_idx", "text", "tool_label"]
    assert list(got["tool_label"]) == ["hammer", "wrench", "saw", "drill"]

    # two historical names for the same column in ONE batch: ambiguous
    with pytest.raises(ValueError, match="multiple historical names"):
        apply_changes(
            spark, t,
            _batch(spark, [("e", 0, "t5", "x", "y", "U", 12)],
                   cols=("conv_id", "turn_idx", "text", "tool",
                         "tool_name")),
            epoch=3, cfg=CFG,
        )

    # retired names cannot be reused for anything else
    with pytest.raises(ValueError, match="RETIRED"):
        t.add_column("tool_name", T.StringType())
    with pytest.raises(ValueError, match="RETIRED"):
        t.rename_column("text", "tool_name")

    # renaming the SAME column back to a retired name un-retires it
    t.rename_column("tool_label", "tool_name")
    assert t.renames() == {"tool": "tool_name"}
    assert t.snapshot()["retired_names"] == {"tool_label": "tool"}


def test_drop_renamed_column_retires_logical_name(spark, tmp_table):
    """DROP of a renamed column tombstones the physical name AND retires
    the logical one: a stale producer still sending the logical name is
    silently ignored (mapped to the tombstone), not evolved into a brand
    new column."""
    t = _mk(spark, tmp_table)
    t.rename_column("tool", "tool_name")
    t.drop_column("tool_name")
    assert "tool" in t.snapshot()["dropped_cols"]
    assert t.snapshot()["retired_names"] == {"tool_name": "tool"}
    apply_changes(
        spark, t,
        _batch(spark, [("c", 0, "t3", "saw", "U", 10)],
               cols=("conv_id", "turn_idx", "text", "tool_name")),
        epoch=1, cfg=CFG,
    )
    got = t.read(spark).orderBy(*KEY).toPandas()
    assert list(got.columns) == ["conv_id", "turn_idx", "text"]
    assert list(got["text"]) == ["t1", "t2", "t3"]


def test_double_rename_copart_wal_maps_retired_name(spark, tmp_path):
    """The shuffle-free copart path maps RETIRED intermediate names the
    same way the shuffle path does (inv map includes retired_names)."""
    from cnpj_data_pipeline_spark import IngestJob
    from cnpj_data_pipeline_spark.sources.change_stream import (
        write_epoch_bucketed,
    )

    root = str(tmp_path / "lake")
    t = _mk(spark, root)
    t.rename_column("tool", "tool_name")
    t.rename_column("tool_name", "tool_label")
    wal = str(tmp_path / "wal")
    b = _batch(
        spark, [("c", 0, "t3", "saw", "U", 10)],
        cols=("conv_id", "turn_idx", "text", "tool_name"),
    )
    write_epoch_bucketed(b, wal, 1, KEY, CFG.n_buckets)
    cfg = EngineConfig(n_buckets=4, compact_threshold=None)
    m = IngestJob(root, cfg).run_stream(spark, wal)
    assert m and m[0].get("copartitioned"), m
    got = t.read(spark).orderBy(*KEY).toPandas()
    assert list(got.columns) == ["conv_id", "turn_idx", "text", "tool_label"]
    assert list(got["tool_label"]) == ["hammer", "wrench", "saw"]
