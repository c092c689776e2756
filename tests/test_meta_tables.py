"""Iceberg-style metadata tables (files/snapshots as relations) and the
CHECK TABLE integrity audit. Reference analogue: the reference's only
introspection is the processed_files checkpoint table
(src/database/postgres.py:122-196); a lake format must also account for
its physical files."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark import (
    EngineConfig,
    IngestJob,
    LakeTable,
    register_meta_views,
)
from cnpj_data_pipeline_spark.gen import epoch_batches, gen_changes
from cnpj_data_pipeline_spark.sources import change_stream as cs


def _ingest(spark, tmp_path, **cfg):
    ch = gen_changes(spark, n_events=6_000, n_convs=200, n_epochs=3)
    wal = str(tmp_path / "wal")
    for e, b in epoch_batches(ch, 3):
        cs.write_epoch(b, wal, e)
    job = IngestJob(str(tmp_path / "lake"), EngineConfig(n_buckets=8, **cfg))
    job.run_stream(spark, wal)
    return LakeTable.load(str(tmp_path / "lake"))


def test_files_and_snapshots_df_match_manifest(spark, tmp_path):
    t = _ingest(spark, tmp_path, compact_threshold=0)
    snap = t.snapshot()
    fdf = t.files_df(spark).toPandas()
    want_files = sum(len(i["files"]) for i in snap["buckets"].values())
    assert len(fdf) == want_files
    # per-file stats surfaced: rows sum to the table total, sizes are real
    assert int(fdf["rows"].sum()) == snap["rows_total"]
    assert (fdf["bytes"] > 0).all()
    # uncompacted MoR: 3 epochs -> unmerged buckets visible as SQL
    register_meta_views(spark, t, "tm")
    debt = spark.sql(
        "SELECT count(*) AS c FROM tm_files WHERE NOT merged"
    ).collect()[0]["c"]
    assert debt == want_files  # nothing compacted yet
    sdf = t.snapshots_df(spark).toPandas()
    assert list(sdf["snapshot_id"]) == [s["snapshot_id"] for s in t.snapshots()]
    # tags surface on their pinned row
    t.create_tag("pin", t.current_snapshot_id())
    sdf2 = t.snapshots_df(spark)
    pinned = sdf2.filter(F.array_contains("tags", "pin")).collect()
    assert [r["snapshot_id"] for r in pinned] == [t.current_snapshot_id()]
    # after compaction the debt drains
    t.compact(spark)
    register_meta_views(spark, t, "tm")
    assert (
        spark.sql("SELECT count(*) c FROM tm_files WHERE NOT merged").collect()[0]["c"]
        == 0
    )


def test_check_table_clean_and_detects_damage(spark, tmp_path):
    t = _ingest(spark, tmp_path, compact_threshold=0)
    rep = t.check_table(spark, placement=True)
    assert rep["ok"] and rep["files_checked"] > 0 and rep["issues"] == []

    # damage 1: delete a referenced file
    snap = t.snapshot()
    some_rel = next(
        rel for i in snap["buckets"].values() for rel in i["files"]
    )
    os.remove(os.path.join(t.root, some_rel))
    rep2 = t.check_table(spark)
    assert not rep2["ok"] and any("missing data file" in i for i in rep2["issues"])

    # damage 2: truncate another referenced file (torn write)
    other_rel = next(
        rel
        for i in snap["buckets"].values()
        for rel in i["files"]
        if rel != some_rel
    )
    fp = os.path.join(t.root, other_rel)
    with open(fp, "r+b") as f:
        f.truncate(16)
    rep3 = t.check_table(spark)
    assert any("unreadable footer" in i for i in rep3["issues"])

    with pytest.raises(ValueError, match="needs a SparkSession"):
        t.check_table(placement=True)
