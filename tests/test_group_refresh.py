"""GroupRefreshSyncJob: IVM for non-delta-maintainable aggregates (MIN/MAX,
COUNT DISTINCT) by re-aggregating only the affected groups per window.

The decisive case — deleting the current extremum so the runner-up must be
promoted — is exactly what delta-IVM (AggSyncJob) cannot do; the refresh job
must get it right from base state, reading only the touched groups' rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark import EngineConfig, LakeTable
from cnpj_data_pipeline_spark.gen import epoch_batches, gen_changes
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.plans.ivm import GroupRefreshSyncJob
from cnpj_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA

KEY = ["conv_id", "turn_idx"]
MEASURES = {
    "max_chars": "max(coalesce(length(text), 0))",
    "n_roles": "count(distinct role)",
}


def _recompute(spark, base: LakeTable) -> pd.DataFrame:
    return (
        base.read(spark)
        .groupBy("conv_id")
        .agg(*[F.expr(e).alias(n) for n, e in MEASURES.items()])
        .toPandas()
        .sort_values("conv_id", kind="mergesort")
        .reset_index(drop=True)
    )


def _view_state(spark, job: GroupRefreshSyncJob) -> pd.DataFrame:
    return (
        job.read(spark)
        .select("conv_id", *MEASURES)
        .toPandas()
        .sort_values("conv_id", kind="mergesort")
        .reset_index(drop=True)
    )


def test_group_refresh_matches_recompute_each_epoch(spark, tmp_table, tmp_path):
    cfg = EngineConfig(n_buckets=8)
    ch = gen_changes(
        spark, n_events=3_000, n_convs=40, n_epochs=3,
        delete_ratio=0.15, late_ratio=0.1,
    )
    base = LakeTable.create(
        tmp_table, TRANSCRIPT_SCHEMA, KEY, cfg.n_buckets,
        bucket_cols=["conv_id"],  # group-pruned refresh reads
    )
    job = GroupRefreshSyncJob(
        tmp_table, str(tmp_path / "view"), ["conv_id"], MEASURES, cfg=cfg
    )
    for e, batch in epoch_batches(ch, 3):
        apply_changes(spark, base, batch, epoch=e, cfg=cfg)
        m = job.run_once(spark)
        assert m["epochs_synced"] == [e] and m["epochs_behind"] == 0
        got, exp = _view_state(spark, job), _recompute(spark, base)
        pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)

    m = job.run_once(spark)
    assert m["epochs_synced"] == [] and m["rows_applied"] == 0


def test_group_refresh_promotes_runner_up_on_extremum_delete(
    spark, tmp_table, tmp_path
):
    """Delete the row holding a group's MAX: the view must fall back to the
    runner-up (impossible for delta-IVM, the whole point of this job);
    deleting a group's last row tombstones the group."""
    cfg = EngineConfig(n_buckets=4)
    rows = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b"],
            "turn_idx": [0, 1, 0],
            "role": ["user", "assistant", "user"],
            "text": ["longest-text", "mid", "solo"],
            "tool": [None] * 3,
            "ts": [pd.Timestamp("2026-01-01")] * 3,
            "op": ["I"] * 3,
            "lsn": [1, 2, 3],
        }
    )
    base = LakeTable.create(
        tmp_table, TRANSCRIPT_SCHEMA, KEY, 4, bucket_cols=["conv_id"]
    )
    job = GroupRefreshSyncJob(
        tmp_table, str(tmp_path / "view"), ["conv_id"], MEASURES, cfg=cfg
    )
    apply_changes(spark, base, spark.createDataFrame(rows), epoch=0, cfg=cfg)
    job.run_once(spark)
    got = _view_state(spark, job)
    assert list(got["max_chars"]) == [len("longest-text"), len("solo")]
    assert list(got["n_roles"]) == [2, 1]

    # delete the extremum row of conv a -> max falls to the runner-up
    dele = rows.iloc[[0]].assign(op="D", text=None, lsn=10)
    apply_changes(spark, base, spark.createDataFrame(dele), epoch=1, cfg=cfg)
    job.run_once(spark)
    got = _view_state(spark, job)
    assert list(got["max_chars"]) == [len("mid"), len("solo")]
    assert list(got["n_roles"]) == [1, 1]

    # delete conv b's only row -> group disappears from the view
    dele = rows.iloc[[2]].assign(op="D", text=None, lsn=11)
    apply_changes(spark, base, spark.createDataFrame(dele), epoch=2, cfg=cfg)
    job.run_once(spark)
    got = _view_state(spark, job)
    assert list(got["conv_id"]) == ["a"]
    pd.testing.assert_frame_equal(
        got, _recompute(spark, base)[got.columns], check_dtype=False
    )


def test_group_refresh_backlog_folds(spark, tmp_table, tmp_path):
    """A 3-epoch backlog folds into one refresh window + one view commit."""
    cfg = EngineConfig(n_buckets=8)
    ch = gen_changes(spark, n_events=2_000, n_convs=30, n_epochs=3,
                     delete_ratio=0.1)
    base = LakeTable.create(
        tmp_table, TRANSCRIPT_SCHEMA, KEY, cfg.n_buckets,
        bucket_cols=["conv_id"],
    )
    for e, batch in epoch_batches(ch, 3):
        apply_changes(spark, base, batch, epoch=e, cfg=cfg)
    job = GroupRefreshSyncJob(
        tmp_table, str(tmp_path / "view"), ["conv_id"], MEASURES, cfg=cfg
    )
    m = job.run_once(spark)
    assert m["epochs_synced"] == [0, 1, 2]
    view = LakeTable.load(str(tmp_path / "view"))
    applies = [s for s in view.snapshots() if s.get("epoch") is not None]
    assert len(applies) == 1
    got, exp = _view_state(spark, job), _recompute(spark, base)
    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)


def test_group_refresh_off_key_group_move_refreshes_old_group(
    spark, tmp_table, tmp_path
):
    """ADVICE r3 (medium): grouping OFF-key (by ``role``), an update that
    MOVES a row between groups must refresh the OLD group too — its value
    only surfaces in the typed feed's pre-image. Also: deleting a group's
    row (tombstone payload NULL in the plain feed) must refresh that group."""
    cfg = EngineConfig(n_buckets=4)
    measures = {"max_chars": "max(coalesce(length(text), 0))"}
    rows = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b"],
            "turn_idx": [0, 1, 0],
            "role": ["user", "assistant", "user"],
            "text": ["user-longest", "mid", "usr"],
            "tool": [None] * 3,
            "ts": [pd.Timestamp("2026-01-01")] * 3,
            "op": ["I"] * 3,
            "lsn": [1, 2, 3],
        }
    )
    base = LakeTable.create(tmp_table, TRANSCRIPT_SCHEMA, KEY, 4)
    job = GroupRefreshSyncJob(
        tmp_table, str(tmp_path / "view"), ["role"], measures, cfg=cfg
    )
    apply_changes(spark, base, spark.createDataFrame(rows), epoch=0, cfg=cfg)
    job.run_once(spark)

    def _by_role(df):
        return df.sort_values("role").reset_index(drop=True)

    got = _by_role(job.read(spark).select("role", "max_chars").toPandas())
    assert list(got["max_chars"]) == [len("mid"), len("user-longest")]

    # move the 'user' extremum row INTO the 'assistant' group: the update's
    # new image names only 'assistant' — 'user' must still be refreshed
    upd = rows.iloc[[0]].assign(role="assistant", lsn=10, op="U")
    apply_changes(spark, base, spark.createDataFrame(upd), epoch=1, cfg=cfg)
    job.run_once(spark)
    got = _by_role(job.read(spark).select("role", "max_chars").toPandas())
    assert list(got["role"]) == ["assistant", "user"]
    assert list(got["max_chars"]) == [len("user-longest"), len("usr")]

    # delete the last 'user' row: the group must be tombstoned even though
    # the plain feed's tombstone would carry role=NULL
    dele = rows.iloc[[2]].assign(op="D", text=None, role=None, lsn=11)
    apply_changes(spark, base, spark.createDataFrame(dele), epoch=2, cfg=cfg)
    job.run_once(spark)
    got = _by_role(job.read(spark).select("role", "max_chars").toPandas())
    assert list(got["role"]) == ["assistant"]
