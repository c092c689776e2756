"""Replay equivalence — the engine's core invariant (SURVEY §5.2).

Generate a deterministic change stream, apply it epoch-by-epoch through the
engine, and compare the final lake state to the single-threaded oracle fold:
per-turn text equality under orderBy(conv_id, turn_idx), plus full-row
equality of every payload column.
"""

from __future__ import annotations

import pandas as pd
import pytest

from cnpj_data_pipeline_spark import EngineConfig, IngestJob, LakeTable
from cnpj_data_pipeline_spark.gen import epoch_batches, gen_changes
from cnpj_data_pipeline_spark.oracle import final_state


def _engine_final(spark, tmp_table, changes, n_epochs, cfg) -> pd.DataFrame:
    job = IngestJob(tmp_table, cfg)
    job.run_batches(spark, epoch_batches(changes, n_epochs))
    table = LakeTable.load(tmp_table)
    out = (
        table.read(spark)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    return out


def _assert_matches_oracle(engine_df: pd.DataFrame, changes_pdf: pd.DataFrame):
    golden = final_state(changes_pdf)
    assert list(engine_df.columns) == list(golden.columns), (
        engine_df.columns,
        golden.columns,
    )
    pd.testing.assert_frame_equal(engine_df, golden, check_dtype=False)


@pytest.mark.parametrize(
    "mode,strategy",
    [("mor", "native"), ("cow", "pandas"), ("cow", "native")],
)
def test_replay_matches_oracle(spark, tmp_table, mode, strategy):
    cfg = EngineConfig(
        n_buckets=16, salt_factor=2, merge_strategy=strategy, write_mode=mode
    )
    changes = gen_changes(
        spark,
        n_events=8_000,
        n_convs=300,
        turns_per_conv=10,
        n_epochs=4,
        dup_ratio=0.05,
        late_ratio=0.05,
        skew=1.5,
    )
    changes_pdf = changes.toPandas()
    engine_df = _engine_final(spark, tmp_table, changes, 4, cfg)
    _assert_matches_oracle(engine_df, changes_pdf)


def test_strategies_bit_identical(spark, tmp_path):
    """MoR, CoW-pandas and CoW-native paths must be indistinguishable."""
    changes = gen_changes(spark, n_events=4_000, n_convs=150, n_epochs=3, skew=2.0)
    outs = []
    for mode, strat in (("mor", "native"), ("cow", "pandas"), ("cow", "native")):
        cfg = EngineConfig(n_buckets=8, merge_strategy=strat, write_mode=mode)
        path = str(tmp_path / f"lake_{mode}_{strat}")
        outs.append(_engine_final(spark, path, changes, 3, cfg))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_mor_compaction_preserves_state(spark, tmp_path):
    """Compaction (and the read fast path it enables) must not change what
    readers see; tombstones survive compaction until vacuum."""
    changes = gen_changes(
        spark,
        n_events=6_000,
        n_convs=200,
        n_epochs=6,
        update_ratio=0.3,
        delete_ratio=0.1,
        late_ratio=0.05,
    )
    # threshold 2 → compaction actually fires mid-stream
    cfg = EngineConfig(n_buckets=8, write_mode="mor", compact_threshold=2)
    path = str(tmp_path / "lake_compact")
    engine_df = _engine_final(spark, path, changes, 6, cfg)
    _assert_matches_oracle(engine_df, changes.toPandas())

    table = LakeTable.load(path)
    snap = table.snapshot()
    assert any(s["op"] == "compact" for s in table.snapshots())
    # auto-compaction keeps every bucket below the generation threshold
    assert all(
        info.get("gens", 1) < cfg.compact_threshold + 1
        for info in snap["buckets"].values()
    )


def test_pathological_hot_key(spark, tmp_path):
    """20% of ALL events rewritten onto a single (conv_id, turn_idx) — the
    worst-case hot key the north rule's skew mitigation must survive. The
    map-side max_by combine collapses the hot key's versions before the
    shuffle; the result must still be oracle-exact."""
    from pyspark.sql import functions as F

    ch = gen_changes(spark, n_events=20_000, n_convs=300, n_epochs=4, skew=0.0)
    hot = F.pmod(F.xxhash64("lsn", F.lit(7)), F.lit(5)) == 0
    ch = ch.withColumn(
        "conv_id", F.when(hot, F.lit("c_hotkey")).otherwise(F.col("conv_id"))
    ).withColumn("turn_idx", F.when(hot, F.lit(0)).otherwise(F.col("turn_idx")))
    cfg = EngineConfig(n_buckets=8, salt_factor=4)
    engine_df = _engine_final(spark, str(tmp_path / "lake_hot"), ch, 4, cfg)
    _assert_matches_oracle(engine_df, ch.toPandas())


def test_rate_limited_compaction(spark, tmp_path):
    """compact_max_buckets bounds one maintenance pass; state is unchanged
    and backlog drains across epochs instead of stalling one of them."""
    changes = gen_changes(
        spark, n_events=6_000, n_convs=200, n_epochs=6, update_ratio=0.3
    )
    cfg = EngineConfig(
        n_buckets=8, write_mode="mor", compact_threshold=2, compact_max_buckets=3
    )
    path = str(tmp_path / "lake_ratelimit")
    engine_df = _engine_final(spark, path, changes, 6, cfg)
    _assert_matches_oracle(engine_df, changes.toPandas())
    table = LakeTable.load(path)
    compact_snaps = [s for s in table.snapshots() if s["op"] == "compact"]
    assert compact_snaps, "compaction never fired"
    # each pass rewrote at most max_buckets buckets
    assert all(len(s["lineage"]) <= 3 for s in compact_snaps)


def test_idempotent_reapply(spark, tmp_table):
    """Re-applying an already-committed epoch changes nothing (SURVEY §5.5)."""
    cfg = EngineConfig(n_buckets=8)
    changes = gen_changes(spark, n_events=2_000, n_convs=100, n_epochs=2)
    job = IngestJob(tmp_table, cfg)
    job.run_batches(spark, epoch_batches(changes, 2))
    table = LakeTable.load(tmp_table)
    before = table.read(spark).orderBy("conv_id", "turn_idx").toPandas()
    sid_before = table.current_snapshot_id()

    m = job.run_batches(spark, epoch_batches(changes, 2))
    assert all(x["skipped"] for x in m)
    assert table.current_snapshot_id() == sid_before
    after = table.read(spark).orderBy("conv_id", "turn_idx").toPandas()
    pd.testing.assert_frame_equal(before, after)
