"""Manifest column-stats file skipping (read_range): a range predicate on
any scalar column skips files whose footer-harvested min/max miss the range
— without ever changing results. Soundness rule: unmerged MoR buckets are
never pruned (a key's winner may hide in any generation)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark import EngineConfig, LakeTable
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA

CFG = EngineConfig(n_buckets=4, salt_factor=1, compact_threshold=None)
DAY0 = dt.datetime(2026, 3, 1)


def _epoch_rows(e: int, n: int = 120, keyed_overlap: bool = False) -> pd.DataFrame:
    """Epoch ``e``'s batch: every ts inside day ``e`` — per-file ts ranges
    disjoint across epochs, the arrival-ordered event-log shape."""
    base = e * 10_000
    return pd.DataFrame(
        {
            "conv_id": [f"c{(base + i) % 37:05d}" for i in range(n)],
            "turn_idx": [
                (i % 7) if keyed_overlap else (base + i) for i in range(n)
            ],
            "role": ["user" if i % 2 else "assistant" for i in range(n)],
            "text": [f"msg-{e}-{i}" for i in range(n)],
            "tool": [None] * n,
            "ts": [DAY0 + dt.timedelta(days=e, seconds=i) for i in range(n)],
            "op": ["I"] * n,
            "lsn": [base + i for i in range(n)],
        }
    )


def _collect(df):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["text"], r["ts"]) for r in df.collect()
    )


def test_keyless_time_window_prunes_files_and_matches_full_scan(
    spark, tmp_table
):
    t = LakeTable.create(tmp_table, TRANSCRIPT_SCHEMA, None, CFG.n_buckets)
    for e in range(4):
        apply_changes(
            spark, t, spark.createDataFrame(_epoch_rows(e)), epoch=e, cfg=CFG
        )
    lo, hi = DAY0 + dt.timedelta(days=2), DAY0 + dt.timedelta(days=3)

    idx, report = t.prune_files_by_range(t.snapshot(), "ts", lo, hi)
    # 4 disjoint-day epochs: the one-day window keeps ~1/4 of the files
    assert report["files_total"] > 0
    assert report["files_kept"] <= report["files_total"] // 2

    got = _collect(t.read_range(spark, "ts", lo, hi))
    exp = _collect(
        t.read(spark).filter((F.col("ts") >= lo) & (F.col("ts") <= hi))
    )
    # epoch 2's whole day + epoch 3's first second (inclusive bound)
    assert got == exp and len(got) == 121

    # half-open ranges
    assert len(t.read_range(spark, "ts", lo=lo).collect()) == 240
    assert len(t.read_range(spark, "ts", hi=lo).collect()) == 240 + 1

    # numeric column pruning works off the same harvested stats
    # (turn_idx is epoch-disjoint here: epoch e spans [e*10000, e*10000+119])
    idx, rep2 = t.prune_files_by_range(t.snapshot(), "turn_idx", 20_000, 20_050)
    assert rep2["files_kept"] < rep2["files_total"]
    assert t.read_range(spark, "turn_idx", 20_000, 20_050).count() == 51


def test_keyed_unmerged_buckets_never_pruned(spark, tmp_table):
    """MoR generations of the same keys across epochs: pruning an unmerged
    bucket could surface a stale in-range loser, so it must keep every
    file — and results must equal the plain filtered read before AND after
    compaction."""
    t = LakeTable.create(
        tmp_table, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], CFG.n_buckets
    )
    for e in range(3):
        apply_changes(
            spark, t,
            spark.createDataFrame(_epoch_rows(e, keyed_overlap=True)),
            epoch=e, cfg=CFG,
        )
    snap = t.snapshot()
    assert any(not i.get("merged", True) for i in snap["buckets"].values())
    lo, hi = DAY0, DAY0 + dt.timedelta(days=1)
    _idx, report = t.prune_files_by_range(snap, "ts", lo, hi)
    assert report["files_kept"] == report["files_total"]  # soundness
    exp = _collect(
        t.read(spark).filter((F.col("ts") >= lo) & (F.col("ts") <= hi))
    )
    assert _collect(t.read_range(spark, "ts", lo, hi)) == exp

    # compaction merges the buckets; pruning may now engage, results equal
    t.compact(spark)
    snap2 = t.snapshot()
    assert all(i.get("merged", True) for i in snap2["buckets"].values())
    assert _collect(t.read_range(spark, "ts", lo, hi)) == exp


def test_evolved_column_without_stats_is_always_scanned(spark, tmp_table):
    t = LakeTable.create(tmp_table, TRANSCRIPT_SCHEMA, None, CFG.n_buckets)
    apply_changes(spark, t, spark.createDataFrame(_epoch_rows(0)), epoch=0, cfg=CFG)
    # epoch 1 evolves in a numeric score column
    rows = _epoch_rows(1)
    rows["score"] = range(len(rows))
    apply_changes(spark, t, spark.createDataFrame(rows), epoch=1, cfg=CFG)
    # pre-evolution files have no 'score' stats -> kept (NULLs then fail the
    # exact predicate, standard SQL range semantics)
    got = t.read_range(spark, "score", 10, 20)
    assert got.count() == 11
    assert got.filter(F.col("score").isNull()).count() == 0
