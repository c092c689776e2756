"""Structured Streaming ingest: drain a WAL with availableNow, restart from the
streaming checkpoint, verify exactly-once composition with the lake lineage."""

from __future__ import annotations

import pandas as pd

from cnpj_data_pipeline_spark import EngineConfig, LakeTable
from cnpj_data_pipeline_spark.gen import gen_changes
from cnpj_data_pipeline_spark.oracle import final_state
from cnpj_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA
from cnpj_data_pipeline_spark.streaming.stream_job import stream_ingest


def test_stream_ingest_availablenow_and_restart(spark, tmp_path):
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")

    ch = gen_changes(spark, n_events=3_000, n_convs=120, n_epochs=3)
    # WAL = flat parquet files (file-source streaming needs a flat dir)
    ch.repartition(6).write.mode("overwrite").parquet(wal)

    table = LakeTable.create(
        lake, TRANSCRIPT_SCHEMA, key_cols=["conv_id", "turn_idx"], n_buckets=8
    )
    cfg = EngineConfig(n_buckets=8)

    q = stream_ingest(
        spark, wal, table, ckpt, schema=CHANGE_SCHEMA, cfg=cfg,
        max_files_per_trigger=2,
    )
    q.awaitTermination(120)

    final = (
        table.read(spark).orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    )
    golden = final_state(ch.toPandas())
    pd.testing.assert_frame_equal(final, golden, check_dtype=False)

    applied_before = sorted(table.applied_epochs())
    assert len(applied_before) >= 2  # several micro-batches

    # restart with the same checkpoint: nothing new → no new snapshots
    sid = table.current_snapshot_id()
    q2 = stream_ingest(
        spark, wal, table, ckpt, schema=CHANGE_SCHEMA, cfg=cfg,
        max_files_per_trigger=2,
    )
    q2.awaitTermination(120)
    assert table.current_snapshot_id() == sid

    # append more WAL files → only the delta is consumed
    more = gen_changes(spark, n_events=1_000, n_convs=120, n_epochs=1, seed=43)
    more.repartition(2).write.mode("append").parquet(wal)
    q3 = stream_ingest(
        spark, wal, table, ckpt, schema=CHANGE_SCHEMA, cfg=cfg,
        max_files_per_trigger=2,
    )
    q3.awaitTermination(120)

    # seed=43 reuses lsn space 0..999, so its events LOSE to existing state
    # under per-key LWW — the oracle fold over the concatenation agrees.
    golden2 = final_state(pd.concat([ch.toPandas(), more.toPandas()], ignore_index=True))
    final2 = (
        table.read(spark).orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(final2, golden2, check_dtype=False)
