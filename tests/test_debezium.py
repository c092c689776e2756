"""Debezium-envelope JSON source (sources/debezium.py): a standard CDC wire
format lands in the lake through the same exactly-once merge as the parquet
WAL — same oracle fold, deletes carry their key from the pre-image, LSN
falls back to ts_ms when the connector omits source.lsn."""

from __future__ import annotations

import os

import pandas as pd

from cnpj_data_pipeline_spark import EngineConfig, LakeTable
from cnpj_data_pipeline_spark.gen import epoch_batches, gen_changes
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.oracle import final_state
from cnpj_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA
from cnpj_data_pipeline_spark.sources.debezium import (
    changes_to_debezium_json,
    list_debezium_epochs,
    read_debezium_epoch,
)

KEY = ["conv_id", "turn_idx"]


def _write_json_wal(spark, ch, wal, n_epochs):
    for e, b in epoch_batches(ch, n_epochs):
        changes_to_debezium_json(b.drop("epoch")).coalesce(2).write.mode(
            "overwrite"
        ).text(os.path.join(wal, f"epoch={e}"))


def test_debezium_replay_matches_oracle(spark, tmp_path):
    ch = gen_changes(
        spark, n_events=4_000, n_convs=120, n_epochs=3,
        dup_ratio=0.1, late_ratio=0.1, delete_ratio=0.1,
    )
    wal = str(tmp_path / "dbz")
    _write_json_wal(spark, ch, wal, 3)
    assert list_debezium_epochs(wal) == [0, 1, 2]

    cfg = EngineConfig(n_buckets=8)
    table = LakeTable.create(str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, KEY, 8)
    for e in list_debezium_epochs(wal):
        batch = read_debezium_epoch(spark, wal, e, TRANSCRIPT_SCHEMA)
        m = apply_changes(spark, table, batch, epoch=e, cfg=cfg)
        assert not m["skipped"]
    got = (
        table.read(spark)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    golden = final_state(ch.toPandas())
    pd.testing.assert_frame_equal(got, golden, check_dtype=False)
    # idempotent replay: the epoch ledger skips all three
    for e in list_debezium_epochs(wal):
        batch = read_debezium_epoch(spark, wal, e, TRANSCRIPT_SCHEMA)
        assert apply_changes(spark, table, batch, epoch=e, cfg=cfg)["skipped"]


def test_debezium_delete_images_and_lsn_fallback(spark, tmp_path):
    """Deletes must carry key columns from `before` (Debezium sets
    after=null on 'd'); envelopes without source.lsn order by ts_ms."""
    rows = [
        # c: insert (a,0); u: update it; d: delete (b,0) whose only image
        # is the before; one envelope omits source.lsn entirely
        '{"payload":{"before":null,"after":{"conv_id":"a","turn_idx":0,'
        '"role":"user","text":"v1","tool":null,"ts":1700000000000},'
        '"op":"c","ts_ms":1,"source":{"lsn":1}}}',
        '{"payload":{"before":null,"after":{"conv_id":"a","turn_idx":0,'
        '"role":"user","text":"v2","tool":null,"ts":1700000001000},'
        '"op":"u","ts_ms":2,"source":{"lsn":2}}}',
        '{"payload":{"before":{"conv_id":"b","turn_idx":0,"role":"user",'
        '"text":"gone","tool":null,"ts":1700000000000},"after":null,'
        '"op":"d","ts_ms":3,"source":{"lsn":3}}}',
        '{"payload":{"before":null,"after":{"conv_id":"c","turn_idx":0,'
        '"role":"user","text":"no-lsn","tool":null,"ts":1700000002000},'
        '"op":"r","ts_ms":44}}',
    ]
    wal = str(tmp_path / "dbz")
    edir = os.path.join(wal, "epoch=0")
    os.makedirs(edir)
    with open(os.path.join(edir, "part-0.jsonl"), "w") as f:
        f.write("\n".join(rows) + "\n")

    batch = read_debezium_epoch(spark, wal, 0, TRANSCRIPT_SCHEMA)
    pdf = batch.orderBy("lsn").toPandas()
    assert list(pdf["op"]) == ["I", "U", "D", "I"]
    assert list(pdf["lsn"]) == [1, 2, 3, 44]  # ts_ms fallback on the last
    # the delete's key columns came from the pre-image
    assert pdf.iloc[2]["conv_id"] == "b" and pdf.iloc[2]["turn_idx"] == 0

    cfg = EngineConfig(n_buckets=4)
    table = LakeTable.create(str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, KEY, 4)
    apply_changes(spark, table, batch, epoch=0, cfg=cfg)
    got = table.read(spark).orderBy("conv_id").toPandas()
    assert list(got["conv_id"]) == ["a", "c"]  # b deleted
    assert got.iloc[0]["text"] == "v2"  # update won


def test_debezium_dlq_quarantines_bad_rows_and_ingests_rest(spark, tmp_path):
    """Row-level dead-letter queue: corrupted / structurally-invalid lines
    land in the DLQ with a machine-readable reason, the valid rows ingest
    normally, and the final state equals the oracle fold over ONLY the
    valid events — never a job failure, never a silent drop."""
    from pyspark.sql import functions as F

    from cnpj_data_pipeline_spark.sources.debezium import (
        split_debezium_lines,
    )

    ch = gen_changes(spark, n_events=3_000, n_convs=100, n_epochs=2)
    wal = str(tmp_path / "dbz")
    # corrupt a deterministic subset — lsn % 7 == 0 -> truncated JSON
    # (lsn re-derived from the envelope itself so the corruption keys off
    # event identity, not row order)
    for e, b in epoch_batches(ch, 2):
        pairs = changes_to_debezium_json(b.drop("epoch")).withColumn(
            "lsn",
            F.get_json_object("value", "$.payload.source.lsn").cast("long"),
        )
        corrupted = pairs.select(
            F.when(
                F.col("lsn") % 7 == 0, F.substring("value", 1, 20)
            ).otherwise(F.col("value")).alias("value")
        )
        corrupted.coalesce(2).write.mode("overwrite").text(
            os.path.join(wal, f"epoch={e}")
        )

    cfg = EngineConfig(n_buckets=8)
    table = LakeTable.create(str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, KEY, 8)
    dlq_dir = str(tmp_path / "dlq")
    for e in list_debezium_epochs(wal):
        batch = read_debezium_epoch(
            spark, wal, e, TRANSCRIPT_SCHEMA, dlq_dir=dlq_dir
        )
        apply_changes(spark, table, batch, epoch=e, cfg=cfg)

    chp = ch.toPandas()
    n_bad = int((chp["lsn"] % 7 == 0).sum())
    dlq = spark.read.parquet(os.path.join(dlq_dir, "epoch=0"),
                             os.path.join(dlq_dir, "epoch=1"))
    assert dlq.count() == n_bad
    assert set(r["dlq_reason"] for r in dlq.select("dlq_reason").distinct().collect()) == {
        "malformed_json"
    }
    assert set(dlq.columns) == {"value", "dlq_reason", "epoch"}

    got = (
        table.read(spark)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    golden = final_state(chp[chp["lsn"] % 7 != 0])
    pd.testing.assert_frame_equal(got, golden, check_dtype=False)

    # reason taxonomy beyond parse errors, on hand-written envelopes
    lines = spark.createDataFrame(
        [
            ('{"payload": null}',),
            ('{"payload": {"op": "x", "after": {"conv_id": "c1"}, "ts_ms": 1}}',),
            ('{"payload": {"op": "c", "after": null, "ts_ms": 1}}',),
            ('{"payload": {"op": "c", "after": {"conv_id": "c1", "turn_idx": 0}}}',),
        ],
        "value string",
    )
    good, dlq2 = split_debezium_lines(lines, TRANSCRIPT_SCHEMA)
    reasons = [r["dlq_reason"] for r in dlq2.orderBy("value").collect()]
    assert good.count() == 0
    assert sorted(reasons) == [
        "invalid_op", "missing_image", "missing_offset", "missing_payload",
    ]


def test_debezium_job_surface_crash_resume_with_dlq(spark, tmp_path):
    """IngestJob.run_stream(wal_format='debezium', dlq_dir=...): the JSON
    WAL drains through the same epoch ledger as the parquet WAL — injected
    crash mid-stream, resume applies only the pending epochs, third run is
    a no-op — while invalid lines land in the DLQ, per epoch, exactly once
    (resume must not re-quarantine an applied epoch's lines)."""
    from pyspark.sql import functions as F

    from cnpj_data_pipeline_spark import IngestJob

    ch = gen_changes(spark, n_events=4_000, n_convs=120, n_epochs=4)
    wal = str(tmp_path / "dbz")
    for e, b in epoch_batches(ch, 4):
        pairs = changes_to_debezium_json(b.drop("epoch")).withColumn(
            "lsn",
            F.get_json_object("value", "$.payload.source.lsn").cast("long"),
        )
        pairs.select(
            F.when(F.col("lsn") % 11 == 0, F.lit("{truncated"))
            .otherwise(F.col("value")).alias("value")
        ).coalesce(2).write.mode("overwrite").text(
            os.path.join(wal, f"epoch={e}")
        )

    dlq = str(tmp_path / "dlq")
    job = IngestJob(str(tmp_path / "lake"), EngineConfig(n_buckets=8))
    try:
        job.run_stream(
            spark, wal, fail_after=2, wal_format="debezium", dlq_dir=dlq
        )
        raise AssertionError("injected crash did not fire")
    except RuntimeError:
        pass
    m2 = job.run_stream(spark, wal, wal_format="debezium", dlq_dir=dlq)
    assert [m["epoch"] for m in m2 if not m["skipped"]] == [2, 3]
    m3 = job.run_stream(spark, wal, wal_format="debezium", dlq_dir=dlq)
    assert all(m["skipped"] for m in m3) or m3 == []

    chp = ch.toPandas()
    table = LakeTable.load(str(tmp_path / "lake"))
    got = (
        table.read(spark)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    golden = final_state(chp[chp["lsn"] % 11 != 0])
    pd.testing.assert_frame_equal(got, golden, check_dtype=False)

    n_bad = int((chp["lsn"] % 11 == 0).sum())
    dlq_df = spark.read.option("basePath", dlq).parquet(dlq + "/epoch=*")
    assert dlq_df.count() == n_bad  # once per line, despite 3 runs


def test_export_roundtrip_full_window(spark, tmp_path):
    """Outbound CDC gate: source table -> export_changes_debezium(0) ->
    Debezium JSON -> read_debezium_epoch -> apply onto an EMPTY mirror
    must reproduce the source state exactly (full-window export: every
    live key becomes one op='c' envelope)."""
    from cnpj_data_pipeline_spark.sources.debezium import (
        export_changes_debezium,
    )

    ch = gen_changes(
        spark, n_events=4_000, n_convs=120, n_epochs=3,
        dup_ratio=0.1, late_ratio=0.1, delete_ratio=0.1,
    )
    cfg = EngineConfig(n_buckets=8, compact_threshold=None)
    src = LakeTable.create(str(tmp_path / "src"), TRANSCRIPT_SCHEMA, KEY, 8)
    for e, b in epoch_batches(ch, 3):
        apply_changes(spark, src, b, epoch=e, cfg=cfg)

    out = str(tmp_path / "feed")
    exported = export_changes_debezium(spark, src, from_snapshot=0)
    exported.coalesce(2).write.mode("overwrite").text(
        os.path.join(out, "epoch=0")
    )
    # from an empty start every envelope is a create with no before image
    import json as _json

    ops = {
        _json.loads(r["value"])["payload"]["op"]
        for r in exported.collect()
    }
    assert ops == {"c"}

    mirror = LakeTable.create(
        str(tmp_path / "mirror"), TRANSCRIPT_SCHEMA, KEY, 8
    )
    batch = read_debezium_epoch(spark, out, 0, TRANSCRIPT_SCHEMA)
    apply_changes(spark, mirror, batch, epoch=0, cfg=cfg)
    got = (
        mirror.read(spark).orderBy(*KEY).toPandas().reset_index(drop=True)
    )
    want = src.read(spark).orderBy(*KEY).toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_export_roundtrip_incremental_window(spark, tmp_path):
    """Outbound CDC over a LATER window: mirror synced at snapshot S, then
    export (S -> current] and apply — updates carry both images, deletes
    carry the pre-image with the TOMBSTONE's lsn (so they beat the
    mirror's pre-image in the LWW order), and the mirror converges to the
    source state."""
    from cnpj_data_pipeline_spark.sources.debezium import (
        export_changes_debezium,
    )

    ch = gen_changes(
        spark, n_events=6_000, n_convs=150, n_epochs=4,
        dup_ratio=0.1, late_ratio=0.1, delete_ratio=0.15,
    )
    cfg = EngineConfig(n_buckets=8, compact_threshold=None)
    src = LakeTable.create(str(tmp_path / "src"), TRANSCRIPT_SCHEMA, KEY, 8)
    batches = dict(epoch_batches(ch, 4))
    for e in (0, 1):
        apply_changes(spark, src, batches[e], epoch=e, cfg=cfg)
    mid_sid = src.current_snapshot_id()

    # mirror = source at the mid snapshot (bootstrap via full export)
    mirror = LakeTable.create(
        str(tmp_path / "mirror"), TRANSCRIPT_SCHEMA, KEY, 8
    )
    boot = str(tmp_path / "boot")
    export_changes_debezium(
        spark, src, from_snapshot=0, to_snapshot=mid_sid
    ).write.mode("overwrite").text(os.path.join(boot, "epoch=0"))
    apply_changes(
        spark, mirror,
        read_debezium_epoch(spark, boot, 0, TRANSCRIPT_SCHEMA),
        epoch=0, cfg=cfg,
    )

    for e in (2, 3):
        apply_changes(spark, src, batches[e], epoch=e, cfg=cfg)

    inc = str(tmp_path / "inc")
    exported = export_changes_debezium(spark, src, from_snapshot=mid_sid)
    exported.write.mode("overwrite").text(os.path.join(inc, "epoch=0"))
    import json as _json

    envs = [_json.loads(r["value"])["payload"] for r in exported.collect()]
    by_op = {o: [e for e in envs if e["op"] == o] for o in ("c", "u", "d")}
    # the seeded window must exercise every envelope kind
    assert by_op["c"] and by_op["u"] and by_op["d"]
    # updates carry BOTH images; deletes carry the pre-image only
    assert all(e["before"] and e["after"] for e in by_op["u"])
    assert all(e["before"] and e["after"] is None for e in by_op["d"])
    assert all(e["before"] is None and e["after"] for e in by_op["c"])

    apply_changes(
        spark, mirror,
        read_debezium_epoch(spark, inc, 0, TRANSCRIPT_SCHEMA),
        epoch=1, cfg=cfg,
    )
    got = (
        mirror.read(spark).orderBy(*KEY).toPandas().reset_index(drop=True)
    )
    want = src.read(spark).orderBy(*KEY).toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    golden = final_state(ch.toPandas())
    pd.testing.assert_frame_equal(want, golden, check_dtype=False)
