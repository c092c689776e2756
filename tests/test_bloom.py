"""Per-file key bloom sidecars (lake/bloom.py): the third pruning level of
read_keys. Blooms may only cause extra scans (false positives), never wrong
results — every test here pins an oracle alongside the pruning assertion.
Reference analogue: none (Postgres point lookups ride the PK B-tree,
init-db/postgres.sql); a file lake needs file skipping to compete."""

from __future__ import annotations

import glob
import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark import EngineConfig, IngestJob, LakeTable
from cnpj_data_pipeline_spark.gen import epoch_batches, gen_changes
from cnpj_data_pipeline_spark.lake import bloom as B
from cnpj_data_pipeline_spark.lake.format import bucket_expr
from cnpj_data_pipeline_spark.oracle import final_state
from cnpj_data_pipeline_spark.sources import change_stream as cs

KEY = ["conv_id", "turn_idx"]


def test_bloom_roundtrip_and_fpr(tmp_path):
    keys = [f"conv-{i}" for i in range(30_000)]
    dp = str(tmp_path / "part-x.parquet")
    open(dp, "w").close()
    B.write_sidecar(dp, keys)
    bl = B.load_sidecar(dp)
    assert bl is not None and bl["n"] == 30_000
    # NO false negatives — the correctness invariant
    assert all(B.may_contain_any(bl, [k]) for k in keys[::100])
    # false-positive rate near the 1% target
    absent = [f"absent-{i}" for i in range(10_000)]
    fpr = sum(B.may_contain_any(bl, [k]) for k in absent) / len(absent)
    assert fpr < 0.03
    # any-hit semantics over a mixed batch
    assert B.may_contain_any(bl, absent[:50] + [keys[0]])
    assert not B.may_contain_any(bl, absent[:50])


def test_bloom_sentinel_guards_hash_drift(tmp_path):
    """A sidecar whose hash scheme doesn't match the loader's is DISCARDED
    (scan, never a wrong skip) — the guard against pandas hash changes."""
    dp = str(tmp_path / "part-y.parquet")
    open(dp, "w").close()
    B.write_sidecar(dp, ["a", "b"])
    sp = B.sidecar_path(dp)
    j = json.load(open(sp))
    j["sentinel"] ^= 1
    json.dump(j, open(sp, "w"))
    assert B.load_sidecar(dp) is None
    # torn/corrupt JSON likewise
    open(sp, "w").write('{"v": 1, "trunc')
    assert B.load_sidecar(dp) is None


def _keys_by_bucket(spark, kd, n_buckets):
    pairs = kd.select(
        bucket_expr(KEY, n_buckets).alias("b"),
        F.col(KEY[0]).alias("k"),
    ).collect()
    out: dict[int, list] = {}
    for r in pairs:
        out.setdefault(int(r["b"]), []).append(r["k"])
    return out


def test_blooms_prune_mor_generations_and_results_match(spark, tmp_path):
    """Uncompacted MoR deltas have useless key ranges (arbitrary keys per
    epoch); the bloom level must actually skip generation files AND
    read_keys must stay oracle-identical."""
    ch = gen_changes(spark, n_events=16_000, n_convs=500, n_epochs=5)
    wal = str(tmp_path / "wal")
    for e, b in epoch_batches(ch, 5):
        cs.write_epoch(b, wal, e)
    job = IngestJob(
        str(tmp_path / "lake"),
        EngineConfig(n_buckets=8, key_blooms="force", compact_threshold=100),
    )
    job.run_stream(spark, wal)
    t = LakeTable.load(str(tmp_path / "lake"))

    side = glob.glob(f"{t.root}/data/**/.*.bloom", recursive=True)
    data = glob.glob(f"{t.root}/data/**/*.parquet", recursive=True)
    assert len(side) == len(data) > 0

    pdf = ch.toPandas()
    sample = (
        pdf[["conv_id", "turn_idx"]].drop_duplicates().head(5)
    )
    kd = spark.createDataFrame(sample)
    snap = t.snapshot()
    kbb = _keys_by_bucket(spark, kd, 8)
    idx = t.prune_key_files(snap, kbb)
    total = sum(len(snap["buckets"][str(b)]["files"]) for b in kbb)
    kept = sum(len(v) for v in idx.values())
    assert kept < total, "blooms must prune some generation files"

    got = (
        t.read_keys(spark, kd)
        .orderBy(*KEY)
        .toPandas()
        .reset_index(drop=True)
    )
    golden = final_state(pdf)
    golden = (
        golden.merge(sample, on=KEY)
        .sort_values(KEY)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, golden, check_dtype=False)


def test_copart_ingest_writes_blooms_inline_on_force(spark, tmp_path):
    """key_blooms='force': the shuffle-free Arrow apply builds sidecars from
    the in-memory table at every delta write (no extra read — but per-row
    hash work in the hot loop, which is why it's opt-in: measured ~10% of
    copart ingest wall at bench scale). Default 'auto' writes NONE at
    ingest — the hot path stays footer-only."""
    ch = gen_changes(spark, n_events=6_000, n_convs=200, n_epochs=2)
    wal = str(tmp_path / "wal")
    for e, b in epoch_batches(ch, 2):
        cs.write_epoch_bucketed(b, wal, e, KEY, 8)
    job = IngestJob(
        str(tmp_path / "lake"),
        EngineConfig(n_buckets=8, key_blooms="force", compact_threshold=100),
    )
    ms = job.run_stream(spark, wal)
    assert all(m.get("copartitioned") for m in ms if not m["skipped"])
    t = LakeTable.load(str(tmp_path / "lake"))
    side = glob.glob(f"{t.root}/data/**/.*.bloom", recursive=True)
    data = glob.glob(f"{t.root}/data/**/*.parquet", recursive=True)
    assert len(side) == len(data) > 0


def test_auto_blooms_arrive_with_maintenance(spark, tmp_path):
    """Default key_blooms='auto': ingest writes no sidecars (hot path is
    footer-only); the compaction pass — the read-optimization budget —
    builds them for every file it rewrites."""
    ch = gen_changes(spark, n_events=6_000, n_convs=200, n_epochs=2)
    wal = str(tmp_path / "wal")
    for e, b in epoch_batches(ch, 2):
        cs.write_epoch_bucketed(b, wal, e, KEY, 8)
    job = IngestJob(
        str(tmp_path / "lake"),
        EngineConfig(n_buckets=8, compact_threshold=100),
    )
    job.run_stream(spark, wal)
    t = LakeTable.load(str(tmp_path / "lake"))
    assert glob.glob(f"{t.root}/data/**/.*.bloom", recursive=True) == []
    t.compact(spark)
    t.expire_snapshots(keep_last=1)
    data = glob.glob(f"{t.root}/data/**/*.parquet", recursive=True)
    assert data and all(os.path.exists(B.sidecar_path(p)) for p in data)


def test_blooms_off_and_missing_sidecars_still_correct(spark, tmp_path):
    """key_blooms='off' writes none; a table with PARTIAL sidecars (mixed
    producers) prunes what it can and scans the rest — same results."""
    ch = gen_changes(spark, n_events=6_000, n_convs=200, n_epochs=3)
    wal = str(tmp_path / "wal")
    for e, b in epoch_batches(ch, 3):
        cs.write_epoch(b, wal, e)
    job = IngestJob(
        str(tmp_path / "lake"),
        EngineConfig(n_buckets=8, key_blooms="off", compact_threshold=2),
    )
    job.run_stream(spark, wal)
    t = LakeTable.load(str(tmp_path / "lake"))
    # compact_threshold=2 forces a maintenance pass mid-stream — "off"
    # suppresses sidecars there too, not just at ingest
    assert glob.glob(f"{t.root}/data/**/.*.bloom", recursive=True) == []

    pdf = ch.toPandas()
    sample = pdf[["conv_id", "turn_idx"]].drop_duplicates().head(4)
    kd = spark.createDataFrame(sample)
    # hand-write a sidecar for ONE file (a mixed-producer table)
    some_file = glob.glob(f"{t.root}/data/**/*.parquet", recursive=True)[0]
    import pyarrow.parquet as pq

    B.write_sidecar(
        some_file, pq.read_table(some_file, columns=[KEY[0]])[KEY[0]].to_pylist()
    )
    got = t.read_keys(spark, kd).orderBy(*KEY).toPandas().reset_index(drop=True)
    golden = (
        final_state(pdf).merge(sample, on=KEY).sort_values(KEY)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, golden, check_dtype=False)


def test_gc_shares_sidecar_lifecycle(spark, tmp_path):
    """expire_snapshots removes a dropped file's sidecar; clean_orphans
    keeps sidecars of LIVE files and sweeps orphaned ones."""
    ch = gen_changes(spark, n_events=8_000, n_convs=200, n_epochs=3)
    wal = str(tmp_path / "wal")
    for e, b in epoch_batches(ch, 3):
        cs.write_epoch(b, wal, e)
    job = IngestJob(
        str(tmp_path / "lake"),
        EngineConfig(n_buckets=4, key_blooms="force", compact_threshold=100),
    )
    job.run_stream(spark, wal)
    t = LakeTable.load(str(tmp_path / "lake"))
    # compact rewrites every bucket -> old generations become expirable
    t.compact(spark)
    t.expire_snapshots(keep_last=1)
    data = {
        os.path.abspath(p)
        for p in glob.glob(f"{t.root}/data/**/*.parquet", recursive=True)
    }
    for sp in glob.glob(f"{t.root}/data/**/.*.bloom", recursive=True):
        assert os.path.abspath(B.data_file_of_sidecar(sp)) in data, (
            f"orphan sidecar survived expire: {sp}"
        )
    # live files written by the map-only compaction carry blooms
    assert data and all(
        os.path.exists(B.sidecar_path(p)) for p in data
    )
    # an orphaned sidecar (no data file) is swept by clean_orphans
    fake = os.path.join(t.data_dir, "snap-999")
    os.makedirs(fake, exist_ok=True)
    orphan = os.path.join(fake, ".part-zzz.parquet.bloom")
    open(orphan, "w").write("{}")
    os.utime(orphan, (0, 0))
    t.clean_orphans(grace_sec=0)
    assert not os.path.exists(orphan)
    # read still oracle-correct after the full GC cycle
    got = t.read(spark).orderBy(*KEY).toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, final_state(ch.toPandas()), check_dtype=False
    )
