"""Secondary projection (plans/projection.py): a hash-keyed re-projection of
the near-dup band index, maintained from the band index's TYPED change feed —
two chained CDC hops (base docs -> band index -> projection), each
exactly-once. After any sequence of upserts/edits/deletes the projection must
equal the band index's live state re-keyed, including the case the net feed
cannot express: an edit that CHANGES a row's band hashes must retract the old
(band, h1, h2, doc_id) key, not leave it stale."""

from __future__ import annotations

import os

import pyspark.sql.types as T
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark.lake.format import LakeTable
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.plans.neardup import NearDupIndexJob
from cnpj_data_pipeline_spark.plans.projection import ProjectionSyncJob

SF_DIR = "/root/testdata/sf0.001"

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

PROJ_KEY = ("band", "h1", "h2", "doc_id")


def _corpus(spark):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select(F.col("doc_id").cast("long"), "text")
        .orderBy("doc_id")
        .limit(100)
        .collect()
    )


def _ch(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, op string, lsn long"
    )


def _as_set(df):
    return {tuple(r[c] for c in PROJ_KEY) for r in df.collect()}


def _expected(spark, index_job: NearDupIndexJob):
    return index_job.index_table().read(spark).select(*PROJ_KEY)


def test_chained_projection_tracks_band_index(spark, tmp_path):
    docs = _corpus(spark)
    base_root = str(tmp_path / "docs")
    idx_root = str(tmp_path / "bands")
    proj_root = str(tmp_path / "by_hash")
    base = LakeTable.create(base_root, DOC_SCHEMA, ["doc_id"], 4)
    index = NearDupIndexJob(base_root, idx_root, n_buckets=4)
    proj = ProjectionSyncJob(idx_root, proj_root, key_cols=PROJ_KEY)

    # hop 1+2, epoch 1: first 60 docs
    apply_changes(
        spark,
        base,
        _ch(spark, [(r["doc_id"], r["text"], "U", i) for i, r in enumerate(docs[:60])]),
        epoch=1,
    )
    index.run_once(spark)
    m1 = proj.run_once(spark)
    assert m1["epochs_synced"], m1
    assert _as_set(proj.read(spark)) == _as_set(_expected(spark, index))

    # epoch 2: EDIT doc 0's text (its band hashes change -> every old
    # (band, h1, h2, 0) key must be retracted), delete doc 1, insert the rest
    old_doc0_keys = {
        k for k in _as_set(proj.read(spark)) if k[3] == 0
    }
    assert old_doc0_keys
    rows = [(r["doc_id"], r["text"], "U", 1000 + i) for i, r in enumerate(docs[60:])]
    rows += [
        (0, "completely different replacement text body", "U", 2000),
        (1, None, "D", 2001),
    ]
    apply_changes(spark, base, _ch(spark, rows), epoch=2)
    index.run_once(spark)
    m2 = proj.run_once(spark)
    assert m2["epochs_synced"], m2
    got = _as_set(proj.read(spark))
    assert got == _as_set(_expected(spark, index))
    assert not (old_doc0_keys & got), "stale hash keys must be retracted"
    assert not any(k[3] == 1 for k in got), "deleted doc's keys must go"
    assert any(k[3] == 0 for k in got), "edited doc re-asserts new hashes"

    # point lookup through the projection == filtering the band index
    some = sorted(got)[0]
    by_hash = proj.read(spark).filter(
        (F.col("band") == some[0])
        & (F.col("h1") == some[1])
        & (F.col("h2") == some[2])
    )
    via_index = (
        index.index_table()
        .read(spark)
        .filter(
            (F.col("band") == some[0])
            & (F.col("h1") == some[1])
            & (F.col("h2") == some[2])
        )
    )
    assert {r["doc_id"] for r in by_hash.collect()} == {
        r["doc_id"] for r in via_index.collect()
    }

    # idempotency at both hops
    assert index.run_once(spark)["epochs_synced"] == []
    m3 = proj.run_once(spark)
    assert m3["epochs_synced"] == [] and m3["rows_applied"] == 0
    assert _as_set(proj.read(spark)) == got


def test_projection_with_payload_columns(spark, tmp_path):
    """payload_cols ride as non-key payload: re-key the band index by
    (band, doc_id) carrying (h1, h2) — updates overwrite the payload in
    place, deletes retract the key (typed null-cast path)."""
    docs = _corpus(spark)
    base_root = str(tmp_path / "docs")
    base = LakeTable.create(base_root, DOC_SCHEMA, ["doc_id"], 4)
    index = NearDupIndexJob(base_root, str(tmp_path / "bands"), n_buckets=4)
    proj = ProjectionSyncJob(
        str(tmp_path / "bands"),
        str(tmp_path / "by_band_doc"),
        key_cols=("band", "doc_id"),
        payload_cols=("h1", "h2"),
    )
    apply_changes(
        spark,
        base,
        _ch(spark, [(r["doc_id"], r["text"], "U", i) for i, r in enumerate(docs[:30])]),
        epoch=1,
    )
    index.run_once(spark)
    proj.run_once(spark)

    def _state(df):
        return {
            (r["band"], r["doc_id"]): (r["h1"], r["h2"]) for r in df.collect()
        }

    assert _state(proj.read(spark)) == _state(
        index.index_table().read(spark).select("band", "doc_id", "h1", "h2")
    )

    # edit doc 3 (hashes move under the SAME keys -> payload overwrite),
    # delete doc 4 (keys retract)
    apply_changes(
        spark,
        base,
        _ch(spark, [(3, "replacement body of words", "U", 500), (4, None, "D", 501)]),
        epoch=2,
    )
    index.run_once(spark)
    proj.run_once(spark)
    got = _state(proj.read(spark))
    assert got == _state(
        index.index_table().read(spark).select("band", "doc_id", "h1", "h2")
    )
    assert not any(d == 4 for _, d in got)
    assert any(d == 3 for _, d in got)


def test_unchanged_projected_key_survives_update(spark, tmp_path):
    """An update that does NOT move the projected key (same text re-sent at
    a higher lsn changes nothing in the band index; but also: a direct
    same-key update) must net to the assertion — the anti-join keeps the
    key live instead of letting the retraction win the window."""
    docs = _corpus(spark)
    base_root = str(tmp_path / "docs")
    base = LakeTable.create(base_root, DOC_SCHEMA, ["doc_id"], 4)
    index = NearDupIndexJob(base_root, str(tmp_path / "bands"), n_buckets=4)
    proj = ProjectionSyncJob(
        str(tmp_path / "bands"), str(tmp_path / "by_hash"), key_cols=PROJ_KEY
    )
    apply_changes(
        spark,
        base,
        _ch(spark, [(r["doc_id"], r["text"], "U", i) for i, r in enumerate(docs[:20])]),
        epoch=1,
    )
    index.run_once(spark)
    proj.run_once(spark)
    before = _as_set(proj.read(spark))

    # append a token to doc 2: SOME shingles change, so some band hashes
    # move and others stay identical — the stayed ones are exactly the
    # update_preimage/update_postimage same-key case the anti-join covers
    doc2 = next(r["text"] for r in docs if r["doc_id"] == 2)
    apply_changes(
        spark, base, _ch(spark, [(2, doc2 + " extra", "U", 500)]), epoch=2
    )
    index.run_once(spark)
    proj.run_once(spark)
    got = _as_set(proj.read(spark))
    assert got == _as_set(_expected(spark, index))
    # every non-doc-2 key is untouched
    assert {k for k in before if k[3] != 2} == {k for k in got if k[3] != 2}
