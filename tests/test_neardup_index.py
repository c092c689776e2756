"""Incremental near-dup index (plans/neardup.py): a MinHash band-index lake
table maintained from the base documents table's change feed must, after any
sequence of upserts/edits/deletes across epochs (including replays), equal
the index recomputed from scratch over the base's current state — and its
candidate lookup must equal from-scratch LSH banding."""

from __future__ import annotations

import os

import pyspark.sql.types as T
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark.functions.minhash import (
    band_rows,
    minhash_signatures,
)
from cnpj_data_pipeline_spark.lake.format import LakeTable
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.plans.neardup import NearDupIndexJob

SF_DIR = "/root/testdata/sf0.001"

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _corpus(spark):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select(F.col("doc_id").cast("long"), "text")
        .orderBy("doc_id")
        .limit(120)
        .collect()
    )


def _ch(spark, rows):
    """rows: (doc_id, text|None, op, lsn)"""
    return spark.createDataFrame(
        rows, "doc_id long, text string, op string, lsn long"
    )


def _expected_index(spark, base: LakeTable):
    state = base.read(spark).select("doc_id", "text")
    return band_rows(minhash_signatures(state, "doc_id", "text"), "doc_id")


def _as_set(df):
    return {
        (r["doc_id"], r["band"], r["h1"], r["h2"])
        for r in df.select("doc_id", "band", "h1", "h2").collect()
    }


def test_incremental_index_tracks_upserts_edits_deletes(spark, tmp_path):
    docs = _corpus(spark)
    base_root = str(tmp_path / "docs_lake")
    idx_root = str(tmp_path / "band_index")
    base = LakeTable.create(base_root, DOC_SCHEMA, ["doc_id"], 8)
    job = NearDupIndexJob(base_root, idx_root, n_buckets=8)

    # epoch 1: first 80 docs
    apply_changes(
        spark,
        base,
        _ch(spark, [(r["doc_id"], r["text"], "U", i) for i, r in enumerate(docs[:80])]),
        epoch=1,
    )
    m1 = job.run_once(spark)
    assert m1["epochs_synced"] == [1]
    assert _as_set(job.index_table().read(spark)) == _as_set(
        _expected_index(spark, base)
    )

    # epoch 2: 40 more docs, EDIT 10 existing (swap their texts with other
    # docs' texts so the band hashes genuinely change), DELETE 15
    edits = [
        (docs[i]["doc_id"], docs[i + 80]["text"], "U", 1000 + i) for i in range(10)
    ]
    news = [
        (r["doc_id"], r["text"], "U", 2000 + i) for i, r in enumerate(docs[80:120])
    ]
    dels = [(docs[i]["doc_id"], None, "D", 3000 + i) for i in range(20, 35)]
    apply_changes(spark, base, _ch(spark, edits + news + dels), epoch=2)
    m2 = job.run_once(spark)
    assert m2["epochs_synced"] == [2]
    got = _as_set(job.index_table().read(spark))
    want = _as_set(_expected_index(spark, base))
    assert got == want
    # deleted docs left no index rows
    deleted = {d[0] for d in dels}
    assert not {r for r in got if r[0] in deleted}

    # replay is a no-op (exactly-once at the consumer)
    m3 = job.run_once(spark)
    assert m3["epochs_synced"] == [] and m3["rows_applied"] == 0
    assert _as_set(job.index_table().read(spark)) == want


def test_candidate_lookup_matches_scratch_banding(spark, tmp_path):
    docs = _corpus(spark)
    base_root = str(tmp_path / "docs_lake")
    idx_root = str(tmp_path / "band_index")
    base = LakeTable.create(base_root, DOC_SCHEMA, ["doc_id"], 8)
    job = NearDupIndexJob(base_root, idx_root, n_buckets=8)
    apply_changes(
        spark,
        base,
        _ch(spark, [(r["doc_id"], r["text"], "U", i) for i, r in enumerate(docs)]),
        epoch=1,
    )
    job.run_once(spark)

    # probe with shifted ids but the same texts -> every probe must collide
    # with its source doc (identical signature), and with nothing spurious
    # beyond what from-scratch banding of (corpus ∪ probes) produces
    probes = spark.createDataFrame(
        [(10_000 + r["doc_id"], r["text"]) for r in docs[:30]],
        "doc_id long, text string",
    )
    got = {
        (r["probe_id"], r["index_id"])
        for r in job.candidates_for(spark, probes).collect()
    }
    assert {(10_000 + r["doc_id"], r["doc_id"]) for r in docs[:30]} <= got

    # oracle: band corpus+probes from scratch, join, keep probe->index pairs
    allb = band_rows(
        minhash_signatures(
            probes.unionByName(
                spark.createDataFrame(
                    [(r["doc_id"], r["text"]) for r in docs],
                    "doc_id long, text string",
                )
            ),
            "doc_id",
            "text",
        ),
        "doc_id",
    )
    a, b = allb.alias("a"), allb.alias("b")
    want = {
        (r["pa"], r["pb"])
        for r in a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h1") == F.col("b.h1"))
            & (F.col("a.h2") == F.col("b.h2"))
            & (F.col("a.doc_id") >= 10_000)
            & (F.col("b.doc_id") < 10_000),
        )
        .select(F.col("a.doc_id").alias("pa"), F.col("b.doc_id").alias("pb"))
        .distinct()
        .collect()
    }
    assert got == want
