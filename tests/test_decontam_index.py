"""Incremental decontamination index (plans/decontam.py): a contaminated-docs
lake table maintained from the base documents table's change feed must, after
any sequence of upserts/edits/deletes across epochs, equal the one-shot
decontamination recomputed from scratch over the base's current state — in
particular a doc EDITED CLEAN must leave the list (tombstone, not stale row),
and a doc edited to include benchmark text must enter it."""

from __future__ import annotations

import os

import pyspark.sql.types as T
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark.functions.minhash import shingles
from cnpj_data_pipeline_spark.lake.format import LakeTable
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.plans.decontam import (
    DecontamIndexJob,
    eval_gram_set,
)

SF_DIR = "/root/testdata/sf0.001"
K = 4

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


def _expected(spark, base: LakeTable, ev_grams):
    """One-shot decontamination of the base table's CURRENT state."""
    state = base.read(spark).select("doc_id", "text")
    return (
        state.select("doc_id", F.explode(shingles("text", K)).alias("gram"))
        .join(ev_grams, "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").cast("int").alias("n_eval_grams_hit"))
    )


def _as_set(df):
    return {
        (r["doc_id"], r["n_eval_grams_hit"])
        for r in df.select("doc_id", "n_eval_grams_hit").collect()
    }


def test_incremental_decontam_tracks_upserts_edits_deletes(spark, tmp_path):
    docs = _corpus(spark)
    # frozen benchmark: every 10th doc's grams (the eval suite is a static
    # artifact — NOT read from the mutable lake)
    ev_rows = [r for r in docs if r["doc_id"] % 10 == 0]
    train = [r for r in docs if r["doc_id"] % 10 != 0]
    ev_grams = eval_gram_set(
        spark.createDataFrame(ev_rows, DOC_SCHEMA), k=K
    ).cache()

    base_root = str(tmp_path / "docs_lake")
    idx_root = str(tmp_path / "decontam")
    base = LakeTable.create(base_root, DOC_SCHEMA, ["doc_id"], 8)
    job = DecontamIndexJob(base_root, idx_root, ev_grams, k=K, n_buckets=8)

    # epoch 1: first 60 training docs
    apply_changes(
        spark,
        base,
        _ch(
            spark,
            [(r["doc_id"], r["text"], "U", i) for i, r in enumerate(train[:60])],
        ),
        epoch=1,
    )
    m1 = job.run_once(spark)
    assert m1["epochs_synced"] == [1]
    exp1 = _as_set(_expected(spark, base, ev_grams))
    assert _as_set(job.contaminated(spark)) == exp1
    assert exp1, "fixture must produce at least one contaminated doc"

    # epoch 2: the rest of the corpus, one contaminated doc edited CLEAN,
    # one clean doc edited to CONTAIN an eval doc's text
    contaminated_ids = sorted(i for i, _ in exp1)
    clean_ids = sorted(
        r["doc_id"] for r in train[:60] if r["doc_id"] not in dict(exp1)
    )
    dirty_to_clean = contaminated_ids[0]
    clean_to_dirty = clean_ids[0]
    lsn = 1000
    rows = [
        (r["doc_id"], r["text"], "U", lsn + i) for i, r in enumerate(train[60:])
    ]
    rows.append(
        (dirty_to_clean, "uncontaminated replacement text entirely", "U", 2000)
    )
    rows.append(
        (clean_to_dirty, "prefix words then " + ev_rows[0]["text"], "U", 2001)
    )
    apply_changes(spark, base, _ch(spark, rows), epoch=2)
    m2 = job.run_once(spark)
    assert m2["epochs_synced"] == [2]
    exp2 = _as_set(_expected(spark, base, ev_grams))
    got2 = _as_set(job.contaminated(spark))
    assert got2 == exp2
    assert dirty_to_clean not in {i for i, _ in got2}
    assert clean_to_dirty in {i for i, _ in got2}

    # epoch 3: delete one still-contaminated doc -> it leaves the list
    victim = sorted(i for i, _ in got2)[0]
    apply_changes(
        spark, base, _ch(spark, [(victim, None, "D", 3000)]), epoch=3
    )
    m3 = job.run_once(spark)
    assert m3["epochs_synced"] == [3]
    got3 = _as_set(job.contaminated(spark))
    assert got3 == _as_set(_expected(spark, base, ev_grams))
    assert victim not in {i for i, _ in got3}

    # idempotency: nothing pending, state unchanged
    m4 = job.run_once(spark)
    assert m4["epochs_synced"] == [] and m4["rows_applied"] == 0
    assert _as_set(job.contaminated(spark)) == got3


def test_window_fold_scores_final_text(spark, tmp_path):
    """A consumer resuming after several missed epochs folds them into one
    window: the net feed carries each doc's FINAL text, so one sync equals
    the per-epoch path (insert-dirty then edit-clean nets to NO row)."""
    docs = _corpus(spark)
    ev_rows = [r for r in docs if r["doc_id"] % 10 == 0]
    ev_grams = eval_gram_set(spark.createDataFrame(ev_rows, DOC_SCHEMA), k=K)

    base_root = str(tmp_path / "docs_lake")
    base = LakeTable.create(base_root, DOC_SCHEMA, ["doc_id"], 4)
    job = DecontamIndexJob(
        base_root, str(tmp_path / "decontam"), ev_grams, k=K, n_buckets=4
    )

    # epoch 1 inserts an eval-identical (maximally contaminated) doc and a
    # clean one; epoch 2 edits the dirty one clean and deletes the clean one
    apply_changes(
        spark,
        base,
        _ch(
            spark,
            [
                (900, ev_rows[0]["text"], "U", 1),
                (901, "totally clean text here", "U", 2),
            ],
        ),
        epoch=1,
    )
    apply_changes(
        spark,
        base,
        _ch(
            spark,
            [
                (900, "now scrubbed of benchmark words", "U", 3),
                (901, None, "D", 4),
            ],
        ),
        epoch=2,
    )
    m = job.run_once(spark)
    assert m["epochs_synced"] == [1, 2]
    assert job.contaminated(spark).count() == 0
    assert _as_set(job.contaminated(spark)) == _as_set(
        _expected(spark, base, ev_grams)
    )
