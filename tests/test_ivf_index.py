"""Incremental IVF index (plans/ivf.py): a coarse-quantizer assignment lake
table maintained from the base embeddings table's change feed must, after any
sequence of upserts/re-embeddings/deletes across epochs, equal the assignment
recomputed from scratch over the base's current state — and its probe search
must equal the batch IVF search (queries/vector.py `_ivf_topk`) over the same
state and codebook. Compaction (which re-clusters by the declared
sort_order=cell) must not change either."""

from __future__ import annotations

import os

import pyspark.sql.types as T
from pyspark.sql import Window
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark.lake.format import LakeTable
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.plans.ivf import IVFIndexJob, _dot

SF_DIR = "/root/testdata/sf0.001"

EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("emb", T.ArrayType(T.DoubleType())),
    ]
)


def _vectors(spark):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        .select(
            F.col("vec_id").cast("long"),
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
                "emb"
            ),
        )
        .orderBy("vec_id")
        .limit(300)
        .collect()
    )


def _cents(spark, rows):
    """Frozen codebook: the queries/vector.py seed slice (vec_id 100..107)."""
    return spark.createDataFrame(
        [(int(r["vec_id"] - 100), r["emb"]) for r in rows if 100 <= r["vec_id"] < 108],
        "cell int, cent array<double>",
    ).cache()


def _ch(spark, rows):
    """rows: (vec_id, emb|None, op, lsn)"""
    return spark.createDataFrame(
        rows, "vec_id long, emb array<double>, op string, lsn long"
    )


def _expected_assign(spark, base: LakeTable, cents):
    """From-scratch assignment of the base table's CURRENT state."""
    state = base.read(spark).select("vec_id", "emb")
    scored = state.join(F.broadcast(cents)).select(
        "vec_id",
        "cell",
        F.round(_dot(F.col("emb"), F.col("cent")), 6).alias("aff"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("aff").desc(), F.col("cell").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell")
    )


def _as_set(df):
    return {(r["vec_id"], r["cell"]) for r in df.collect()}


def test_incremental_ivf_tracks_upserts_reembeds_deletes(spark, tmp_path):
    rows = _vectors(spark)
    cents = _cents(spark, rows)
    base_root = str(tmp_path / "emb_lake")
    base = LakeTable.create(base_root, EMB_SCHEMA, ["vec_id"], 8)
    job = IVFIndexJob(
        base_root, str(tmp_path / "ivf"), cents, n_buckets=8
    )

    # epoch 1: the first 200 vectors
    apply_changes(
        spark,
        base,
        _ch(
            spark,
            [(r["vec_id"], r["emb"], "U", i) for i, r in enumerate(rows[:200])],
        ),
        epoch=1,
    )
    m1 = job.run_once(spark)
    assert m1["epochs_synced"] == [1]
    assert _as_set(job.assignments(spark)) == _as_set(
        _expected_assign(spark, base, cents)
    )
    # the posting-list layout is declared on first sync
    props = job.index_table().snapshot().get("props") or {}
    assert tuple(props.get("sort_order") or ()) == ("cell",)

    # epoch 2: re-embed vec 5 (takes vec 250's embedding -> may change cell),
    # delete vec 6, insert the remaining 100
    emb250 = next(r["emb"] for r in rows if r["vec_id"] == 250)
    batch = [(r["vec_id"], r["emb"], "U", 1000 + i) for i, r in enumerate(rows[200:])]
    batch += [(5, emb250, "U", 2000), (6, None, "D", 2001)]
    apply_changes(spark, base, _ch(spark, batch), epoch=2)
    m2 = job.run_once(spark)
    assert m2["epochs_synced"] == [2]
    got = _as_set(job.assignments(spark))
    assert got == _as_set(_expected_assign(spark, base, cents))
    assert 6 not in {v for v, _ in got}

    # probe search against the maintained index == the batch IVF search over
    # the same state and codebook (same rounding and tie-breaks)
    from cnpj_data_pipeline_spark.queries.vector import _ivf_topk

    state = base.read(spark).select("vec_id", "emb")
    expected = _ivf_topk(state, cents)  # N_QUERIES=5, N_PROBE=2, TOP_K=5
    queries = state.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    got_topk = job.topk(spark, queries, k=5, n_probe=2)
    key = lambda df: {
        (r["query_id"], r["cand_id"], r["cosine"], r["rank"])
        for r in df.collect()
    }
    assert key(got_topk) == key(expected)

    # compaction re-clusters by cell; assignments and search are invariant
    job.index_table().compact(spark)
    assert _as_set(job.assignments(spark)) == got
    assert key(job.topk(spark, queries, k=5, n_probe=2)) == key(expected)

    # idempotency: nothing pending, nothing applied
    m3 = job.run_once(spark)
    assert m3["epochs_synced"] == [] and m3["rows_applied"] == 0
