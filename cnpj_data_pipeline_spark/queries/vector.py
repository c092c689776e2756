"""Vector/similarity operators over the ``embeddings`` table: brute-force
cosine top-k (baseline), sign-LSH bucketed near-dup (scale path), per-label
centroid stats.

Cross-engine float determinism: dot products are sequential left-folds over
the array in index order in BOTH engines (Spark ``aggregate``; DuckDB
``list_sum(list_transform(...))`` — element order), with per-element casts to
double first, so the IEEE result is bit-identical; final scores rounded to 6dp.
LSH hyperplane weights are small integers derived from (dim, plane) — exact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_PLANES = 8
TOP_K = 5
N_QUERIES = 5  # vec_id < 5 are the probe vectors


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return e.withColumn(
        "emb", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the correctness baseline every ANN variant is
    judged against. Query set = vec_id < N_QUERIES, broadcast to all
    executors; candidates scanned fully (O(Q*N) but embarrassingly parallel)."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    c = e.select(F.col("vec_id").alias("cand_id"), F.col("emb").alias("ce"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                _dot(F.col("qe"), F.col("ce"))
                / (_norm(F.col("qe")) * _norm(F.col("ce"))),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def _plane_weight(dim_idx, plane):
    """Deterministic small-integer hyperplane weight: ((i*37 + p*101) % 19) - 9."""
    return ((dim_idx * 37 + plane * 101) % 19) - 9


def q_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketing: bucket = bits of sign(<v, h_p>) over N_PLANES
    integer hyperplanes. At scale, near-dup search joins within buckets only."""
    e = _emb(spark, sf_dir)
    bucket = None
    for p in range(N_PLANES):
        w = F.array(*[F.lit(float(_plane_weight(i, p))) for i in range(64)])
        bit = F.when(_dot(F.col("emb"), w) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return (
        e.select("vec_id", "label", bucket.cast("int").alias("bucket"))
    )


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: candidate pairs from shared LSH bucket, verified by
    exact cosine >= 0.8. Join key = bucket, so cost is sum of bucket sizes
    squared, not N^2."""
    e = _emb(spark, sf_dir)
    b = q_lsh_buckets(spark, sf_dir)
    eb = e.join(b, "vec_id").select("vec_id", "bucket", "emb")
    a, c = eb.alias("a"), eb.alias("c")
    pairs = (
        a.join(
            c,
            (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("a.vec_id") < F.col("c.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("c.vec_id").alias("vec_b"),
            F.round(
                _dot(F.col("a.emb"), F.col("c.emb"))
                / (_norm(F.col("a.emb")) * _norm(F.col("c.emb"))),
                6,
            ).alias("cosine"),
        )
    )
    return pairs.filter(F.col("cosine") >= 0.8)


N_CELLS = 8  # IVF coarse cells; centroid seeds are vec_id in [100, 108)
N_PROBE = 2  # cells probed per query


def _cells(e: DataFrame) -> DataFrame:
    """IVF coarse quantizer: deterministic centroid seeds (a fixed id range —
    at real scale this is a k-means fit persisted next to the index), every
    vector assigned to its max-dot-product cell. The assignment is a
    broadcast join against K centroids — O(N*K) embarrassingly parallel, no
    shuffle of the big side."""
    cents = e.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 100 + N_CELLS)
    ).select(
        (F.col("vec_id") - 100).cast("int").alias("cell"), F.col("emb").alias("cent")
    )
    scored = e.join(F.broadcast(cents)).select(
        "vec_id",
        "emb",
        "cell",
        F.round(_dot(F.col("emb"), F.col("cent")), 6).alias("aff"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("aff").desc(), F.col("cell").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "emb", "cell")
    )


def q_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell assignment + occupancy: the partitioned-index layout (cell →
    posting list) that turns ANN from O(Q*N) into O(Q*N*probe/K)."""
    e = _emb(spark, sf_dir)
    return (
        _cells(e)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.min("vec_id").alias("min_vec_id"))
    )


def q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed ANN: each query searches only its N_PROBE nearest cells'
    posting lists (exact cosine within), instead of the full corpus — the
    scale path validated against q_ann_topk's brute-force baseline. Join key
    = cell, so candidate generation is a bucket join, never N^2."""
    e = _emb(spark, sf_dir)
    assigned = _cells(e)
    cents = e.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 100 + N_CELLS)
    ).select(
        (F.col("vec_id") - 100).cast("int").alias("cell"), F.col("emb").alias("cent")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    qa = q.join(F.broadcast(cents)).select(
        "query_id",
        "qe",
        "cell",
        F.round(_dot(F.col("qe"), F.col("cent")), 6).alias("aff"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("aff").desc(), F.col("cell").asc())
    probes = (
        qa.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= N_PROBE)
        .select("query_id", "qe", "cell")
    )
    cand = (
        F.broadcast(probes)
        .join(assigned, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.round(
                _dot(F.col("qe"), F.col("emb"))
                / (_norm(F.col("qe")) * _norm(F.col("emb"))),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def q_label_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector stats: count + mean norm (rounded) — the grouped
    full-vector aggregation pattern (e.g. cluster quality monitoring)."""
    e = _emb(spark, sf_dir)
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            F.sum(F.round(_norm(F.col("emb")), 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_norm"),
    )


QUERIES = {
    "q_ann_topk": q_ann_topk,
    "q_lsh_buckets": q_lsh_buckets,
    "q_embedding_neardup": q_embedding_neardup,
    "q_label_centroid_stats": q_label_centroid_stats,
    "q_ivf_cells": q_ivf_cells,
    "q_ivf_ann_topk": q_ivf_ann_topk,
}

# DuckDB twins ---------------------------------------------------------------

_DOT = (
    "list_sum(list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _dot_sql(a, b):
    return _DOT.format(a=a, b=b)


def _norm_sql(a):
    return f"sqrt({_dot_sql(a, a)})"


_BUCKET_TERMS = []
for p in range(N_PLANES):
    w = "[" + ",".join(str(float(_plane_weight(i, p))) for i in range(64)) + "]"
    term = (
        f"CASE WHEN list_sum(list_transform(range(1, 65), "
        f"i -> CAST(embedding[i] AS DOUBLE) * ({w})[i])) > 0 THEN {1 << p} ELSE 0 END"
    )
    _BUCKET_TERMS.append(term)
_BUCKET_SQL = "CAST(" + " + ".join(_BUCKET_TERMS) + " AS INTEGER)"

ORACLES = {
    "q_ann_topk": f"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}),
        c AS (SELECT vec_id AS cand_id, embedding AS ce FROM embeddings),
        scored AS (
          SELECT query_id, cand_id,
                 round({_dot_sql("qe", "ce")} / ({_norm_sql("qe")} * {_norm_sql("ce")}), 6) AS cosine
          FROM q, c WHERE query_id <> cand_id
        )
        SELECT query_id, cand_id, cosine, rank FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS INTEGER) AS rank
          FROM scored
        ) WHERE rank <= {TOP_K}
    """,
    "q_lsh_buckets": f"""
        SELECT vec_id, label, {_BUCKET_SQL} AS bucket FROM embeddings
    """,
    "q_embedding_neardup": f"""
        WITH b AS (SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings),
        scored AS (
          SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
                 round({_dot_sql("a.embedding", "c.embedding")} / ({_norm_sql("a.embedding")} * {_norm_sql("c.embedding")}), 6) AS cosine
          FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
        )
        SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= 0.8
    """,
    "q_label_centroid_stats": f"""
        SELECT label, count(*) AS n_vecs,
               round(CAST(sum(CAST(round({_norm_sql("embedding")}, 6) AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_norm
        FROM embeddings GROUP BY label
    """,
    "q_ivf_cells": f"""
        WITH cents AS (
          SELECT CAST(vec_id - 100 AS INTEGER) AS cell, embedding AS cent
          FROM embeddings WHERE vec_id >= 100 AND vec_id < {100 + N_CELLS}
        ),
        assigned AS (
          SELECT vid AS vec_id, cell FROM (
            SELECT e.vec_id AS vid, c.cell,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY round({_dot_sql("e.embedding", "c.cent")}, 6) DESC, c.cell ASC
                   ) AS rn
            FROM embeddings e, cents c
          ) WHERE rn = 1
        )
        SELECT cell, count(*) AS n_vecs, min(vec_id) AS min_vec_id
        FROM assigned GROUP BY cell
    """,
    "q_ivf_ann_topk": f"""
        WITH cents AS (
          SELECT CAST(vec_id - 100 AS INTEGER) AS cell, embedding AS cent
          FROM embeddings WHERE vec_id >= 100 AND vec_id < {100 + N_CELLS}
        ),
        assigned AS (
          SELECT vid AS vec_id, cell FROM (
            SELECT e.vec_id AS vid, c.cell,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY round({_dot_sql("e.embedding", "c.cent")}, 6) DESC, c.cell ASC
                   ) AS rn
            FROM embeddings e, cents c
          ) WHERE rn = 1
        ),
        probes AS (
          SELECT qid AS query_id, cell FROM (
            SELECT q.vec_id AS qid, c.cell,
                   row_number() OVER (
                     PARTITION BY q.vec_id
                     ORDER BY round({_dot_sql("q.embedding", "c.cent")}, 6) DESC, c.cell ASC
                   ) AS rn
            FROM embeddings q, cents c WHERE q.vec_id < {N_QUERIES}
          ) WHERE rn <= {N_PROBE}
        ),
        cand AS (
          SELECT p.query_id, a.vec_id AS cand_id,
                 round({_dot_sql("qe.embedding", "ce.embedding")}
                       / ({_norm_sql("qe.embedding")} * {_norm_sql("ce.embedding")}), 6) AS cosine
          FROM probes p
          JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
          JOIN embeddings qe ON qe.vec_id = p.query_id
          JOIN embeddings ce ON ce.vec_id = a.vec_id
        )
        SELECT query_id, cand_id, cosine, rank FROM (
          SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC
          ) AS INTEGER) AS rank FROM cand
        ) WHERE rank <= {TOP_K}
    """,
}
