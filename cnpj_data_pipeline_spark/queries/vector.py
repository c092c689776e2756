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


def _bucket_col(emb_col, first_plane: int, n_planes: int):
    """Sign-LSH bucket id from ``n_planes`` integer hyperplanes starting at
    ``first_plane`` (disjoint plane ranges give independent hash families —
    the sub-split planes for hot buckets reuse this with first_plane=8)."""
    bucket = None
    for k in range(n_planes):
        p = first_plane + k
        w = F.array(*[F.lit(float(_plane_weight(i, p))) for i in range(64)])
        bit = F.when(_dot(emb_col, w) > 0, F.lit(1 << k)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def q_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketing: bucket = bits of sign(<v, h_p>) over N_PLANES
    integer hyperplanes. At scale, near-dup search joins within buckets only."""
    e = _emb(spark, sf_dir)
    return e.select(
        "vec_id", "label", _bucket_col(F.col("emb"), 0, N_PLANES).alias("bucket")
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


BUCKET_CAP = 20  # sub-split any base bucket holding more than this many vecs
N_SUB_PLANES = 8  # extra hyperplanes for the sub-split (disjoint family)
# The capped variant gates at a LOWER cosine so the correctness check compares
# non-empty value sets at test scale (the synthetic embeddings top out at
# ~0.47 intra-bucket cosine; a 0.8 gate would pass trivially on empty output).
CAPPED_T = 0.4


def q_embedding_neardup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-scale variant of q_embedding_neardup: HOT buckets are sub-split
    before the self-join (the DF_CAP idea from text.py applied to LSH
    buckets). With fixed-width buckets, bucket population grows linearly
    with corpus size and the intra-bucket self-join is quadratic — the
    scale-killer at 10^9 vectors. Here any bucket over ``BUCKET_CAP`` is
    re-hashed with ``N_SUB_PLANES`` additional hyperplanes (an independent
    sign family), shrinking expected sub-bucket size by 2^8 while cold
    buckets keep full recall.

    Recall semantics (honest lower bound, mirroring the DF-capped Jaccard):
    a near-dup pair inside a hot bucket survives only if the pair also
    agrees on all 8 sub-plane signs — high-cosine pairs usually do (that is
    the LSH property), but some hot-bucket pairs are missed by design.
    Cold-bucket pairs are exact."""
    e = _emb(spark, sf_dir)
    b = q_lsh_buckets(spark, sf_dir)
    sizes = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    # bucket occupancy is at most 2^N_PLANES rows — broadcast it
    eb = (
        e.join(b, "vec_id")
        .join(F.broadcast(sizes), "bucket")
        .select(
            "vec_id",
            "emb",
            # disjoint id spaces: cold buckets keep 0..255; a hot bucket B
            # fans out to 256*(B+1) + sub where sub in 0..255
            F.when(F.col("n") <= BUCKET_CAP, F.col("bucket"))
            .otherwise(
                (F.col("bucket") + 1) * (1 << N_SUB_PLANES)
                + _bucket_col(F.col("emb"), N_PLANES, N_SUB_PLANES)
            )
            .alias("bucket"),
        )
    )
    a, c = eb.alias("a"), eb.alias("c")
    pairs = a.join(
        c,
        (F.col("a.bucket") == F.col("c.bucket"))
        & (F.col("a.vec_id") < F.col("c.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("c.vec_id").alias("vec_b"),
        F.round(
            _dot(F.col("a.emb"), F.col("c.emb"))
            / (_norm(F.col("a.emb")) * _norm(F.col("c.emb"))),
            6,
        ).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= CAPPED_T)


N_CELLS = 8  # IVF coarse cells; centroid seeds are vec_id in [100, 108)
N_PROBE = 2  # cells probed per query


def _seed_cents(e: DataFrame) -> DataFrame:
    """Deterministic centroid seeds: a fixed vec_id range (the k-means++ of a
    reproducible sandbox — at real scale the fit is persisted next to the
    index; `_trained_cents` below runs the Lloyd update)."""
    return e.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 100 + N_CELLS)
    ).select(
        (F.col("vec_id") - 100).cast("int").alias("cell"), F.col("emb").alias("cent")
    )


def _cells(e: DataFrame) -> DataFrame:
    """IVF coarse quantizer: every vector assigned to its max-dot-product
    seed cell. The assignment is a broadcast join against K centroids —
    O(N*K) embarrassingly parallel, no shuffle of the big side."""
    return _assign_to(e, _seed_cents(e))


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


def _trained_cents(e: DataFrame, iters: int = 1) -> DataFrame:
    """``iters`` seeded Lloyd iterations, entirely as DataFrame
    aggregations: assign every vector to its nearest centroid (iteration 1
    starts from the SEED centroids — the fixed vec_id range,
    deterministic), then recompute each cell's centroid as the
    per-dimension mean of its members; repeat. Decimal-sum accumulation +
    6dp rounding keeps every iteration bit-identical across engines and
    partitionings (the same determinism discipline as
    q_label_centroid_stats), so k iterations are as oracle-checkable as
    one. Recall@k per iteration vs brute force is measured by
    ``tools/ivf_recall.py`` and recorded in BENCH.md.

    Shape at scale PER ITERATION: posexplode is a map-side flatMap (64
    rows per vector), the groupBy(cell, pos) hash-agg has map-side partial
    sums, and the output is K*64 rows — broadcastable; the reassignment is
    a broadcast-K join. No full-data shuffle beyond the one aggregation —
    the standard distributed k-means step, k times."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    assigned = _cells(e)
    cents = None
    for i in range(iters):
        dims = (
            assigned.select("cell", F.posexplode("emb").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(
                F.round(
                    F.sum(
                        F.round(F.col("v"), 6).cast("decimal(28,6)")
                    ).cast("double")
                    / F.count(F.lit(1)),
                    6,
                ).alias("m")
            )
        )
        cents = dims.groupBy("cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("cent")
        )
        if i + 1 < iters:
            # materialize the small codebook so the next assignment's
            # broadcast doesn't recompute the whole lineage per iteration
            cents = cents.localCheckpoint(eager=True)
            assigned = _assign_to(e, cents)
    return cents


def _assign_to(e: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-cell assignment against an arbitrary (small) centroid set:
    broadcast K centroids, score all vectors, keep the max-affinity cell."""
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


def q_ivf_train_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a TRAINED coarse quantizer: cell occupancy after reassigning
    every vector to the Lloyd-updated centroids. The trained codebook evens
    out cell populations vs the raw seeds (the posting-list balance that
    bounds probe cost at scale)."""
    e = _emb(spark, sf_dir)
    assigned = _assign_to(e, _trained_cents(e))
    return assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vecs"), F.min("vec_id").alias("min_vec_id")
    )


def _ivf_topk(e: DataFrame, cents: DataFrame) -> DataFrame:
    """IVF probe search against an arbitrary (small) codebook: queries
    probe their N_PROBE nearest cells' posting lists; exact cosine within.
    Shared by the trained query and the per-iteration recall measurement
    (tools/ivf_recall.py)."""
    assigned = _assign_to(e, cents)
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


def q_ivf_ann_topk_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed ANN over the TRAINED codebook (one Lloyd iteration — the
    oracle-pinned configuration; tools/ivf_recall.py measures recall@k for
    1-3 iterations against q_ann_topk's brute force, reported in
    BENCH.md)."""
    e = _emb(spark, sf_dir)
    return _ivf_topk(e, _trained_cents(e))


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


def q_ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL IVF index (plans/ivf.py) driven end-to-end: the embedding
    corpus is ingested as a 3-epoch CDC stream into a lake table — epoch 1
    inserts every vector, epoch 2 RE-EMBEDS the vec_id %% 9 == 4 slice (each
    takes its successor's embedding, so its nearest cell can change), epoch 3
    DELETES the vec_id %% 17 == 3 slice — and the IVFIndexJob tails the
    change feed to maintain the coarse-quantizer assignment table against the
    FROZEN seed codebook. Output = the final (vec_id, cell) assignment, which
    must equal the from-scratch assignment of the corpus' final state (the
    oracle derives that state in SQL and re-runs q_ivf_cells' nearest-cell
    window over it).

    Scale shape: per epoch only CHANGED vectors broadcast-join the K
    centroids (O(changed x K), the corpus is never re-scanned) plus one
    O(batch) LWW merge; the index declares sort_order=(cell,) so compactions
    cluster posting lists and probes skip files by manifest stats."""
    import os as _os

    import pyspark.sql.types as T

    from cnpj_data_pipeline_spark.lake.format import LakeTable
    from cnpj_data_pipeline_spark.operators.merge import apply_changes
    from cnpj_data_pipeline_spark.plans.ivf import IVFIndexJob
    from cnpj_data_pipeline_spark.queries.cdc import _mk_scratch

    e = _emb(spark, sf_dir).select("vec_id", "emb")
    cents = _seed_cents(_emb(spark, sf_dir)).select(
        "cell", F.col("cent")
    )
    off = int(e.agg(F.max("vec_id")).head()[0]) + 1

    root = _mk_scratch("ivf_idx_")
    base = LakeTable.create(
        _os.path.join(root, "emb"),
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("emb", T.ArrayType(T.DoubleType())),
            ]
        ),
        ["vec_id"],
        8,
    )
    apply_changes(
        spark,
        base,
        e.select(
            "vec_id", "emb", F.lit("U").alias("op"), F.col("vec_id").alias("lsn")
        ),
        epoch=1,
    )
    partner = e.select(
        (F.col("vec_id") - 1).alias("vec_id"), F.col("emb").alias("p_emb")
    )
    reembeds = (
        e.filter(F.col("vec_id") % 9 == 4)
        .join(partner, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("p_emb", "emb").alias("emb"),
            F.lit("U").alias("op"),
            (F.col("vec_id") + off).alias("lsn"),
        )
    )
    apply_changes(spark, base, reembeds, epoch=2)
    dels = e.filter(F.col("vec_id") % 17 == 3).select(
        "vec_id",
        F.lit(None).cast("array<double>").alias("emb"),
        F.lit("D").alias("op"),
        (F.col("vec_id") + 2 * off).alias("lsn"),
    )
    apply_changes(spark, base, dels, epoch=3)

    job = IVFIndexJob(base.root, _os.path.join(root, "idx"), cents, n_buckets=8)
    job.run_once(spark)
    return job.assignments(spark).orderBy("vec_id")


QUERIES = {
    "q_ann_topk": q_ann_topk,
    "q_ivf_index": q_ivf_index,
    "q_lsh_buckets": q_lsh_buckets,
    "q_embedding_neardup": q_embedding_neardup,
    "q_embedding_neardup_capped": q_embedding_neardup_capped,
    "q_label_centroid_stats": q_label_centroid_stats,
    "q_ivf_cells": q_ivf_cells,
    "q_ivf_ann_topk": q_ivf_ann_topk,
    "q_ivf_train_cells": q_ivf_train_cells,
    "q_ivf_ann_topk_trained": q_ivf_ann_topk_trained,
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


def _bucket_sql(first_plane: int, n_planes: int, emb: str = "embedding") -> str:
    terms = []
    for k in range(n_planes):
        p = first_plane + k
        w = "[" + ",".join(str(float(_plane_weight(i, p))) for i in range(64)) + "]"
        terms.append(
            f"CASE WHEN list_sum(list_transform(range(1, 65), "
            f"i -> CAST({emb}[i] AS DOUBLE) * ({w})[i])) > 0 THEN {1 << k} ELSE 0 END"
        )
    return "CAST(" + " + ".join(terms) + " AS INTEGER)"


_BUCKET_SQL = _bucket_sql(0, N_PLANES)

# shared SQL for the trained-IVF oracles: seed cents → seed assignment →
# per-dim decimal means (one Lloyd step) → trained cents → trained assignment
_TRAINED_CTES = f"""
        cents AS (
          SELECT CAST(vec_id - 100 AS INTEGER) AS cell, embedding AS cent
          FROM embeddings WHERE vec_id >= 100 AND vec_id < {100 + N_CELLS}
        ),
        assigned0 AS (
          SELECT vid AS vec_id, cell FROM (
            SELECT e.vec_id AS vid, c.cell,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY round({_dot_sql("e.embedding", "c.cent")}, 6) DESC, c.cell ASC
                   ) AS rn
            FROM embeddings e, cents c
          ) WHERE rn = 1
        ),
        dims AS (
          SELECT a.cell, t.i AS pos,
                 round(CAST(sum(CAST(round(CAST(e.embedding[t.i] AS DOUBLE), 6)
                                     AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6) AS m
          FROM assigned0 a
          JOIN embeddings e ON e.vec_id = a.vec_id
          CROSS JOIN range(1, 65) t(i)
          GROUP BY a.cell, t.i
        ),
        tcents AS (
          SELECT cell, list(m ORDER BY pos) AS cent FROM dims GROUP BY cell
        ),
        assigned AS (
          SELECT vid AS vec_id, cell FROM (
            SELECT e.vec_id AS vid, c.cell,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY round({_dot_sql("e.embedding", "c.cent")}, 6) DESC, c.cell ASC
                   ) AS rn
            FROM embeddings e, tcents c
          ) WHERE rn = 1
        )
"""

ORACLES = {
    # q_ivf_index: derive the corpus' FINAL state in SQL (the same
    # deterministic re-embed/delete slices the query streams through the
    # lake), then re-run the nearest-cell assignment window over it — what
    # the incrementally-maintained index table must equal.
    "q_ivf_index": f"""
        WITH cents AS (
          SELECT CAST(vec_id - 100 AS INTEGER) AS cell, embedding AS cent
          FROM embeddings WHERE vec_id >= 100 AND vec_id < {100 + N_CELLS}
        ),
        fin AS (
          SELECT e.vec_id,
                 CASE WHEN e.vec_id % 9 = 4
                      THEN coalesce(p.embedding, e.embedding)
                      ELSE e.embedding END AS embedding
          FROM embeddings e
          LEFT JOIN embeddings p ON p.vec_id = e.vec_id + 1
          WHERE e.vec_id % 17 <> 3
        )
        SELECT vid AS vec_id, cell FROM (
          SELECT f.vec_id AS vid, c.cell,
                 row_number() OVER (
                   PARTITION BY f.vec_id
                   ORDER BY round({_dot_sql("f.embedding", "c.cent")}, 6) DESC, c.cell ASC
                 ) AS rn
          FROM fin f, cents c
        ) WHERE rn = 1 ORDER BY vec_id
    """,
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
    "q_embedding_neardup_capped": f"""
        WITH b AS (SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings),
        sizes AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket),
        eb AS (
          SELECT b.vec_id, b.embedding,
                 CASE WHEN s.n <= {BUCKET_CAP} THEN b.bucket
                      ELSE (b.bucket + 1) * {1 << N_SUB_PLANES}
                           + {_bucket_sql(N_PLANES, N_SUB_PLANES, "b.embedding")}
                 END AS bucket
          FROM b JOIN sizes s ON b.bucket = s.bucket
        ),
        scored AS (
          SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
                 round({_dot_sql("a.embedding", "c.embedding")} / ({_norm_sql("a.embedding")} * {_norm_sql("c.embedding")}), 6) AS cosine
          FROM eb a JOIN eb c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
        )
        SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= {CAPPED_T}
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
    "q_ivf_train_cells": f"""
        WITH {_TRAINED_CTES.strip()}
        SELECT cell, count(*) AS n_vecs, min(vec_id) AS min_vec_id
        FROM assigned GROUP BY cell
    """,
    "q_ivf_ann_topk_trained": f"""
        WITH {_TRAINED_CTES.strip()},
        probes AS (
          SELECT qid AS query_id, cell FROM (
            SELECT q.vec_id AS qid, c.cell,
                   row_number() OVER (
                     PARTITION BY q.vec_id
                     ORDER BY round({_dot_sql("q.embedding", "c.cent")}, 6) DESC, c.cell ASC
                   ) AS rn
            FROM embeddings q, tcents c WHERE q.vec_id < {N_QUERIES}
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
