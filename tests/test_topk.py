"""Two-phase per-group top-K (operators/dedup.py:topk_per_group).

The operator's contract: exact, deterministic per-group top-K whose result is
independent of how input rows are placed across partitions — the phase-1
local prune must keep a superset of the true winners under ANY placement,
including the adversarial one where a group's true top-K all share a
partition and the hot group floods every partition.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark.operators.dedup import topk_per_group

K = 5


def _mk(spark):
    # one hot group (900 rows) + many small groups, deterministic scores
    rows = []
    for i in range(900):
        rows.append(("hot", i, (i * 37) % 1000))
    for g in range(30):
        for i in range(7):
            rows.append((f"g{g}", 10_000 + g * 100 + i, (i * 13 + g) % 50))
    return spark.createDataFrame(rows, "grp string, id long, score long")


def _reference(df):
    w = Window.partitionBy("grp").orderBy(F.col("score").desc(), F.col("id"))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .orderBy("grp", "rn")
        .collect()
    )


def test_matches_single_window_reference(spark):
    df = _mk(spark)
    got = (
        topk_per_group(df, ["grp"], [F.col("score").desc(), F.col("id")], K)
        .orderBy("grp", "rn")
        .collect()
    )
    assert got == _reference(df)


def test_partitioning_independent(spark):
    df = _mk(spark)
    expect = _reference(df)
    variants = [
        df.repartition(1),
        df.repartition(17),
        df.repartitionByRange(6, "id"),  # winners clustered together
        df.repartition(8, "grp"),  # whole groups on one partition
        df.sort(F.col("score").desc()),  # winners all in the first partitions
    ]
    for v in variants:
        got = (
            topk_per_group(v, ["grp"], [F.col("score").desc(), F.col("id")], K)
            .orderBy("grp", "rn")
            .collect()
        )
        assert got == expect


def test_group_smaller_than_k_kept_whole(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 3, 5)],
        "grp string, id long, score long",
    )
    got = topk_per_group(
        df, ["grp"], [F.col("score").desc(), F.col("id")], K
    ).collect()
    assert sorted((r.grp, r.id, r.rn) for r in got) == [
        ("a", 1, 2),
        ("a", 2, 1),
        ("b", 3, 1),
    ]
