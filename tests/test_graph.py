"""Connected-components operator (operators/graph.py) + the near-dup
clustering queries built on it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark.operators.graph import (
    ConvergenceError,
    connected_components,
)

SF_DIR = "/root/testdata/sf0.001"


def _assign(spark, edge_rows, node_rows=None, **kw):
    edges = spark.createDataFrame(edge_rows, ["src", "dst"])
    nodes = (
        spark.createDataFrame([(n,) for n in node_rows], ["node"])
        if node_rows is not None
        else None
    )
    out = connected_components(edges, nodes=nodes, **kw)
    return {r["node"]: r["component"] for r in out.collect()}


def test_chain_two_components_singleton(spark):
    got = _assign(
        spark,
        [("b", "a"), ("b", "c"), ("x", "y")],
        node_rows=["a", "b", "c", "x", "y", "z"],
    )
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "z"}


def test_duplicate_reversed_and_self_edges_ignored(spark):
    got = _assign(spark, [("a", "b"), ("b", "a"), ("a", "b"), ("c", "c")])
    # self-loop-only node c still appears (it is a member of an edge row)
    assert got["a"] == "a" and got["b"] == "a"


def test_long_chain_converges_in_log_rounds(spark):
    # a 64-node path needs ~log2(64) star rounds, not 64 propagation steps
    ids = [f"n{i:03d}" for i in range(64)]
    edges = [(ids[i], ids[i + 1]) for i in range(63)]
    got = _assign(spark, edges, max_rounds=10)
    assert set(got.values()) == {"n000"}
    assert len(got) == 64


def test_numeric_ids_use_numeric_order(spark):
    # regression: lexicographic min("134","87") = "134"; numeric min = 87
    edges = spark.createDataFrame([(134, 87), (87, 9)], ["src", "dst"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {9: 9, 87: 9, 134: 9}


def test_empty_edges_all_singletons(spark):
    edges = spark.createDataFrame([], "src string, dst string")
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            edges, nodes=spark.createDataFrame([("a",), ("b",)], ["node"])
        ).collect()
    }
    assert got == {"a": "a", "b": "b"}


def test_max_rounds_exceeded_raises(spark):
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ConvergenceError):
        connected_components(edges, max_rounds=0)


def test_neardup_clusters_consistent_with_pairs(spark):
    from cnpj_data_pipeline_spark.queries.text import (
        q_neardup_canonical,
        q_neardup_clusters,
        q_ngram_jaccard_pairs,
    )

    clusters = q_neardup_clusters(spark, SF_DIR)
    label = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    pairs = q_ngram_jaccard_pairs(spark, SF_DIR).collect()
    assert pairs, "fixture should contain near-dup pairs"
    # every pair must land in one cluster, labeled by a component member min
    for p in pairs:
        assert label[p["doc_a"]] == label[p["doc_b"]]
        assert label[p["doc_a"]] <= min(p["doc_a"], p["doc_b"])

    canon = q_neardup_canonical(spark, SF_DIR)
    kept = canon.filter("keep")
    # exactly one survivor per cluster, and it is a member of its cluster
    assert kept.count() == clusters.select("cluster_id").distinct().count()
    bad = canon.groupBy("cluster_id").agg(
        F.sum(F.col("keep").cast("int")).alias("n")
    ).filter("n != 1")
    assert bad.count() == 0
