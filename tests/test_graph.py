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


def test_random_graphs_match_union_find(spark):
    """Star contraction vs a driver-side union-find oracle on random graphs
    (seeded — deterministic across runs)."""
    import random

    for seed in range(6):
        rng = random.Random(seed)
        n = rng.randint(2, 40)
        m = rng.randint(0, 60)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical min-label per component
        want = {}
        for v in range(n):
            r = find(v)
            want.setdefault(r, []).append(v)
        expect = {v: min(vs) for r, vs in want.items() for v in vs}

        edf = spark.createDataFrame(
            edges or [(0, 0)], "src int, dst int"
        )
        ndf = spark.createDataFrame([(v,) for v in range(n)], ["node"])
        got = {
            r["node"]: r["component"]
            for r in connected_components(edf, nodes=ndf).collect()
        }
        assert got == expect, f"seed={seed} n={n} m={m}"


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


def test_corpus_filter_funnel_invariants(spark):
    """Monotone attrition per language, and n_final counts one survivor per
    near-dup cluster present after the first two stages."""
    from cnpj_data_pipeline_spark.queries.text import q_corpus_filter

    rows = q_corpus_filter(spark, SF_DIR).collect()
    assert rows
    tot = {"n_raw": 0, "n_quality": 0, "n_exact": 0, "n_final": 0}
    for r in rows:
        assert r["n_raw"] >= r["n_quality"] >= r["n_exact"] >= r["n_final"] >= 0
        for k in tot:
            tot[k] += r[k]
    assert tot["n_raw"] == 500
    assert 0 < tot["n_final"] < tot["n_raw"]


def test_exact_dedup_stage_with_real_duplicates(spark, tmp_path):
    """The synthetic corpus has no byte-identical docs, so drive the exact
    stage's semantics on a fixture that does: duplicate texts collapse to
    the min doc_id within the quality-gated set."""
    from pyspark.sql import functions as SF

    d = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta")],
        ["doc_id", "text"],
    )
    keep = (
        d.select("doc_id", SF.md5(SF.lower(SF.trim("text"))).alias("fp"))
        .groupBy("fp")
        .agg(SF.min("doc_id").alias("doc_id"))
    )
    assert sorted(r["doc_id"] for r in keep.collect()) == [1, 3]
