"""Connected components over a pair graph — the clustering step a near-dup
pipeline runs AFTER pair generation (MinHash/SimHash/Jaccard emit *pairs*;
dedup needs *groups*: transitively, if A~B and B~C then {A,B,C} is one
duplicate cluster and one representative survives).

Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) expressed as pure DataFrame
rounds — each round is one groupBy (per-node min) plus one join, both on the
node key, so every round is a single hash-partitioned shuffle that Catalyst
plans with map-side partial mins. Converges in O(log n) rounds (the paper's
bound) versus O(graph diameter) for naive label propagation — on a 10^10-node
web corpus a duplicate *chain* (A~B~C~...) would make propagation unbounded,
while star-contraction stays logarithmic regardless of shape.

Scale notes (100 TB framing):
  * State per round is the edge set itself — no driver-side structures; the
    only driver action per round is the convergence fingerprint (count +
    sum-of-hashes, two scalars).
  * ``localCheckpoint`` truncates plan lineage each round: without it the
    iteration re-plans an ever-deeper DAG and round k replays rounds 1..k-1.
  * Skew: a giant component contracts onto its min node; the groupBy's
    map-side combine bounds the hot key's shuffle volume at one row per map
    task (it is a MIN aggregate), which is exactly the skew shape AQE +
    partial aggregation handle — no salting needed for an agg-only hot key.

No counterpart in the reference (its dedup is single-key SQL `ON CONFLICT`,
src/database/postgres.py:225); this is the training-data-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


class ConvergenceError(RuntimeError):
    """Star-contraction failed to reach a fixpoint within max_rounds."""


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    """Order-independent digest of an edge set: (count, sum of row hashes).
    One action, two scalars back to the driver. The sum accumulates in
    decimal(38,0) — a long would overflow (ANSI mode) after a handful of
    2^63-scale hashes."""
    row = edges.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_rounds: int = 25,
) -> DataFrame:
    """Return ``(node, component)`` where ``component`` is the minimum node
    id in each connected component (deterministic canonical label).

    ``edges`` needs columns ``src``/``dst`` (same orderable type, e.g. the
    doc_id string); direction and duplicates are ignored. ``nodes`` (optional,
    column ``node``) adds isolated vertices, which come back as their own
    singleton components — pass the full corpus id set so the output is a
    total assignment, not just the nodes that had a duplicate pair.
    """
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = _fingerprint(e)
    for _ in range(max_rounds):
        if prev[0] == 0:
            break  # edgeless graph: everything is a singleton

        # -- large-star: for each u, attach strictly-larger neighbors to
        #    m(u) = min(N(u) ∪ {u}); keeps the graph connected while
        #    pointing "big" nodes at the current local minimum.
        nbr = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        m = nbr.groupBy("src").agg(F.min("dst").alias("mn"))
        m = m.select("src", F.least("mn", "src").alias("mn"))
        e = (
            nbr.where(F.col("dst") > F.col("src"))
            .join(m, "src")
            .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )

        # -- small-star: orient each edge large→small, then attach each
        #    node's smaller neighbors (and itself) to their minimum.
        d = e.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        ).distinct()
        m2 = d.groupBy("src").agg(F.min("dst").alias("mn"))
        e = (
            d.join(m2, "src")
            .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
            .unionByName(m2.select(F.col("src"), F.col("mn").alias("dst")))
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)  # truncate lineage every round
        )

        cur = _fingerprint(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise ConvergenceError(
            f"connected_components: no fixpoint after {max_rounds} rounds "
            f"(edges={prev[0]}) — raise max_rounds (O(log n) expected)"
        )

    # At the fixpoint the edge set IS the assignment for non-root nodes:
    # (node, component_min). Roots and isolated nodes map to themselves.
    assign = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    members = assign.select("node").unionByName(
        assign.select(F.col("component").alias("node"))
    )
    if nodes is not None:
        members = members.unionByName(nodes.select("node"))
    members = members.distinct()
    return members.join(assign, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )
