"""Bucketed RANGE (interval-containment) JOIN — the second operator Spark's
join family lacks natively (SURVEY §2.3 extension, alongside the as-of join).

Semantics: each left ("point") row joins every interval row with
``lo <= point < hi`` (half-open, the standard windowing convention), under an
optional equi-key. Open-source Spark plans the naive inequality predicate as
a broadcast-nested-loop or a cartesian product — O(points x intervals) work
per key, the classic non-equi-join scale killer (Databricks ships a
proprietary range-join hint for exactly this reason).

Physical shape — the classic BUCKETED range join (Sedona's and Databricks'
strategy, composed here from public DataFrame ops):

1. pick a bucket width W; a point belongs to bucket ``floor(point / W)``;
2. EXPLODE each interval to every bucket it overlaps
   (``sequence(floor(lo/W), floor(hi/W))`` — O(interval span / W) copies);
3. equi-join on (key..., bucket) — a plain hash join, fully parallel;
4. re-apply the exact predicate ``lo <= point < hi`` to drop the
   false positives inside boundary buckets.

Each point lives in exactly ONE bucket, so every (point, interval) candidate
pair is tested exactly once — the join needs NO post-dedup, unlike designs
that bucket both sides by overlap. Cost: |points| + |intervals| x avg-span/W
shuffled rows and a hash join; W trades interval replication (small W)
against candidate false positives (large W) — set it near the median
interval length. Skew: a hot bucket (a popular value range) splits under AQE
skew-join handling; a small interval side broadcasts under AQE automatically,
which degrades gracefully to the same plan minus the shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANGE_BUCKET_COL = "__rj_bucket"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    on: Sequence[str] = (),
    bucket_width: float = 1.0,
) -> DataFrame:
    """Join each ``points`` row to every ``intervals`` row with
    ``lo <= point < hi`` (and equal ``on`` keys, if given). Output columns:
    all of ``points``'s then ``intervals``'s non-key columns. Intervals with
    ``hi <= lo`` are empty and match nothing. ``bucket_width`` must be > 0."""
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    overlap = (set(points.columns) & set(intervals.columns)) - set(on)
    if overlap:
        raise ValueError(
            f"non-key columns present on both sides: {sorted(overlap)}"
        )
    w = F.lit(float(bucket_width))
    pb = points.withColumn(
        RANGE_BUCKET_COL, F.floor(F.col(point_col) / w).cast("long")
    )
    ib = intervals.filter(F.col(lo_col) < F.col(hi_col)).withColumn(
        RANGE_BUCKET_COL,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    cond = [pb[c] == ib[c] for c in on] + [
        pb[RANGE_BUCKET_COL] == ib[RANGE_BUCKET_COL],
        ib[lo_col] <= pb[point_col],
        pb[point_col] < ib[hi_col],
    ]
    out_cols = [pb[c] for c in points.columns if c != RANGE_BUCKET_COL] + [
        ib[c]
        for c in intervals.columns
        if c not in set(on) and c != RANGE_BUCKET_COL
    ]
    return pb.join(ib, cond, "inner").select(*out_cols)
