"""Bucketed range join (operators/rangejoin.py:interval_join).

Contract: exactly the pairs with ``lo <= point < hi`` (and equal keys),
each emitted once, for ANY bucket width — the width is a performance knob,
never a correctness knob. Reference: the naive cross-join filter.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark.operators.rangejoin import interval_join


def _points(spark):
    # values straddle negatives, zero, boundaries and a far outlier
    vals = [-30.0, -12.5, 0.0, 1.0, 9.999, 10.0, 17.5, 25.0, 49.9, 200.0]
    rows = [
        (f"k{j}", i, v + j)  # shift per key so keys differ
        for j in range(3)
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "key string, pid int, val double")


def _intervals(spark):
    rows = [
        # (key, iid, lo, hi): overlapping, boundary-aligned, empty, negative,
        # one spanning dozens of buckets
        ("k0", 0, 0.0, 10.0),
        ("k0", 1, 10.0, 10.0),  # empty: hi <= lo
        ("k0", 2, 9.999, 10.001),
        ("k1", 3, -20.0, 2.0),
        ("k1", 4, 5.0, 300.0),  # spans many buckets
        ("k2", 5, 30.0, 20.0),  # empty: inverted
        ("k2", 6, -100.0, 100.0),
        ("k9", 7, 0.0, 50.0),  # key with no points
    ]
    return spark.createDataFrame(rows, "key string, iid int, lo double, hi double")


def _naive(points, intervals, on):
    cond = [points[c] == intervals[c] for c in on] + [
        intervals.lo <= points.val,
        points.val < intervals.hi,
    ]
    iv_cols = [c for c in intervals.columns if c not in set(on)]
    return (
        points.join(intervals, cond)
        .select(*[points[c] for c in points.columns], *[intervals[c] for c in iv_cols])
        .collect()
    )


@pytest.mark.parametrize("width", [0.5, 7.0, 25.0, 1000.0])
def test_matches_naive_any_width(spark, width):
    p, iv = _points(spark), _intervals(spark)
    expect = sorted(map(tuple, _naive(p, iv, ["key"])))
    got = sorted(
        map(
            tuple,
            interval_join(
                p, iv, "val", "lo", "hi", on=("key",), bucket_width=width
            ).collect(),
        )
    )
    assert got == expect
    # boundary semantics are actually exercised: lo inclusive, hi exclusive
    assert any(r[2] == r[4] for r in got), "no point sitting on a lo bound"
    assert not any(r[2] == r[5] for r in got), "a point matched its hi bound"


def test_keyless_join(spark):
    p = _points(spark).drop("key").distinct()
    iv = _intervals(spark).drop("key").filter(F.col("lo") < F.col("hi"))
    expect = sorted(map(tuple, _naive(p, iv, [])))
    got = sorted(
        map(
            tuple,
            interval_join(p, iv, "val", "lo", "hi", bucket_width=10.0).collect(),
        )
    )
    assert got == expect


def test_rejects_bad_width_and_column_overlap(spark):
    p, iv = _points(spark), _intervals(spark)
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(p, iv, "val", "lo", "hi", on=("key",), bucket_width=0)
    with pytest.raises(ValueError, match="both sides"):
        interval_join(
            p.withColumn("iid", F.lit(1)), iv, "val", "lo", "hi", on=("key",)
        )
