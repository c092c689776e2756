"""AS-OF join operator: inclusive backward semantics, NULL before first dim,
NULL payload fields carried as revisions."""

from __future__ import annotations

import pytest

from cnpj_data_pipeline_spark.operators.asof import asof_join


def test_asof_backward_inclusive(spark):
    facts = spark.createDataFrame(
        [("a", 5), ("a", 10), ("a", 15), ("b", 7), ("c", 1)],
        "k string, lsn long",
    )
    dims = spark.createDataFrame(
        [("a", 10, "t10"), ("a", 3, "t3"), ("b", 9, "t9"), ("b", 2, None)],
        "k string, lsn long, title string",
    )
    got = {
        (r.k, r.lsn): r.title_asof
        for r in asof_join(facts, dims, ["k"], "lsn", ["title"]).collect()
    }
    assert got == {
        ("a", 5): "t3",     # latest dim <= 5
        ("a", 10): "t10",   # equal order matches (inclusive)
        ("a", 15): "t10",
        ("b", 7): None,     # dim at lsn=2 has NULL payload — still a revision
        ("c", 1): None,     # no dim at all for this key
    }


def test_asof_rejects_column_collision(spark):
    facts = spark.createDataFrame([("a", 1, "x")], "k string, lsn long, title string")
    dims = spark.createDataFrame([("a", 1, "y")], "k string, lsn long, title string")
    with pytest.raises(ValueError, match="collide"):
        asof_join(facts, dims, ["k"], "lsn", ["title"])
