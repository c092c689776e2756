"""Z-order clustering (``set_sort_order(cols, kind="zorder")``): the map
rewrite interleaves 2-4 columns' rank bits into a Morton code per row, so a
range predicate on ANY declared column finds tight row-group stats — where
a lexical sort clusters only its first column. Logical state is never
affected (physical layout property).

Reference analogue: none (Postgres heap tables, init-db/postgres.sql)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pyspark.sql.types as T
import pytest

from cnpj_data_pipeline_spark import EngineConfig, LakeTable
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.operators.zorder import (
    rank_bins,
    sort_indices_zorder,
    zvalues,
)

KEY = ["conv_id", "turn_idx"]
CFG = EngineConfig(n_buckets=2, salt_factor=1, compact_threshold=None)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("x", T.LongType(), True),
        T.StructField("y", T.LongType(), True),
    ]
)


def test_zvalue_unit_properties():
    # single column: z order == rank order
    x = np.array([30, 10, 20, 40])
    assert list(np.argsort(zvalues([x]))) == list(np.argsort(x))
    # two columns: the four corner cells of the 2x2 grid follow the
    # Z curve: (lo,lo) < (hi,lo) < (lo,hi) < (hi,hi)
    lo, hi = 0, 1_000_000
    x = np.array([lo, hi, lo, hi])
    y = np.array([lo, lo, hi, hi])
    z = zvalues([x, y])
    assert list(np.argsort(z)) == [0, 1, 2, 3]
    # nulls rank first, deterministically
    o = np.array([None, "b", "a"], dtype=object)
    assert list(rank_bins(o)).index(0) == 0
    # cap at 4 columns
    with pytest.raises(ValueError):
        zvalues([x] * 5)


def _ingest(spark, t, n=60_000):
    """x and y pseudo-random and INDEPENDENT: a lexical sort on (x, y)
    leaves y scattered; z-order clusters both."""
    rows = pd.DataFrame(
        {
            "conv_id": [f"c{i:06d}" for i in range(n)],
            "turn_idx": np.zeros(n, dtype=np.int32),
            "x": (np.arange(n, dtype=np.int64) * 2654435761) % 1_000_003,
            "y": (np.arange(n, dtype=np.int64) * 40503) % 999_983,
            "op": ["I"] * n,
            "lsn": np.arange(n, dtype=np.int64),
        }
    )
    sch = T.StructType(
        list(SCHEMA.fields)
        + [
            T.StructField("op", T.StringType(), False),
            T.StructField("lsn", T.LongType(), False),
        ]
    )
    apply_changes(spark, t, spark.createDataFrame(rows, sch), epoch=0, cfg=CFG)
    return rows


def _rowgroup_span_fraction(t, col):
    """Mean over row groups of (group's min/max span / file's full span) —
    1.0 means every group covers the whole range (nothing prunable)."""
    fracs = []
    snap = t.snapshot()
    for _b, info in snap["buckets"].items():
        for rel in info["files"]:
            md = pq.ParquetFile(os.path.join(t.root, rel)).metadata
            idx = next(
                i
                for i in range(md.row_group(0).num_columns)
                if md.row_group(0).column(i).path_in_schema == col
            )
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            span = max(maxs) - min(mins)
            if md.num_row_groups < 4 or span == 0:
                continue  # not enough groups to say anything
            fracs.extend((hi - lo) / span for lo, hi in zip(mins, maxs))
    assert fracs, "expected multi-row-group files"
    return float(np.mean(fracs))


def test_zorder_clusters_both_columns_state_unchanged(
    spark, tmp_table, monkeypatch
):
    # small row groups so a 30k-row bucket has ~16 of them (the env var is
    # captured driver-side when compact() builds the task closure)
    monkeypatch.setenv("SPARK_GRAFT_REWRITE_ROWGROUP_BYTES", str(64 << 10))
    t = LakeTable.create(tmp_table, SCHEMA, KEY, CFG.n_buckets)
    _ingest(spark, t)
    golden = (
        t.read(spark).orderBy(*KEY).toPandas().reset_index(drop=True)
    )

    # lexical on (x, y): x clusters, y stays scattered
    t.set_sort_order(["x", "y"])
    t.compact(spark, buckets=range(CFG.n_buckets))
    assert _rowgroup_span_fraction(t, "x") < 0.2
    assert _rowgroup_span_fraction(t, "y") > 0.8

    # zorder on (x, y): BOTH cluster
    t.set_sort_order(["x", "y"], kind="zorder")
    assert t._sort_kind_of(t.snapshot()) == "zorder"
    t.compact(spark, buckets=range(CFG.n_buckets))
    fx, fy = (
        _rowgroup_span_fraction(t, "x"),
        _rowgroup_span_fraction(t, "y"),
    )
    assert fx < 0.5 and fy < 0.5, (fx, fy)

    got = t.read(spark).orderBy(*KEY).toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, golden, check_dtype=False)

    # range predicates on either column still return exact results
    import pyspark.sql.functions as F

    exp = golden[(golden.y >= 100_000) & (golden.y <= 150_000)]
    assert t.read_range(spark, "y", 100_000, 150_000).count() == len(exp)


def test_zorder_validation(spark, tmp_table):
    t = LakeTable.create(tmp_table, SCHEMA, KEY, CFG.n_buckets)
    with pytest.raises(ValueError, match="2-4 columns"):
        t.set_sort_order(["x"], kind="zorder")
    with pytest.raises(ValueError, match="unknown sort_order kind"):
        t.set_sort_order(["x", "y"], kind="hilbert")


def test_zorder_deterministic_layout(spark, tmp_table):
    """Two compactions of identical state write identical row orders (the
    key tiebreak makes the z sort total)."""
    t = LakeTable.create(tmp_table, SCHEMA, KEY, CFG.n_buckets)
    _ingest(spark, t, n=5_000)
    t.set_sort_order(["x", "y"], kind="zorder")
    t.compact(spark, buckets=range(CFG.n_buckets))

    def _file_rows():
        snap = t.snapshot()
        out = {}
        for b, info in snap["buckets"].items():
            for rel in info["files"]:
                out[b] = pq.read_table(
                    os.path.join(t.root, rel), columns=["conv_id"]
                ).column("conv_id").to_pylist()
        return out

    first = _file_rows()
    t.compact(spark, buckets=range(CFG.n_buckets))
    assert _file_rows() == first


def test_ranks_nan_strictly_above_infinity():
    """Spark's total order ranks NaN above +Infinity; mapping NaN to +inf
    would TIE them and let stable order pick the wrong winner on a
    duplicate-LSN tie. nan_greatest must rank NaN STRICTLY above inf (and
    the layout default strictly below -inf)."""
    import numpy as np

    from cnpj_data_pipeline_spark.operators.zorder import ranks_of

    col = np.array([np.inf, np.nan, 1.0, -np.inf, np.nan])
    rg = ranks_of(col, nan_greatest=True)
    # both NaNs rank above inf; inf above finite; stable among equals
    assert rg[1] > rg[0] and rg[4] > rg[0] and rg[1] < rg[4]
    assert rg[0] > rg[2] > rg[3]
    rl = ranks_of(col)
    # layout default: NaN first (below -inf), stable
    assert rl[1] < rl[3] and rl[4] < rl[3] and rl[1] < rl[4]
    assert rl[3] < rl[2] < rl[0]
