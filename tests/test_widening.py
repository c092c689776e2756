"""Type-widening schema evolution: an upstream ALTER COLUMN that widens a
numeric payload column (int→long, float→double) evolves the table's declared
type instead of downcasting the batch — pre-widening behavior cast the batch
down, silently wrapping values past the narrow range. Parquet state files
written under the old narrow type stay readable (Spark upcasts natively; the
Arrow kernels normalize per file). Key columns never widen: their type is
part of the bucket-hash contract (xxhash64 is type-sensitive).

Reference analogue: none — the reference recreates Postgres tables from
fixed DDL (init-db/postgres.sql); upstream type drift is out of its scope."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.types as T
import pytest

from cnpj_data_pipeline_spark import EngineConfig, IngestJob, LakeTable
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.sources import change_stream as cs

KEY = ["conv_id", "turn_idx"]
CFG = EngineConfig(n_buckets=4, salt_factor=1, compact_threshold=None)

NARROW = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("count", T.IntegerType(), True),
        T.StructField("score", T.FloatType(), True),
    ]
)

BIG = 5_000_000_000  # > int32 range: the value downcasting would destroy


def _batch(spark, rows, count_t="int", score_t="float"):
    sch = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField(
                "count",
                T.LongType() if count_t == "long" else T.IntegerType(),
                True,
            ),
            T.StructField(
                "score",
                T.DoubleType() if score_t == "double" else T.FloatType(),
                True,
            ),
            T.StructField("op", T.StringType(), False),
            T.StructField("lsn", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(rows, sch)


def test_payload_widening_evolves_table(spark, tmp_table):
    t = LakeTable.create(tmp_table, NARROW, KEY, CFG.n_buckets)
    apply_changes(
        spark, t,
        _batch(spark, [("c1", 0, 7, 1.5, "I", 1), ("c2", 0, 9, 2.5, "I", 2)]),
        epoch=0, cfg=CFG,
    )
    # epoch 1 arrives WIDENED, with a value int32 cannot hold
    apply_changes(
        spark, t,
        _batch(
            spark,
            [("c1", 0, BIG, 3.25, "U", 3), ("c3", 0, 11, 4.0, "I", 4)],
            count_t="long", score_t="double",
        ),
        epoch=1, cfg=CFG,
    )
    assert isinstance(t.schema()["count"].dataType, T.LongType)
    assert isinstance(t.schema()["score"].dataType, T.DoubleType)
    assert t.snapshot()["op"] == "evolve"

    got = {
        r["conv_id"]: (r["count"], r["score"])
        for r in t.read(spark).collect()
    }
    assert got == {"c1": (BIG, 3.25), "c2": (9, 2.5), "c3": (11, 4.0)}

    # mixed narrow/wide generations fold in the Arrow compaction kernel too
    t.compact(spark)
    got2 = {
        r["conv_id"]: (r["count"], r["score"])
        for r in t.read(spark).collect()
    }
    assert got2 == got


def test_drifted_key_batch_casts_down_without_evolving(spark, tmp_table):
    """A producer whose pandas inferred long for the int32 key column: the
    batch applies cast to the table's key type (pre-widening semantics) and
    the schema does NOT evolve — the bucket-hash contract is frozen."""
    t = LakeTable.create(tmp_table, NARROW, KEY, CFG.n_buckets)
    sch = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.LongType(), False),  # drifted
            T.StructField("count", T.IntegerType(), True),
            T.StructField("score", T.FloatType(), True),
            T.StructField("op", T.StringType(), False),
            T.StructField("lsn", T.LongType(), False),
        ]
    )
    apply_changes(
        spark, t,
        spark.createDataFrame([("c1", 3, 7, 1.5, "I", 1)], sch),
        epoch=0, cfg=CFG,
    )
    assert isinstance(t.schema()["turn_idx"].dataType, T.IntegerType)
    assert t.snapshot()["op"] != "evolve"
    keys = spark.createDataFrame([("c1", 3)], "conv_id string, turn_idx int")
    assert t.read_keys(spark, keys).count() == 1


def test_non_widenable_change_rejected(spark, tmp_table):
    t = LakeTable.create(tmp_table, NARROW, KEY, CFG.n_buckets)
    sch = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("count", T.StringType(), True),  # int -> string
            T.StructField("op", T.StringType(), False),
            T.StructField("lsn", T.LongType(), False),
        ]
    )
    with pytest.raises(ValueError, match="non-additive"):
        apply_changes(
            spark, t,
            spark.createDataFrame([("c1", 0, "oops", "I", 1)], sch),
            epoch=0, cfg=CFG,
        )


def test_widening_through_copart_wal(spark, tmp_path):
    """Bucket-aligned WAL whose later epoch widened a payload column: the
    map-only path unions per-epoch footers, widens the target schema, and
    normalizes the narrow epoch's files per file."""
    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    t = LakeTable.create(lake, NARROW, KEY, CFG.n_buckets)
    e0 = _batch(
        spark, [("c1", 0, 7, 1.5, "I", 1), ("c2", 0, 9, 2.5, "I", 2)]
    )
    e1 = _batch(
        spark,
        [("c1", 0, BIG, 3.25, "U", 3)],
        count_t="long", score_t="double",
    )
    cs.write_epoch_bucketed(e0, wal, 0, KEY, CFG.n_buckets)
    cs.write_epoch_bucketed(e1, wal, 1, KEY, CFG.n_buckets)
    m = IngestJob(lake, CFG).run_stream(spark, wal)
    assert all(x.get("copartitioned") for x in m)
    assert isinstance(t.schema()["count"].dataType, T.LongType)
    got = {
        r["conv_id"]: (r["count"], r["score"])
        for r in t.read(spark).collect()
    }
    assert got == {"c1": (BIG, 3.25), "c2": (9, 2.5)}
