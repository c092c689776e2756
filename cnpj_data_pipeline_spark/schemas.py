"""Canonical schemas for the transcript lake and its change envelope.

Target table shape comes from BASELINE.json ``input_hint``::

    transcripts(conv_id string, turn_idx int, role string, text string,
                tool string, ts timestamp)   key = (conv_id, turn_idx)

The change envelope adds ``op`` ('I'|'U'|'D') and ``lsn`` (monotone offset),
mirroring the reference's change-batch semantics: each monthly CSV file part is a
change batch applied by keyed upsert (``src/database/postgres.py:198-230``), with
the ``batch_row_num SERIAL`` arrival order standing in for an LSN
(``src/database/postgres.py:471-474``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import types as T

KEY_COLS = ("conv_id", "turn_idx")

TRANSCRIPT_FIELDS = [
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
]

TRANSCRIPT_SCHEMA = T.StructType(TRANSCRIPT_FIELDS)

CHANGE_SCHEMA = T.StructType(
    TRANSCRIPT_FIELDS
    + [
        T.StructField("op", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("epoch", T.IntegerType(), False),
    ]
)

# Lineage row shape (FIXTURES.md F4) — materialized from snapshot metadata.
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("snapshot_id", T.LongType(), False),
        T.StructField("parent_id", T.LongType(), True),
        T.StructField("epoch", T.IntegerType(), True),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("max_lsn", T.LongType(), True),
        T.StructField("op", T.StringType(), False),
        T.StructField("rows_applied", T.LongType(), False),
        T.StructField("committed_at", T.TimestampType(), False),
    ]
)


def schema_to_json(schema: T.StructType) -> str:
    return schema.json()


def schema_from_json(s: str) -> T.StructType:
    return T.StructType.fromJson(__import__("json").loads(s))


def union_schema(
    base: T.StructType,
    other: T.StructType,
    frozen: "Sequence[str] | set[str]" = (),
    dropped: "Sequence[str] | set[str]" = (),
) -> T.StructType:
    """Additive + widening schema union. Base columns keep their position;
    new columns from ``other`` are appended (nullable); a numeric column
    arriving STRICTLY WIDER (int→long, float→double — an upstream ALTER
    COLUMN) widens the table's declared type in place. Downcasting never
    happens: a batch narrower than the table casts UP on align, and before
    widening existed a genuinely-widened batch was cast DOWN — a silent
    wraparound for values past the narrow range. Parquet state files written
    under the old narrow type stay valid: Spark's parquet reader upcasts
    int32→int64 / float→double natively (probed on pyspark 4.1), and the
    Arrow kernels normalize per file (``operators.copart._normalize_to``).

    ``frozen`` columns never widen — the apply paths pass the key columns,
    whose type is part of the bucket-hash contract (xxhash64 is
    type-sensitive): a drifted key batch casts down to the table's type as
    before, it does not evolve the table.

    ``dropped`` names never (re-)enter the schema: a column removed by
    ``LakeTable.drop_column`` stays out even when a stale producer keeps
    sending it — old data files still physically carry the column, so
    re-adding the name would silently resurface pre-drop values. A new
    column must take a new name.

    Other type conflicts are rejected — the engine supports additive +
    widening evolution only, mirroring the reference's tolerance of extra
    trailing CSV columns (``column_{i}``, src/processor.py:518)."""
    by_name = {f.name: f for f in base.fields}
    out = list(base.fields)
    frozen = set(frozen)
    dropped = set(dropped)
    # family rank orders: widest type wins within a family
    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    fractional = (T.FloatType, T.DoubleType)

    def _wider(a: T.DataType, b: T.DataType, family) -> T.DataType:
        ra = next(i for i, t in enumerate(family) if isinstance(a, t))
        rb = next(i for i, t in enumerate(family) if isinstance(b, t))
        return a if ra >= rb else b

    for f in other.fields:
        cur = by_name.get(f.name)
        if isinstance(f.dataType, T.NullType):
            # an all-NULL batch column carries no type evidence: existing
            # columns keep their type; a brand-new column waits for the first
            # typed value before it can evolve the schema.
            continue
        if cur is None:
            if f.name in dropped:
                continue  # tombstoned name: ignore, never re-add
            out.append(T.StructField(f.name, f.dataType, True))
        elif cur.dataType != f.dataType:
            both_integral = isinstance(cur.dataType, integral) and isinstance(
                f.dataType, integral
            )
            both_fractional = isinstance(cur.dataType, fractional) and isinstance(
                f.dataType, fractional
            )
            ts_types = (T.TimestampType, T.TimestampNTZType)
            both_ts = isinstance(cur.dataType, ts_types) and isinstance(
                f.dataType, ts_types
            )
            if (both_integral or both_fractional) and f.name not in frozen:
                family = integral if both_integral else fractional
                wide = _wider(cur.dataType, f.dataType, family)
                if wide != cur.dataType:
                    i = next(
                        j for j, g in enumerate(out) if g.name == f.name
                    )
                    out[i] = T.StructField(f.name, wide, out[i].nullable)
            elif not (both_ts or both_integral or both_fractional):
                # tz-variant timestamps and frozen/numeric drift: the
                # table's declared type stays authoritative (the batch is
                # cast on align); anything else is a non-additive change
                raise ValueError(
                    f"non-additive schema change for column {f.name!r}: "
                    f"{cur.dataType} -> {f.dataType}"
                )
    return T.StructType(out)
