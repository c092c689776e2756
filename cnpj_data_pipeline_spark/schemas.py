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


def union_schema(base: T.StructType, other: T.StructType) -> T.StructType:
    """Additive schema union: base columns keep their position/type; new columns
    from ``other`` are appended (nullable). Type conflicts are rejected — the
    engine supports *additive* evolution only, the declared scope of the north
    rule (new tool/metadata columns), mirroring the reference's tolerance of
    extra trailing CSV columns (``column_{i}``, src/processor.py:518)."""
    by_name = {f.name: f for f in base.fields}
    out = list(base.fields)
    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    fractional = (T.FloatType, T.DoubleType)
    for f in other.fields:
        cur = by_name.get(f.name)
        if isinstance(f.dataType, T.NullType):
            # an all-NULL batch column carries no type evidence: existing
            # columns keep their type; a brand-new column waits for the first
            # typed value before it can evolve the schema.
            continue
        if cur is None:
            out.append(T.StructField(f.name, f.dataType, True))
        elif cur.dataType != f.dataType:
            # tolerate numeric representation drift from upstream producers
            # (e.g. Arrow/pandas inferring long for an int column); the table's
            # declared type stays authoritative and the batch is cast to it.
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
            if not (both_integral or both_fractional or both_ts):
                raise ValueError(
                    f"non-additive schema change for column {f.name!r}: "
                    f"{cur.dataType} -> {f.dataType}"
                )
    return T.StructType(out)
