"""Debezium-envelope JSON source — ingest a standard CDC wire format.

Debezium (the de-facto open-source CDC connector family for Postgres/MySQL/
etc.) emits one JSON envelope per change event::

    {"payload": {
        "before": {<row image before>} | null,
        "after":  {<row image after>}  | null,
        "op": "c" | "u" | "d" | "r",          # create/update/delete/snapshot-read
        "ts_ms": <epoch millis>,
        "source": {"lsn": <monotone offset>, ...}}}

This module maps that shape onto the engine's change envelope (payload cols
+ ``op`` 'I'|'U'|'D' + ``lsn``) so a Debezium topic dump lands in the lake
through the exact same exactly-once merge as every other WAL. The reference
has no streaming-CDC source at all (its "changes" are monthly CSV drops,
``src/downloader.py:27-83``); this is the format a real CDC deployment of
the same pipeline would actually receive.

Scale notes:

* The JSON is read with an EXPLICIT nested schema derived from the table's
  payload schema — never schema inference, which at 100 TB would be a
  full extra pass over the data before the real scan.
* Field extraction is pure Catalyst column pruning over the parsed struct
  (``payload.after.*``): whole-stage codegen, no Python.
* Deletes take their row image from ``before`` (Debezium puts ``after:
  null`` on deletes), so tombstones carry their key columns — required for
  keyed LWW.
* ``r`` (snapshot read) maps to 'I' like ``c``: an initial-snapshot topic
  replays as plain inserts, idempotent under the epoch ledger.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# both timestamp flavors ride as MicroTimestamp longs: a source column can
# surface as TIMESTAMP_NTZ (e.g. parquet written without a UTC annotation)
# and an isinstance check on TimestampType alone would silently leave it a
# string in the JSON and NULL on read-back
_TS_TYPES = (T.TimestampType, T.TimestampNTZType)


def debezium_envelope_schema(payload_schema: T.StructType) -> T.StructType:
    """The explicit read schema for a Debezium JSON stream whose row images
    have ``payload_schema``. Timestamp columns in the row image ride as
    epoch MICROS (Debezium's ``io.debezium.time.MicroTimestamp`` semantic
    type — lossless for µs-precision sources, unlike the millis default)
    and are restored to timestamps on read."""
    image = T.StructType(
        [
            T.StructField(
                f.name,
                T.LongType() if isinstance(f.dataType, _TS_TYPES)
                else f.dataType,
                True,
            )
            for f in payload_schema.fields
        ]
    )
    return T.StructType(
        [
            T.StructField(
                "payload",
                T.StructType(
                    [
                        T.StructField("before", image, True),
                        T.StructField("after", image, True),
                        T.StructField("op", T.StringType(), True),
                        T.StructField("ts_ms", T.LongType(), True),
                        T.StructField(
                            "source",
                            T.StructType(
                                [T.StructField("lsn", T.LongType(), True)]
                            ),
                            True,
                        ),
                    ]
                ),
                True,
            )
        ]
    )


def debezium_to_changes(
    raw: DataFrame, payload_schema: T.StructType
) -> DataFrame:
    """Parsed Debezium envelopes → the engine change envelope
    (payload columns + op 'I'|'U'|'D' + lsn). Deletes read their image from
    ``before``; everything else from ``after``. LSN falls back to ``ts_ms``
    for connectors that omit ``source.lsn`` (ordering stays monotone per
    key as long as the producer's clock is)."""
    p = F.col("payload")
    is_del = p.getField("op") == "d"
    image = F.when(is_del, p.getField("before")).otherwise(
        p.getField("after")
    )
    cols = []
    for f in payload_schema.fields:
        c = image.getField(f.name)
        if isinstance(f.dataType, _TS_TYPES):
            # epoch micros -> timestamp, JVM-side and exact (integer path);
            # the final cast restores NTZ when the payload field is NTZ
            c = F.timestamp_micros(c.cast("long"))
        cols.append(c.cast(f.dataType).alias(f.name))
    op = (
        F.when(is_del, F.lit("D"))
        .when(p.getField("op") == "u", F.lit("U"))
        .otherwise(F.lit("I"))  # 'c' and 'r' (snapshot read) are inserts
    )
    lsn = F.coalesce(
        p.getField("source").getField("lsn"), p.getField("ts_ms")
    ).cast("long")
    return raw.select(*cols, op.alias("op"), lsn.alias("lsn"))


def read_debezium_epoch(
    spark: SparkSession,
    stream_root: str,
    epoch: int,
    payload_schema: T.StructType,
) -> DataFrame:
    """One epoch directory of Debezium JSON (``epoch=<k>/*.json[l]``) as an
    engine change batch, ready for ``apply_changes``."""
    path = os.path.join(stream_root, f"epoch={epoch}")
    raw = spark.read.schema(debezium_envelope_schema(payload_schema)).json(
        path
    )
    return debezium_to_changes(raw, payload_schema)


def list_debezium_epochs(stream_root: str) -> list[int]:
    """Epoch discovery for a Debezium JSON WAL (same layout contract as the
    parquet WAL: one directory per epoch)."""
    out = []
    for p in glob.glob(os.path.join(stream_root, "epoch=*")):
        tail = os.path.basename(p).split("=", 1)[1]
        if tail.isdigit() and os.path.isdir(p):
            out.append(int(tail))
    return sorted(out)


def changes_to_debezium_json(changes: DataFrame) -> DataFrame:
    """Inverse mapping (test/bench producer): engine change envelopes →
    one-column DataFrame of Debezium JSON strings. Timestamp columns become
    epoch micros (MicroTimestamp — lossless); deletes put the image in
    ``before`` with ``after: null``."""
    payload_fields = [
        f for f in changes.schema.fields if f.name not in ("op", "lsn", "epoch")
    ]
    image_cols = []
    for f in payload_fields:
        c = F.col(f.name)
        if isinstance(f.dataType, _TS_TYPES):
            c = F.unix_micros(c.cast("timestamp"))
        image_cols.append(c.alias(f.name))
    image = F.struct(*image_cols)
    null_image = F.lit(None).cast(
        "struct<"
        + ",".join(
            f"{f.name}:"
            + ("bigint" if isinstance(f.dataType, _TS_TYPES)
               else f.dataType.simpleString())
            for f in payload_fields
        )
        + ">"
    )
    is_del = F.col("op") == "D"
    envelope = F.struct(
        F.when(is_del, image).otherwise(null_image).alias("before"),
        F.when(is_del, null_image).otherwise(image).alias("after"),
        F.when(is_del, F.lit("d"))
        .when(F.col("op") == "U", F.lit("u"))
        .otherwise(F.lit("c"))
        .alias("op"),
        (F.col("lsn") * F.lit(1000)).cast("long").alias("ts_ms"),
        F.struct(F.col("lsn").cast("long").alias("lsn")).alias("source"),
    )
    return changes.select(
        F.to_json(F.struct(envelope.alias("payload"))).alias("value")
    )
