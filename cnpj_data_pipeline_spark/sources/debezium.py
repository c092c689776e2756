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


#: DLQ row reasons, in check order (a row gets the FIRST matching reason)
DLQ_REASONS = (
    "malformed_json",   # from_json could not parse the line at all
    "missing_payload",  # parsed, but no payload object
    "invalid_op",       # payload.op not one of c/u/d/r
    "missing_image",    # no row image on the op's side (after / before-for-d)
    "missing_offset",   # neither source.lsn nor ts_ms — unorderable
)


def _dlq_reason_col(parsed) -> "F.Column":
    p = parsed.getField("payload")
    op = p.getField("op")
    is_del = op == "d"
    image = F.when(is_del, p.getField("before")).otherwise(p.getField("after"))
    # from_json is PERMISSIVE: a truncated line yields a struct of NULL
    # fields, never a NULL struct, so "unparseable" must come from the
    # corrupt-record side channel, not parsed.isNull()
    return (
        F.when(
            parsed.getField("_corrupt").isNotNull(), F.lit("malformed_json")
        )
        .when(p.isNull(), F.lit("missing_payload"))
        .when(op.isNull() | ~op.isin("c", "u", "d", "r"), F.lit("invalid_op"))
        .when(image.isNull(), F.lit("missing_image"))
        .when(
            p.getField("source").getField("lsn").isNull()
            & p.getField("ts_ms").isNull(),
            F.lit("missing_offset"),
        )
        .otherwise(F.lit(None).cast("string"))
        .alias("dlq_reason")
    )


def split_debezium_lines(
    lines: DataFrame, payload_schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Split raw Debezium JSON lines (one ``value`` string column) into
    (valid change batch, dead-letter rows).

    Real CDC streams carry garbage — truncated messages from producer
    crashes, tombstone markers, envelopes from a connector bug — and a
    row-level DEAD-LETTER QUEUE is the standard contract (Kafka Connect's
    ``errors.deadletterqueue.topic.name``): quarantine the bad row with a
    machine-readable reason, ingest the rest, never fail the stream and
    never silently drop. The reference aborts the whole file on a parse
    error (``src/processor.py`` raises; batch-level all-or-nothing); WAP
    (plans/wap.py) gives this engine the batch-level gate, this gives the
    row-level one — the two compose.

    All checks are structural (parse, op, image, offset) and run as ONE
    Catalyst projection over the parsed struct — no Python, no second
    parse; the split is two filters over the same cached plan. The DLQ side
    keeps the RAW line (replayable once the producer bug is fixed) plus the
    reason."""
    schema = debezium_envelope_schema(payload_schema).add(
        "_corrupt", T.StringType(), True
    )
    parsed = F.from_json(
        F.col("value"),
        schema,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
    )
    tagged = lines.select(
        F.col("value"), parsed.alias("parsed"), _dlq_reason_col(parsed)
    )
    good = debezium_to_changes(
        tagged.filter(F.col("dlq_reason").isNull()).select(
            F.col("parsed").getField("payload").alias("payload")
        ),
        payload_schema,
    )
    dlq = tagged.filter(F.col("dlq_reason").isNotNull()).select(
        "value", "dlq_reason"
    )
    return good, dlq


def read_debezium_epoch(
    spark: SparkSession,
    stream_root: str,
    epoch: int,
    payload_schema: T.StructType,
    dlq_dir: str | None = None,
) -> DataFrame:
    """One epoch directory of Debezium JSON (``epoch=<k>/*.json[l]``) as an
    engine change batch, ready for ``apply_changes``.

    ``dlq_dir``: quarantine structurally-invalid rows (see
    :func:`split_debezium_lines`) under ``<dlq_dir>/epoch=<k>`` as parquet
    (raw line + reason + epoch) instead of failing or silently dropping
    them; only valid rows are returned. Costs one extra pass over the
    epoch's lines (O(batch), never O(table)); without ``dlq_dir`` invalid
    rows raise nothing here and surface as NULL-key rows in the merge —
    pass it in production."""
    path = os.path.join(stream_root, f"epoch={epoch}")
    if dlq_dir is None:
        raw = spark.read.schema(
            debezium_envelope_schema(payload_schema)
        ).json(path)
        return debezium_to_changes(raw, payload_schema)
    lines = spark.read.text(path)
    good, dlq = split_debezium_lines(lines, payload_schema)
    dlq.withColumn("epoch", F.lit(int(epoch))).write.mode("overwrite").parquet(
        os.path.join(dlq_dir, f"epoch={epoch}")
    )
    return good


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
