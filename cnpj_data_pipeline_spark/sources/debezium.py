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


def _image_exprs(payload_fields: list[T.StructField]):
    """(image struct over the payload columns, matching typed NULL image).
    Timestamp columns become epoch micros (MicroTimestamp — lossless)."""
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
    return image, null_image


def changes_to_debezium_json(changes: DataFrame) -> DataFrame:
    """Inverse mapping (test/bench producer): engine change envelopes →
    one-column DataFrame of Debezium JSON strings. Timestamp columns become
    epoch micros (MicroTimestamp — lossless); deletes put the image in
    ``before`` with ``after: null``."""
    payload_fields = [
        f for f in changes.schema.fields if f.name not in ("op", "lsn", "epoch")
    ]
    image, null_image = _image_exprs(payload_fields)
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


def export_changes_debezium(
    spark: SparkSession,
    table,
    from_snapshot: int,
    to_snapshot: int | None = None,
) -> DataFrame:
    """OUTBOUND CDC: the table's net change window ``(from_snapshot,
    to_snapshot]`` as Debezium-envelope JSON — the lake as a CDC *producer*,
    closing the loop with the inbound source above. A downstream system
    that already speaks Debezium (another lake, a search index, a cache)
    tails this instead of re-reading state; the reference has no outbound
    feed at all (its consumers re-SELECT Postgres).

    Semantics ride on :meth:`LakeTable.read_changes_typed` (the Delta-CDF
    row shape): inserts become ``op:"c"`` with ``before: null``; updates
    become one ``op:"u"`` with BOTH images (the typed feed's
    preimage/postimage pair, pivoted per key); deletes become ``op:"d"``
    with the pre-image in ``before`` — a richer envelope than the engine's
    own tombstones (which carry only the key). ``source.lsn`` is the
    event's LSN — for deletes the TOMBSTONE's LSN (joined from the raw
    feed; the typed delete row itself carries the pre-image's LSN), so
    replaying the export elsewhere beats the replica's pre-image in the
    LWW order: export → ``read_debezium_epoch`` → ``apply_changes`` on a
    mirror reproduces the source state exactly (the roundtrip gate in
    ``tests/test_debezium.py``).

    Execution shape, all O(changed data): the typed feed's one
    hash-aggregate + pruned pre-image read, one more per-key pivot
    aggregate (map-side combined), and a tombstone-LSN aggregate over the
    same window delta files, joined on the (changed-keys-sized) result.
    For a CONTINUOUS outbound stream, compose the streaming source with
    the row mapper instead: ``spark.readStream.format("lake_cdf")`` →
    :func:`changes_to_debezium_json` → any sink.
    """
    from cnpj_data_pipeline_spark.lake.format import (
        CHANGE_TYPE_COL,
        LSN_META_COL,
        OP_META_COL,
    )

    key_cols = table.key_cols()
    if key_cols is None:
        raise ValueError(
            "outbound Debezium export requires a keyed table (the envelope "
            "is per-key before/after images)"
        )
    typed = table.read_changes_typed(spark, from_snapshot, to_snapshot)
    payload_fields = [
        f for f in typed.schema.fields
        if f.name not in ("lsn", CHANGE_TYPE_COL)
    ]
    image, _ = _image_exprs(payload_fields)
    ct = F.col(CHANGE_TYPE_COL)
    pivoted = typed.groupBy(*key_cols).agg(
        F.first(
            F.when(ct.isin("update_preimage", "delete"), image),
            ignorenulls=True,
        ).alias("before"),
        F.first(
            F.when(ct.isin("insert", "update_postimage"), image),
            ignorenulls=True,
        ).alias("after"),
        F.max(
            F.when(ct != "update_preimage", F.col("lsn"))
        ).alias("__evt_lsn"),
    )
    tomb = (
        table.read_changes(spark, from_snapshot, to_snapshot)
        .filter(F.col(OP_META_COL) == "D")
        .groupBy(*key_cols)
        .agg(F.max(LSN_META_COL).alias("__tomb_lsn"))
    )
    j = pivoted.join(tomb, on=key_cols, how="left")
    is_del = F.col("after").isNull()
    lsn = F.when(is_del, F.col("__tomb_lsn")).otherwise(F.col("__evt_lsn"))
    envelope = F.struct(
        F.col("before"),
        F.col("after"),
        F.when(is_del, F.lit("d"))
        .when(F.col("before").isNull(), F.lit("c"))
        .otherwise(F.lit("u"))
        .alias("op"),
        (lsn * F.lit(1000)).cast("long").alias("ts_ms"),
        F.struct(lsn.cast("long").alias("lsn")).alias("source"),
    )
    # ignoreNullFields=false: real Debezium emits explicit "after": null
    # on deletes (and "before": null on creates); consumers key on that
    return j.select(
        F.to_json(
            F.struct(envelope.alias("payload")),
            {"ignoreNullFields": "false"},
        ).alias("value")
    )
