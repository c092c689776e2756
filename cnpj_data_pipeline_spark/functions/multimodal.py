"""Multimodal (image/audio/video) columns as first-class lake citizens.

Pattern for a 100 TB training-data pipeline: media rides as an opaque
``binary`` payload column next to typed metadata (format, dimensions); decode
/ feature-extraction runs as Arrow-batched ``mapInPandas`` so bytes never
cross the Python boundary row-at-a-time, and the expensive stage is an
embarrassingly parallel map over partitions (no shuffle).

The real decoders (PIL/libsndfile/ffmpeg) are NOT in this container, so
``decode_media`` is a clearly marked stub raising ``NotImplementedError``;
``fake_decode_media`` is a deterministic byte-level stand-in with the same
signature/batch shape, so the Spark-side plumbing (schema, partitioning, UDF
signature, Arrow batching) is real and tested end-to-end.

Payload synthesis is deterministic from the ``documents`` table (md5-derived
bytes + a real container magic prefix), so DuckDB can reproduce it and the
correctness gate stays exact.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# container magics (real file signatures)
MAGIC = {"jpeg": "FFD8FF", "png": "89504E47", "wav": "52494646"}
FORMATS = ["jpeg", "png", "wav"]
BODY_REPEATS = 4  # payload body = 4 chained md5 digests = 64 bytes


def synthesize_media(docs: DataFrame) -> DataFrame:
    """documents -> media table: (doc_id, format, declared_w, declared_h,
    payload binary). Deterministic: format cycles by doc_id; body bytes are
    chained md5 digests of the text; a real magic prefix is prepended."""
    fmt = F.element_at(F.array(*[F.lit(f) for f in FORMATS]), (F.col("doc_id") % 3 + 1).cast("int"))
    magic = F.unhex(
        F.element_at(
            F.array(*[F.lit(MAGIC[f]) for f in FORMATS]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        )
    )
    body = F.concat(
        *[
            F.unhex(F.md5(F.concat(F.col("text"), F.lit(str(i)))))
            for i in range(BODY_REPEATS)
        ]
    )
    return docs.select(
        "doc_id",
        fmt.alias("format"),
        (16 + F.col("doc_id") % 32).cast("int").alias("declared_w"),
        (16 + F.col("doc_id") % 24).cast("int").alias("declared_h"),
        F.concat(magic, body).alias("payload"),
    )


def media_meta(media: DataFrame) -> DataFrame:
    """Metadata extraction without decoding: byte length + container sniff
    from the magic prefix, checked against the declared format — pure JVM
    column expressions (the cheap always-on path at scale)."""
    head = F.hex(F.substring(F.col("payload"), 1, 4))
    sniffed = (
        F.when(head.startswith("FFD8FF"), "jpeg")
        .when(head.startswith("89504E47"), "png")
        .when(head.startswith("52494646"), "wav")
        .otherwise("unknown")
    )
    return media.select(
        "doc_id",
        "format",
        F.length("payload").alias("n_bytes"),
        head.alias("head_hex"),
        sniffed.alias("sniffed_format"),
        (sniffed == F.col("format")).alias("format_ok"),
    )


BYTE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("max_byte", T.IntegerType()),
        T.StructField("n_zero_bytes", T.IntegerType()),
    ]
)


def media_byte_stats(media: DataFrame) -> DataFrame:
    """Feature extraction over raw bytes via Arrow-batched mapInPandas:
    numpy-vectorized per batch (frombuffer + reduction), zero per-row Python
    beyond the payload iteration numpy hides. The template for decode/
    resize/frame-sample stages at scale: map-only, no shuffle."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = [np.frombuffer(p, dtype=np.uint8) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": np.array([b.size for b in bufs], dtype="int32"),
                    "mean_byte": np.array(
                        [round(float(b.mean()), 6) for b in bufs], dtype="float64"
                    ),
                    "max_byte": np.array([int(b.max()) for b in bufs], dtype="int32"),
                    "n_zero_bytes": np.array(
                        [int((b == 0).sum()) for b in bufs], dtype="int32"
                    ),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        extract, schema=BYTE_STATS_SCHEMA
    )


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_pixels", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """REAL decode stage — STUB. The container ships no PIL/libsndfile/ffmpeg;
    on a production image this body becomes `Image.open(BytesIO(payload))`
    etc. inside the same mapInPandas shape as fake_decode_media."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "media decoders (PIL/libsndfile/ffmpeg) are not available in this "
            "environment; use fake_decode_media for the plumbing-equivalent "
            "deterministic stand-in"
        )
        yield  # pragma: no cover — makes this a generator like the real one

    return media.select("doc_id", "payload").mapInPandas(
        _decode, schema=DECODE_SCHEMA
    )


def fake_decode_media(media: DataFrame) -> DataFrame:
    """Deterministic decode stand-in with the production batch shape: strips
    the container magic, treats body bytes as pixels."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                head = bytes(payload[:4])
                skip = 3 if head.startswith(bytes.fromhex(MAGIC["jpeg"])) else 4
                px = np.frombuffer(payload, dtype=np.uint8)[skip:]
                out.append((int(doc_id), int(px.size), round(float(px.mean()), 6)))
            yield pd.DataFrame(out, columns=["doc_id", "n_pixels", "mean_pixel"])

    return media.select("doc_id", "payload").mapInPandas(
        _decode, schema=DECODE_SCHEMA
    )
