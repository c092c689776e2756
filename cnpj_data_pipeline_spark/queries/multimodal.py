"""Multimodal-column queries: binary payload synthesis + metadata sniffing +
Arrow-batched byte-feature extraction (mapInPandas) + the deterministic
fake-decode stage, each with a DuckDB oracle reproducing the same
md5-derived payload bytes.

The oracles compute byte statistics over ``hex(payload)`` two-chars-at-a-time
(DuckDB has no direct blob-byte indexing) — slow but exact, fine at the
sf0.01 gate size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from cnpj_data_pipeline_spark.functions.multimodal import (
    BODY_REPEATS,
    MAGIC,
    fake_decode_media,
    media_byte_stats,
    media_meta,
    synthesize_media,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).repartition(spark.sparkContext.defaultParallelism)
    return synthesize_media(d)


def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary metadata path: length + container sniff, pure JVM expressions."""
    return media_meta(_media(spark, sf_dir))


def q_media_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over raw payload bytes."""
    return media_byte_stats(_media(spark, sf_dir))


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode stage (deterministic fake decoder; real decoder is an
    explicit NotImplementedError stub — see functions.multimodal)."""
    return fake_decode_media(_media(spark, sf_dir))


QUERIES = {
    "q_media_meta": q_media_meta,
    "q_media_byte_stats": q_media_byte_stats,
    "q_media_decode": q_media_decode,
}

# --- DuckDB twins -----------------------------------------------------------

_FMT = "CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'wav' END"
_MAGIC = (
    f"CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN '{MAGIC['jpeg']}' "
    f"WHEN 1 THEN '{MAGIC['png']}' ELSE '{MAGIC['wav']}' END"
)
_BODY_HEX = " || ".join(f"upper(md5(text || '{i}'))" for i in range(BODY_REPEATS))

_MEDIA_CTE = f"""
media AS (
  SELECT doc_id,
         {_FMT} AS format,
         {_MAGIC} || {_BODY_HEX} AS payload_hex
  FROM documents
)
"""

_BYTES_CTE = """
bytes AS (
  SELECT doc_id,
         list_transform(range(1, CAST(length(payload_hex)/2 AS BIGINT) + 1),
           i -> CAST(CAST('0x' || substr(payload_hex, CAST(2*i-1 AS INTEGER), 2) AS UBIGINT) AS INTEGER)
         ) AS bs
  FROM media
)
"""

ORACLES = {
    "q_media_meta": f"""
        WITH {_MEDIA_CTE.strip()}
        SELECT doc_id, format,
               CAST(length(payload_hex)/2 AS INTEGER) AS n_bytes,
               substr(payload_hex, 1, 8) AS head_hex,
               CASE WHEN starts_with(payload_hex, 'FFD8FF') THEN 'jpeg'
                    WHEN starts_with(payload_hex, '89504E47') THEN 'png'
                    WHEN starts_with(payload_hex, '52494646') THEN 'wav'
                    ELSE 'unknown' END AS sniffed_format,
               CASE WHEN starts_with(payload_hex, 'FFD8FF') THEN 'jpeg'
                    WHEN starts_with(payload_hex, '89504E47') THEN 'png'
                    WHEN starts_with(payload_hex, '52494646') THEN 'wav'
                    ELSE 'unknown' END = format AS format_ok
        FROM media
    """,
    "q_media_byte_stats": f"""
        WITH {_MEDIA_CTE.strip()}, {_BYTES_CTE.strip()}
        SELECT doc_id,
               CAST(len(bs) AS INTEGER) AS n_bytes,
               round(list_sum(bs) / CAST(len(bs) AS DOUBLE), 6) AS mean_byte,
               CAST(list_max(bs) AS INTEGER) AS max_byte,
               CAST(len(list_filter(bs, b -> b = 0)) AS INTEGER) AS n_zero_bytes
        FROM bytes
    """,
    "q_media_decode": f"""
        WITH {_MEDIA_CTE.strip()}, {_BYTES_CTE.strip()},
        px AS (
          SELECT doc_id,
                 list_transform(
                   range(CASE WHEN bs[1] = 255 THEN 4 ELSE 5 END, len(bs) + 1),
                   i -> bs[i]
                 ) AS pxs
          FROM bytes
        )
        SELECT doc_id,
               CAST(len(pxs) AS INTEGER) AS n_pixels,
               round(list_sum(pxs) / CAST(len(pxs) AS DOUBLE), 6) AS mean_pixel
        FROM px
    """,
}
