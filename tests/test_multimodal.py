"""Multimodal binary-column plumbing: synthesis determinism, metadata sniff,
Arrow-batched byte stats, decode stub contract (real decoder absent -> clear
NotImplementedError; fake decoder exercises the identical mapInPandas shape).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark.functions.multimodal import (
    decode_media,
    fake_decode_media,
    media_byte_stats,
    media_meta,
    synthesize_media,
)


@pytest.fixture()
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"doc text number {i} with some words") for i in range(30)],
        "doc_id long, text string",
    )
    return synthesize_media(docs)


def test_payload_shape_and_magic(media):
    rows = media_meta(media).collect()
    assert len(rows) == 30
    for r in rows:
        # 64-byte md5 body + 3-byte (jpeg) or 4-byte (png/wav) magic
        assert r["n_bytes"] == (67 if r["format"] == "jpeg" else 68)
        assert r["sniffed_format"] == r["format"]
        assert r["format_ok"]


def test_byte_stats_vectorized(media):
    st = media_byte_stats(media).orderBy("doc_id").collect()
    assert len(st) == 30
    assert all(0.0 <= r["mean_byte"] <= 255.0 for r in st)
    assert all(r["max_byte"] <= 255 for r in st)
    # deterministic across runs
    st2 = media_byte_stats(media).orderBy("doc_id").collect()
    assert st == st2


def test_decode_stub_raises(media):
    with pytest.raises(Exception) as ei:
        decode_media(media).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_fake_decode_strips_magic(media):
    out = {r["doc_id"]: r for r in fake_decode_media(media).collect()}
    meta = {r["doc_id"]: r for r in media_meta(media).collect()}
    for doc_id, r in out.items():
        skip = 3 if meta[doc_id]["format"] == "jpeg" else 4
        assert r["n_pixels"] == meta[doc_id]["n_bytes"] - skip
