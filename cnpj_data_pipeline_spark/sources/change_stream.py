"""Change-batch source: discovery + ordering + processed-filter.

Reference analogue: the downloader discovers the latest monthly directory and
its file parts (S1/S2, ``src/downloader.py:27-83``), orders them by FK
dependency (J6, ``src/downloader.py:85-160``), and filters out already-processed
files against the checkpoint table (P4, ``main.py:100-131``). Here the "WAL" is
a directory of epoch-partitioned Parquet change batches::

    <stream_root>/epoch=<k>/*.parquet

Epoch directories are discovered driver-side (bounded metadata, like the
reference's file listing), ordered numerically (the WAL tail order), and
filtered against the lake table's ``applied_epochs`` lineage. Each batch is
read as a DataFrame scan — Spark parallelizes within the batch.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from cnpj_data_pipeline_spark.lake.format import LakeTable

_EPOCH_RE = re.compile(r"epoch=(\d+)$")


def list_epochs(stream_root: str) -> list[int]:
    """S1/S2 analogue: enumerate available change batches, oldest first."""
    out = []
    for p in glob.glob(os.path.join(stream_root, "epoch=*")):
        m = _EPOCH_RE.search(p)
        if m and os.path.isdir(p):
            out.append(int(m.group(1)))
    return sorted(out)


def pending_epochs(stream_root: str, table: LakeTable) -> list[int]:
    """P4 analogue: drop batches the lineage already records as applied."""
    applied = table.applied_epochs()
    return [e for e in list_epochs(stream_root) if e not in applied]


def read_epoch(spark: SparkSession, stream_root: str, epoch: int) -> DataFrame:
    return spark.read.parquet(os.path.join(stream_root, f"epoch={epoch}"))


def epoch_row_count(stream_root: str, epoch: int) -> int:
    """Cheap batch-size hint from Parquet footers only (no data scan) — feeds
    the merge's touched-bucket shortcut. Recursive: counts flat epochs and
    bucket-partitioned epochs alike."""
    import pyarrow.parquet as pq

    total = 0
    for fp in glob.glob(
        os.path.join(stream_root, f"epoch={epoch}", "**", "*.parquet"),
        recursive=True,
    ):
        total += pq.ParquetFile(fp).metadata.num_rows
    return total


def iter_pending(
    spark: SparkSession, stream_root: str, table: LakeTable
) -> Iterator[tuple[int, DataFrame, int]]:
    for e in pending_epochs(stream_root, table):
        yield e, read_epoch(spark, stream_root, e), epoch_row_count(stream_root, e)


def write_epoch(changes: DataFrame, stream_root: str, epoch: int) -> None:
    """Producer helper (used by tests/bench to materialize a WAL)."""
    changes.write.mode("overwrite").parquet(
        os.path.join(stream_root, f"epoch={epoch}")
    )


_BUCKETING_DESCRIPTOR = "_bucketing.json"


def write_epoch_bucketed(
    changes: DataFrame,
    stream_root: str,
    epoch: int,
    bucket_cols: list[str] | None,
    n_buckets: int,
) -> None:
    """Producer helper: materialize a KEY-PARTITIONED (bucket-aligned) WAL
    epoch — the Kafka-keyed-topic / Iceberg-bucket-write-distribution shape,
    where the PRODUCER owns the partitioning and the ingest needs no
    exchange at all (``operators.copart``). The layout is self-describing:
    a ``_bucketing.json`` descriptor records the bucket function inputs so
    the consumer can validate alignment with its table before trusting it::

        <root>/epoch=<k>/_bucketing.json
        <root>/epoch=<k>/__bucket=<b>/*.parquet

    ``bucket_cols=None`` is the keyless layout (buckets on lsn, matching
    ``lake.format.bucket_expr``)."""
    import json

    from pyspark.sql import functions as F

    from cnpj_data_pipeline_spark.config import BUCKET_COL
    from cnpj_data_pipeline_spark.lake.format import bucket_expr

    out = os.path.join(stream_root, f"epoch={epoch}")
    ch = changes.withColumn(BUCKET_COL, bucket_expr(bucket_cols, n_buckets))
    # one shuffle at PRODUCE time (a keyed Kafka topic pays this on publish);
    # each bucket lands wholly in one task -> one file per bucket
    (
        ch.repartition(n_buckets, F.col(BUCKET_COL))
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(out)
    )
    with open(os.path.join(out, _BUCKETING_DESCRIPTOR), "w") as f:
        json.dump(
            {
                "n_buckets": n_buckets,
                "bucket_cols": list(bucket_cols) if bucket_cols else None,
                "hash": "xxhash64-pmod",
                # the types the hash actually saw: xxhash64 is type-sensitive
                # (int32 7 != int64 7), so alignment with a table requires
                # matching TYPES, not just matching column names
                "bucket_col_types": (
                    [
                        changes.schema[c].dataType.simpleString()
                        for c in bucket_cols
                    ]
                    if bucket_cols
                    else None
                ),
            },
            f,
        )


def bucketed_layout(
    stream_root: str, epoch: int, table: LakeTable
) -> dict[int, list[str]] | None:
    """Detect + VALIDATE a bucket-aligned epoch layout against ``table``'s
    bucketing. Returns bucket id -> absolute parquet paths when the epoch's
    DESCRIPTOR declares the exact same bucket function (columns, count,
    hash), else None — the caller then takes the general shuffling path.

    The check validates the producer's declared INTENT, not row placement:
    a producer whose descriptor is right but whose writer put rows in the
    wrong ``__bucket=`` directory (partial rewrite, buggy writer) would
    still pass here and silently corrupt locality. For untrusted producers,
    ``EngineConfig.copart_verify_placement`` adds a map-only Spark
    re-hash of every WAL row before the apply
    (``operators.copart.verify_bucket_placement``) that fails loudly on the
    first misplaced row."""
    import json

    desc_path = os.path.join(
        stream_root, f"epoch={epoch}", _BUCKETING_DESCRIPTOR
    )
    if not os.path.isfile(desc_path):
        return None
    try:
        with open(desc_path) as f:
            desc = json.load(f)
    except (OSError, ValueError):
        return None
    snap = table.snapshot()
    tbl_bcols = LakeTable._bucket_cols_of(snap)
    if (
        desc.get("hash") != "xxhash64-pmod"
        or int(desc.get("n_buckets", -1)) != int(snap["n_buckets"])
        or (desc.get("bucket_cols") or None) != (tbl_bcols or None)
    ):
        return None
    # type alignment: the producer hashed ITS column types; if they differ
    # from the table's (e.g. a long turn_idx against an int32 key), equal
    # values hash to different buckets — the layout is useless here, take
    # the shuffling path (which casts to the table schema BEFORE hashing).
    # Descriptors predating bucket_col_types skip the check (trusted as
    # before); producers should re-materialize to get the guard.
    declared = desc.get("bucket_col_types")
    if declared is not None and tbl_bcols:
        from cnpj_data_pipeline_spark.schemas import schema_from_json

        tbl_schema = schema_from_json(snap["schema"])
        want = [tbl_schema[c].dataType.simpleString() for c in tbl_bcols]
        if list(declared) != want:
            return None
    from cnpj_data_pipeline_spark.config import BUCKET_COL

    out: dict[int, list[str]] = {}
    pat = os.path.join(
        stream_root, f"epoch={epoch}", f"{BUCKET_COL}=*", "*.parquet"
    )
    for fp in sorted(glob.glob(pat)):
        b = int(os.path.basename(os.path.dirname(fp)).split("=", 1)[1])
        out.setdefault(b, []).append(os.path.abspath(fp))
    return out
