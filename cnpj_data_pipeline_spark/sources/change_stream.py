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
    the merge's touched-bucket shortcut."""
    import pyarrow.parquet as pq

    total = 0
    for fp in glob.glob(os.path.join(stream_root, f"epoch={epoch}", "*.parquet")):
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
