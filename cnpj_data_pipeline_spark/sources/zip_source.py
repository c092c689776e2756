"""ZIP-archive change-batch source (SURVEY S4): distributed member extraction
over Spark's ``binaryFile`` format.

Reference analogue: the downloader unzips each monthly archive on the driver
and filters members against known file patterns
(``src/download_strategies/base.py:133-167``). The Spark-first form keeps the
archive bytes in executors: ``spark.read.format('binaryFile')`` ships each
zip as one row ``(path, modificationTime, length, content)``; an Arrow-batched
``mapInPandas`` opens the archive in-memory, filters members by pattern, and
either returns raw member bytes or parses the member CSV straight into the
positional ``_c{i}`` columns a :class:`TransformSpec` expects — no driver-side
extraction, no temp files, and per-archive parallelism (a monthly drop is
dozens of zips; each lands on its own task).

Scale note: one zip member must fit in one executor's memory (zip is not
splittable — same constraint every engine has). The reference's archives are
~100 MB-2 GB members; at 100 TB you shard the drop across many archives and
get archive-level parallelism, which is exactly what this operator exposes.
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from cnpj_data_pipeline_spark.sources.csv_source import TransformSpec

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("zip_path", T.StringType(), False),
        T.StructField("member", T.StringType(), False),
        T.StructField("size", T.LongType(), False),
        T.StructField("content", T.BinaryType(), False),
    ]
)


def read_zip_members(
    spark: SparkSession, paths: str | list[str], member_pattern: str = r".*"
) -> DataFrame:
    """One row per archive member matching ``member_pattern``:
    (zip_path, member, size, content). The member filter runs INSIDE the
    extraction task — non-matching members are never decompressed."""
    pat = re.compile(member_pattern)
    src = spark.read.format("binaryFile").load(paths)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                with zipfile.ZipFile(io.BytesIO(row["content"])) as zf:
                    for info in zf.infolist():
                        if info.is_dir() or not pat.search(info.filename):
                            continue
                        out.append(
                            (
                                row["path"],
                                info.filename,
                                info.file_size,
                                zf.read(info),
                            )
                        )
            yield pd.DataFrame(
                out, columns=["zip_path", "member", "size", "content"]
            )

    return src.select("path", "content").mapInPandas(extract, MEMBER_SCHEMA)


def read_zipped_csv_batch(
    spark: SparkSession,
    paths: str | list[str],
    spec: TransformSpec,
    member_pattern: str,
    input_width: int | None = None,
    sep: str = ";",
    encoding: str = "ISO-8859-1",
) -> DataFrame:
    """S4 + S8/S9 in one distributed pass: extract matching members and parse
    their headerless CSV straight into the spec's named/typed columns. The
    per-member parse is pandas ``read_csv`` over Arrow batches (vectorized C
    parser, no Python row loop), mirroring ``read_csv_batch`` semantics:
    all-string, ``''``→NULL, permissive."""
    width = input_width if input_width is not None else len(spec.names)
    raw_schema = T.StructType(
        [T.StructField(f"_c{i}", T.StringType(), True) for i in range(width)]
    )
    members = read_zip_members(spark, paths, member_pattern)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f"_c{i}" for i in range(width)]
        for pdf in batches:
            for _, row in pdf.iterrows():
                df = pd.read_csv(
                    io.BytesIO(row["content"]),
                    sep=sep,
                    header=None,
                    names=cols,
                    dtype=str,
                    encoding=encoding,
                    keep_default_na=False,
                )
                # ''→NULL, matching the reference's null_values=[''] and the
                # Spark CSV reader's nullValue option
                yield df.replace({"": None})

    raw = members.select("content").mapInPandas(parse, raw_schema)
    return raw.select(*spec.columns(width))
