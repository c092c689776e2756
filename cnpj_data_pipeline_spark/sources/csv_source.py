"""Reference-style CSV change-batch source (SURVEY S8-S12, P1, §3.2).

The reference reads headerless, ';'-separated, ISO-8859-1 CSV with every column
as string (``pl.read_csv(..., infer_schema_length=0, has_header=False,
null_values=[''])``, src/processor.py:465-474), transcodes encoding in a 50MB
pre-pass (src/processor.py:180-239), names columns positionally from a
hand-maintained dict (src/processor.py:27-97,507-519), then applies per-table
type refinements (decimal-comma doubles, zero-dates).

Spark collapses all of that into one declarative scan:

* encoding — ``option('encoding', 'ISO-8859-1')`` (no transcode pre-pass);
* eager/lazy/chunked split (S9/S10/S11) — gone: Spark scans are lazy and
  partitioned (``spark.sql.files.maxPartitionBytes`` is the chunk size);
* positional naming + typing — a :class:`TransformSpec` compiled to one
  ``select`` of Column expressions, pushed into the scan by Catalyst.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cnpj_data_pipeline_spark.functions.transforms import (
    decimal_comma_to_double,
    zero_date_to_null,
)


@dataclass(frozen=True)
class TransformSpec:
    """Declarative per-table parse spec — the reference's COLUMN_MAPPINGS /
    NUMERIC_COLUMNS / DATE_COLUMNS dicts (src/processor.py:27-122) as data.

    ``names``: positional column names (index i → name). Extra trailing input
    columns get the reference's ``column_{i}`` fallback (src/processor.py:518).
    ``numeric``: names parsed as decimal-comma doubles (F1).
    ``dates``: names parsed as zero-tolerant yyyyMMdd dates (F2).
    """

    names: Sequence[str]
    numeric: Sequence[str] = field(default_factory=tuple)
    dates: Sequence[str] = field(default_factory=tuple)

    def columns(self, input_width: int) -> list[Column]:
        out: list[Column] = []
        for i in range(input_width):
            name = self.names[i] if i < len(self.names) else f"column_{i}"
            c = F.col(f"_c{i}")
            if name in self.numeric:
                c = decimal_comma_to_double(c)
            elif name in self.dates:
                c = zero_date_to_null(c)
            out.append(c.alias(name))
        return out


def read_csv_batch(
    spark: SparkSession,
    paths: str | list[str],
    spec: TransformSpec,
    input_width: int | None = None,
    sep: str = ";",
    encoding: str = "ISO-8859-1",
) -> DataFrame:
    """One scan: headerless all-string CSV → named, typed DataFrame."""
    width = input_width if input_width is not None else len(spec.names)
    schema = T.StructType(
        [T.StructField(f"_c{i}", T.StringType(), True) for i in range(width)]
    )
    raw = (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("header", "false")
        .option("encoding", encoding)
        .option("nullValue", "")
        .option("mode", "PERMISSIVE")
        .csv(paths)
    )
    return raw.select(*spec.columns(width))
