"""Query registry backing ``__spark_entry__``: every implemented operator from
SURVEY.md §2 exposed as (spark, sf_dir) -> DataFrame, with a DuckDB-equivalent
ANSI-SQL oracle where the semantics are SQL-expressible."""

from __future__ import annotations

from cnpj_data_pipeline_spark.queries import (
    cdc,
    csv_ingest,
    multimodal,
    multitable,
    relational,
    text,
    vector,
)

QUERIES = {}
ORACLES = {}
for _m in (cdc, csv_ingest, multimodal, multitable, relational, text, vector):
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)
