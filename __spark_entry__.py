"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship CDC replay at sf0.001; ``queries``/``oracle_sql``
expose every implemented operator from SURVEY.md §2 (plus the training-data
ops) with DuckDB oracles for the side-by-side correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC replay through the lake engine at sf0.001."""
    from cnpj_data_pipeline_spark.queries.cdc import q_cdc_replay

    return q_cdc_replay(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cnpj_data_pipeline_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from cnpj_data_pipeline_spark.queries import ORACLES

    return dict(ORACLES)


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Oracle-gated intermediate variants beyond the driver's 50-row gate
    (validated by tools/check_oracles.py and pytest)."""
    from cnpj_data_pipeline_spark.queries import EXTRA_QUERIES

    return dict(EXTRA_QUERIES)


def extra_oracle_sql() -> dict[str, str]:
    from cnpj_data_pipeline_spark.queries import EXTRA_ORACLES

    return dict(EXTRA_ORACLES)
