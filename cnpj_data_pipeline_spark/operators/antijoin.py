"""Anti-join family: insert-if-absent and set-diff enrichment (SURVEY J4, J5, U1, U2).

Reference behaviors re-expressed:

* ``INSERT ... ON CONFLICT (pk) DO NOTHING`` (src/database/postgres.py:297-301,
  430-436,497-501) — keep only incoming keys not already present → append.
* SERPRO enrichment (src/reference_data.py:65-163 + src/processor.py:349-372):
  external code table minus existing codes, cleaned, then UNION ALL'd in.

Scale notes: the reference materializes the existing-key set into a Python set
(src/processor.py:350-363) — a driver-side collect that dies at 10^10 keys. The
Spark form is a ``left_anti`` join that stays distributed; when the incoming
side is small AQE broadcasts it automatically.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark.functions.transforms import (
    clean_code,
    normalize_description,
    strip_accents,
)


def insert_if_absent(
    existing: DataFrame, incoming: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """Rows of ``incoming`` whose key is absent from ``existing`` (J4).

    Duplicate keys within ``incoming`` are collapsed keep-first under a
    deterministic order (the reference relies on ON CONFLICT to drop them)."""
    on = [incoming[k] == existing[k] for k in key_cols]
    fresh = incoming.join(existing.select(*key_cols), on=list(key_cols), how="left_anti")
    return fresh.dropDuplicates(list(key_cols))


def enrich_reference_codes(
    official: DataFrame,
    external: DataFrame,
    code_col: str = "codigo",
    desc_col: str = "descricao",
    code_width: int = 2,
    ascii_fold: bool = True,
) -> DataFrame:
    """J5+U1: clean the external code table (trim/pad/uppercase/accent-fold,
    F3-F6), anti-join against official codes, union the missing rows in."""
    desc = normalize_description(F.col(desc_col))
    if ascii_fold:
        desc = strip_accents(desc)
    cleaned = (
        external.select(
            clean_code(F.col(code_col), code_width).alias(code_col),
            desc.alias(desc_col),
        )
        .filter(F.col(code_col).isNotNull() & (F.col(code_col) != ""))
        .dropDuplicates([code_col])
    )
    missing = cleaned.join(official.select(code_col), on=code_col, how="left_anti")
    return official.unionByName(missing, allowMissingColumns=True)
