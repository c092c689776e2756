"""Scalar transform functions — Spark re-expression of the reference's cleaning
expressions (SURVEY §2.8 F1-F10). All are Catalyst Column expressions (JVM-side,
whole-stage-codegen) except accent stripping, which the reference itself does in
per-row Python (``map_elements``, ``src/reference_data.py:122-146``) and which we
lift to an Arrow-vectorized pandas_udf.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def decimal_comma_to_double(col: Column | str) -> Column:
    """F1: '120000000000,00' → 120000000000.0 (lenient: bad input → NULL).

    Reference: ``str.replace(',', '.')`` + ``cast(Float64, strict=False)``
    (src/processor.py:521-527)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, ",", ".").try_cast("double")


def double_to_decimal_comma(col: Column | str, scale: int = 2) -> Column:
    """Inverse of F1 (round-trip fidelity for sinks that need the raw form)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.format_number(c, scale), r"[.]", ",")


def zero_date_to_null(col: Column | str, fmt: str = "yyyyMMdd") -> Column:
    """F2: '0'/'00000000' (and empty) → NULL, else parse yyyyMMdd → date.

    Reference: src/processor.py:529-538 + docs/data-schema/field-mappings.md:24-27."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isin("0", "00000000", ""), F.lit(None).cast("date")).otherwise(
        F.to_date(c, fmt)
    )


def clean_code(col: Column | str, width: int = 2) -> Column:
    """F3+F4: trim then left-pad short all-digit codes to ``width``.

    Reference: strip (src/reference_data.py:101-102) + conditional zero-pad of
    1-digit codes (src/reference_data.py:109-119)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(t.rlike(r"^\d{1,%d}$" % (width - 1)), F.lpad(t, width, "0")).otherwise(t)


def normalize_description(col: Column | str, fallback: str = "DESCRIÇÃO INDISPONÍVEL") -> Column:
    """F5+F9: uppercase, trimmed, NULL/empty → fallback literal.

    Reference: src/reference_data.py:103-105,139-140."""
    c = F.col(col) if isinstance(col, str) else col
    u = F.upper(F.trim(c))
    return F.when(u.isNull() | (u == ""), F.lit(fallback)).otherwise(u)


@pandas_udf(StringType())
def strip_accents(s: pd.Series) -> pd.Series:
    """F6: NFD-normalize and drop combining marks ('São Paulo' → 'Sao Paulo').

    The reference's ONLY per-row Python UDF (src/reference_data.py:122-146);
    here Arrow-vectorized: one pandas str pipeline per batch, no row loop."""
    return (
        s.str.normalize("NFD")
        .str.encode("ascii", "ignore")
        .str.decode("ascii")
    )


def strip_control_bytes(col: Column | str) -> Column:
    """F7+F8: drop NUL bytes and a UTF-8 BOM prefix.

    Reference: \\x00 strip before COPY (src/database/postgres.py:244,358),
    BOM strip on the SERPRO download (src/reference_data.py:47-49)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.regexp_replace(c, "\\u0000", ""), "^\\uFEFF", "")


def audit_timestamp() -> Column:
    """F10: engine-stamped update time (reference: data_atualizacao =
    CURRENT_TIMESTAMP, src/database/postgres.py:284,415,460). Excluded from
    replay-equality comparisons (nondeterministic by nature)."""
    return F.current_timestamp()


def packed_codes_to_array(col: Column | str) -> Column:
    """The secondary-CNAE split the reference documents but never ships
    (docs/data-schema/field-mappings.md:79-83): 'a,b,c' → array<string>,
    NULL/empty → empty array. Provided as the engine's array-typed upgrade."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNull() | (F.trim(c) == ""), F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(c), r"\s*,\s*"))
