"""ZIP source (SURVEY S4): distributed member filter + extraction +
zipped-CSV spec parse."""

from __future__ import annotations

import zipfile

from pyspark.sql import functions as F

from cnpj_data_pipeline_spark.sources.specs import EMPRESA_SPEC
from cnpj_data_pipeline_spark.sources.zip_source import (
    read_zip_members,
    read_zipped_csv_batch,
)

EMP_LINES = "\n".join(
    [
        "00000001;EMPRESA AÇÃO LTDA;2001;05;1234,56;01;",
        "00000002;CAFÉ NAÏVE SA;2002;07;0,99;;",
    ]
)
OTHER_LINES = "ignored;member"


def _mk_zip(tmp_path) -> str:
    z = tmp_path / "K3241.D50510.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("K3241.K03200Y0.D50510.EMPRECSV", EMP_LINES.encode("ISO-8859-1"))
        zf.writestr("K3241.K03200Y0.D50510.SOCIOCSV", OTHER_LINES.encode("ISO-8859-1"))
    return str(z)


def test_member_filter_and_extraction(spark, tmp_path):
    z = _mk_zip(tmp_path)
    rows = read_zip_members(spark, z, r"EMPRECSV$").collect()
    assert len(rows) == 1
    assert rows[0].member.endswith("EMPRECSV")
    assert rows[0].content.decode("ISO-8859-1").startswith("00000001;EMPRESA AÇÃO")


def test_zipped_csv_parse_types_and_nulls(spark, tmp_path):
    z = _mk_zip(tmp_path)
    df = read_zipped_csv_batch(spark, z, EMPRESA_SPEC, r"EMPRECSV$").orderBy(
        "cnpj_basico"
    )
    got = df.collect()
    assert [r.cnpj_basico for r in got] == ["00000001", "00000002"]
    # ISO-8859-1 accents decoded
    assert got[0].razao_social == "EMPRESA AÇÃO LTDA"
    assert got[1].razao_social == "CAFÉ NAÏVE SA"
    # decimal-comma numeric parse (F1)
    assert got[0].capital_social == 1234.56
    assert got[1].capital_social == 0.99
    # ''→NULL
    assert got[1].porte is None
    assert got[0].ente_federativo_responsavel is None
    # pushdown-ish sanity: the non-matching member contributes no rows
    assert df.count() == 2
    assert df.filter(F.col("cnpj_basico").isNull()).count() == 0
