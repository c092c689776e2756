"""Unit tests for the transform spec (SURVEY F1-F10) and the CSV source,
mirroring the reference's sample-data edge cases (docs/sample-data/README.md)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark.functions.transforms import (
    clean_code,
    decimal_comma_to_double,
    normalize_description,
    packed_codes_to_array,
    strip_accents,
    strip_control_bytes,
    zero_date_to_null,
)
from cnpj_data_pipeline_spark.sources.csv_source import TransformSpec, read_csv_batch


def _one_col(spark, values, fn, out="v"):
    df = spark.createDataFrame([(v,) for v in values], ["c"])
    return [r[0] for r in df.select(fn(F.col("c")).alias(out)).collect()]


def test_decimal_comma(spark):
    vals = ["120000000000,00", "0,5", "7", "", "abc", None]
    out = _one_col(spark, vals, decimal_comma_to_double)
    assert out == [120000000000.0, 0.5, 7.0, None, None, None]


def test_zero_date(spark):
    vals = ["0", "00000000", "", "20210715", "19991231", None]
    out = _one_col(spark, vals, zero_date_to_null)
    assert out == [None, None, None, dt.date(2021, 7, 15), dt.date(1999, 12, 31), None]


def test_clean_code_pad(spark):
    vals = [" 5", "42", "5", "105", "x9", None]
    out = _one_col(spark, vals, lambda c: clean_code(c, width=2))
    assert out == ["05", "42", "05", "105", "x9", None]


def test_normalize_description(spark):
    vals = ["  são paulo ", "", None, "ok"]
    out = _one_col(spark, vals, normalize_description)
    assert out == ["SÃO PAULO", "DESCRIÇÃO INDISPONÍVEL", "DESCRIÇÃO INDISPONÍVEL", "OK"]


def test_strip_accents(spark):
    vals = ["São Paulo", "AÇÃO", "café naïve", "plain"]
    out = _one_col(spark, vals, strip_accents)
    assert out == ["Sao Paulo", "ACAO", "cafe naive", "plain"]


def test_strip_control_bytes(spark):
    vals = ["a\x00b", "﻿head", "clean"]
    out = _one_col(spark, vals, strip_control_bytes)
    assert out == ["ab", "head", "clean"]


def test_packed_codes_to_array(spark):
    vals = ["4721102,4789004", "123", "", None]
    out = _one_col(spark, vals, packed_codes_to_array)
    assert out == [["4721102", "4789004"], ["123"], [], []]


def test_csv_source_positional_spec(spark, tmp_path):
    # headerless ';'-separated ISO-8859-1, empty→NULL, decimal comma, zero-date,
    # plus an extra trailing column that must get the column_{i} fallback name.
    raw = "00000001;ACME AÇÚCAR;120,50;20200101;extra1\n00000002;;0,75;0;extra2\n00000003;X;;00000000;\n"
    p = tmp_path / "batch.csv"
    p.write_bytes(raw.encode("ISO-8859-1"))
    spec = TransformSpec(
        names=["id", "name", "capital", "opened"],
        numeric=["capital"],
        dates=["opened"],
    )
    df = read_csv_batch(spark, str(p), spec, input_width=5)
    assert df.columns == ["id", "name", "capital", "opened", "column_4"]
    rows = {r["id"]: r for r in df.collect()}
    assert rows["00000001"]["name"] == "ACME AÇÚCAR"
    assert rows["00000001"]["capital"] == 120.5
    assert rows["00000001"]["opened"] == dt.date(2020, 1, 1)
    assert rows["00000002"]["name"] is None
    assert rows["00000002"]["opened"] is None
    assert rows["00000003"]["capital"] is None
    assert rows["00000003"]["opened"] is None


def test_antijoin_enrichment(spark):
    from cnpj_data_pipeline_spark.operators.antijoin import (
        enrich_reference_codes,
        insert_if_absent,
    )

    official = spark.createDataFrame(
        [Row(codigo="01", descricao="EXISTING")],
    )
    external = spark.createDataFrame(
        [
            Row(codigo=" 1", descricao="duplicate of existing"),
            Row(codigo="7", descricao="  ação nova "),
            Row(codigo="7", descricao="dup within external"),
            Row(codigo="", descricao="dropped"),
        ]
    )
    out = enrich_reference_codes(official, external).orderBy("codigo").collect()
    assert [(r.codigo, r.descricao) for r in out] == [
        ("01", "EXISTING"),
        ("07", "ACAO NOVA"),
    ]

    existing = spark.createDataFrame([Row(k="a"), Row(k="b")])
    incoming = spark.createDataFrame([Row(k="b", v=1), Row(k="c", v=2), Row(k="c", v=3)])
    fresh = insert_if_absent(existing, incoming, ["k"]).collect()
    assert len(fresh) == 1 and fresh[0]["k"] == "c"
