"""TransformSpec catalog + file-type classifier (SURVEY P6, §2.8)."""

from __future__ import annotations

import pytest

from cnpj_data_pipeline_spark.sources.specs import (
    EMPRESA_SPEC,
    ESTABELECIMENTO_SPEC,
    SIMPLES_SPEC,
    SOCIO_SPEC,
    spec_for_filename,
)


def test_classifier_routes_reference_filenames():
    cases = {
        "K3241.K03200Y0.D50510.EMPRECSV": ("EMPRECSV", EMPRESA_SPEC),
        "K3241.K03200Y1.D50510.ESTABELE": ("ESTABELE", ESTABELECIMENTO_SPEC),
        "K3241.K03200Y2.D50510.SOCIOCSV": ("SOCIOCSV", SOCIO_SPEC),
        "F.K03200$W.SIMPLES.CSV.D50510.SIMPLESCSV": ("SIMPLESCSV", SIMPLES_SPEC),
        "F.K03200$Z.D50510.CNAECSV": ("CNAECSV", None),
    }
    for fname, (ftype, spec) in cases.items():
        got_type, got_spec = spec_for_filename(fname)
        assert got_type == ftype
        if spec is not None:
            assert got_spec is spec


def test_classifier_rejects_unknown():
    with pytest.raises(ValueError, match="no TransformSpec"):
        spec_for_filename("random.parquet")


def test_spec_shapes_match_reference_catalog():
    # widths from src/processor.py:27-97
    assert len(EMPRESA_SPEC.names) == 7
    assert len(ESTABELECIMENTO_SPEC.names) == 30
    assert len(SOCIO_SPEC.names) == 11
    assert len(SIMPLES_SPEC.names) == 7
    assert EMPRESA_SPEC.numeric == ("capital_social",)
    assert "data_entrada_sociedade" in SOCIO_SPEC.dates
    assert len(SIMPLES_SPEC.dates) == 4
