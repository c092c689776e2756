"""Concrete per-file-type TransformSpecs — the reference's hand-maintained
parse catalog shipped as data (SURVEY P6 + §2.8).

Reference: ``COLUMN_MAPPINGS`` / ``NUMERIC_COLUMNS`` / ``DATE_COLUMNS``
(src/processor.py:27-122) and the filename→file-type classifier
(src/processor.py:16-25,124-141). One :class:`TransformSpec` per file type;
``spec_for_filename`` routes a raw file name to its spec the same way the
reference sniffs the type token out of the zip member name.
"""

from __future__ import annotations

from cnpj_data_pipeline_spark.sources.csv_source import TransformSpec

# Reference/code tables (CNAECSV MOTICSV MUNICCSV NATJUCSV PAISCSV QUALSCSV
# all share the 2-column shape, src/processor.py:28-34)
REFERENCE_CODE_SPEC = TransformSpec(names=("codigo", "descricao"))

# src/processor.py:35-43 (+ NUMERIC_COLUMNS src/processor.py:99-104)
EMPRESA_SPEC = TransformSpec(
    names=(
        "cnpj_basico",
        "razao_social",
        "natureza_juridica",
        "qualificacao_responsavel",
        "capital_social",
        "porte",
        "ente_federativo_responsavel",
    ),
    numeric=("capital_social",),
)

# src/processor.py:44-75 (+ DATE_COLUMNS src/processor.py:107-112)
ESTABELECIMENTO_SPEC = TransformSpec(
    names=(
        "cnpj_basico",
        "cnpj_ordem",
        "cnpj_dv",
        "identificador_matriz_filial",
        "nome_fantasia",
        "situacao_cadastral",
        "data_situacao_cadastral",
        "motivo_situacao_cadastral",
        "nome_cidade_exterior",
        "pais",
        "data_inicio_atividade",
        "cnae_fiscal_principal",
        "cnae_fiscal_secundaria",
        "tipo_logradouro",
        "logradouro",
        "numero",
        "complemento",
        "bairro",
        "cep",
        "uf",
        "municipio",
        "ddd_1",
        "telefone_1",
        "ddd_2",
        "telefone_2",
        "ddd_fax",
        "fax",
        "correio_eletronico",
        "situacao_especial",
        "data_situacao_especial",
    ),
    dates=(
        "data_situacao_cadastral",
        "data_inicio_atividade",
        "data_situacao_especial",
    ),
)

# src/processor.py:76-88 (+ DATE_COLUMNS src/processor.py:118-120); the
# reference table has NO primary key — ingest it as a keyless append-only
# lake table (src/database/postgres.py:213-214, init-db/postgres.sql:104-119)
SOCIO_SPEC = TransformSpec(
    names=(
        "cnpj_basico",
        "identificador_de_socio",
        "nome_socio",
        "cnpj_cpf_do_socio",
        "qualificacao_do_socio",
        "data_entrada_sociedade",
        "pais",
        "representante_legal",
        "nome_do_representante",
        "qualificacao_do_representante_legal",
        "faixa_etaria",
    ),
    dates=("data_entrada_sociedade",),
)

# src/processor.py:89-97 (+ DATE_COLUMNS src/processor.py:113-117)
SIMPLES_SPEC = TransformSpec(
    names=(
        "cnpj_basico",
        "opcao_pelo_simples",
        "data_opcao_pelo_simples",
        "data_exclusao_do_simples",
        "opcao_pelo_mei",
        "data_opcao_pelo_mei",
        "data_exclusao_do_mei",
    ),
    dates=(
        "data_opcao_pelo_simples",
        "data_exclusao_do_simples",
        "data_opcao_pelo_mei",
        "data_exclusao_do_mei",
    ),
)

# file-type token → spec (reference file names embed the token, e.g.
# 'K3241.K03200Y0.D50510.EMPRECSV'; src/processor.py:16-25)
FILE_TYPE_SPECS: dict[str, TransformSpec] = {
    "CNAECSV": REFERENCE_CODE_SPEC,
    "MOTICSV": REFERENCE_CODE_SPEC,
    "MUNICCSV": REFERENCE_CODE_SPEC,
    "NATJUCSV": REFERENCE_CODE_SPEC,
    "PAISCSV": REFERENCE_CODE_SPEC,
    "QUALSCSV": REFERENCE_CODE_SPEC,
    "EMPRECSV": EMPRESA_SPEC,
    "ESTABELE": ESTABELECIMENTO_SPEC,
    "SOCIOCSV": SOCIO_SPEC,
    "SIMPLESCSV": SIMPLES_SPEC,
}


def spec_for_filename(name: str) -> tuple[str, TransformSpec]:
    """P6 classifier: route a raw file name to (file_type, spec) by the
    longest matching type token (SIMPLESCSV before SOCIOCSV-style clashes
    can't happen — tokens are disjoint substrings, but longest-first keeps
    it robust)."""
    upper = name.upper()
    for token in sorted(FILE_TYPE_SPECS, key=len, reverse=True):
        if token in upper:
            return token, FILE_TYPE_SPECS[token]
    raise ValueError(f"no TransformSpec matches file name {name!r}")
