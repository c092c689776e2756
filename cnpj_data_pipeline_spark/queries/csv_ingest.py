"""End-to-end CSV-batch ingest demo: real-quirk bytes → TransformSpec scan →
lake tables (SURVEY S8/S9/P1/P6/F1/F2 exercised against actual ISO-8859-1,
headerless, ';'-separated, ''-as-NULL files — the reference's monthly batch
shape, src/processor.py:465-474 — not parquet).

Fixture synthesis is driver-side and deterministic (derived from the shared
``part`` table, bounded by sf): the files are the TEST INPUT, the operators
under test are the distributed scan + spec projection + merge. Two file
types flow through their catalog specs: EMPRECSV into a KEYED lake table
(decimal-comma capital_social, F1) and SOCIOCSV into a KEYLESS append-only
table (zero-tolerant dates, F2) — mirroring empresas-with-PK vs socios-no-PK
in the reference schema (init-db/postgres.sql:54,104-119).
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cnpj_data_pipeline_spark.config import EngineConfig
from cnpj_data_pipeline_spark.lake.format import LakeTable
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.queries.cdc import _mk_scratch
from cnpj_data_pipeline_spark.sources.csv_source import read_csv_batch
from cnpj_data_pipeline_spark.sources.specs import EMPRESA_SPEC, spec_for_filename
from cnpj_data_pipeline_spark.sources.zip_source import read_zipped_csv_batch

EMPRESA_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("cnpj_basico", T.StringType(), False),
        T.StructField("razao_social", T.StringType(), True),
        T.StructField("natureza_juridica", T.StringType(), True),
        T.StructField("qualificacao_responsavel", T.StringType(), True),
        T.StructField("capital_social", T.DoubleType(), True),
        T.StructField("porte", T.StringType(), True),
        T.StructField("ente_federativo_responsavel", T.StringType(), True),
    ]
)

SOCIO_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("cnpj_basico", T.StringType(), False),
        T.StructField("identificador_de_socio", T.StringType(), True),
        T.StructField("nome_socio", T.StringType(), True),
        T.StructField("cnpj_cpf_do_socio", T.StringType(), True),
        T.StructField("qualificacao_do_socio", T.StringType(), True),
        T.StructField("data_entrada_sociedade", T.DateType(), True),
        T.StructField("pais", T.StringType(), True),
        T.StructField("representante_legal", T.StringType(), True),
        T.StructField("nome_do_representante", T.StringType(), True),
        T.StructField("qualificacao_do_representante_legal", T.StringType(), True),
        T.StructField("faixa_etaria", T.StringType(), True),
    ]
)


def _partkeys(sf_dir: str) -> list[int]:
    import duckdb

    path = os.path.join(sf_dir, "part.parquet")
    src = path if os.path.isfile(path) else os.path.join(path, "*.parquet")
    return [
        r[0]
        for r in duckdb.sql(
            f"SELECT p_partkey FROM read_parquet('{src}') ORDER BY p_partkey"
        ).fetchall()
    ]


def _emp_line(i: int) -> str:
    capital = f"{i % 1000},{i % 100:02d}"
    porte = ["", "01", "03", "05"][i % 4]
    return ";".join(
        [
            f"{i % 100000000:08d}",
            f"EMPRESA AÇÃO {i % 7} LTDA",
            f"{2000 + i % 40}",
            f"{i % 50}",
            capital,
            porte,
            "",  # ente_federativo_responsavel: always empty → NULL
        ]
    )


def _soc_lines(i: int) -> list[str]:
    out = []
    js = [0] + ([1] if i % 6 == 0 else []) if i % 2 == 0 else []
    for j in js:
        if i % 5 == 0:
            d = "0"  # the reference's literal-zero date quirk
        elif i % 5 == 1:
            d = "00000000"
        else:
            d = f"2019{(i % 12) + 1:02d}{(i % 28) + 1:02d}"
        out.append(
            ";".join(
                [
                    f"{i % 100000000:08d}",
                    "2",
                    f"SÓCIO {j} GRUPO {i % 5}",
                    f"{(i * 7) % 100000000000:011d}",
                    f"{i % 30}",
                    d,
                    "",
                    "***000000**",
                    "",
                    "00",
                    f"{i % 9}",
                ]
            )
        )
    return out


_CSV_CACHE: dict[str, str] = {}  # sf_dir -> dir holding the synthesized files


def _synth_csv_batch(sf_dir: str) -> str:
    """Write the EMPRECSV/SOCIOCSV fixture files in ISO-8859-1, headerless,
    ';'-separated — byte-identical quirks to the reference's inputs."""
    d = _CSV_CACHE.get(sf_dir)
    if d and os.path.isdir(d):
        return d
    d = _mk_scratch("csv_batch_")
    keys = _partkeys(sf_dir)
    with open(
        os.path.join(d, "K3241.K03200Y0.D50510.EMPRECSV"),
        "w",
        encoding="ISO-8859-1",
        newline="\n",
    ) as f:
        for i in keys:
            f.write(_emp_line(i) + "\n")
    with open(
        os.path.join(d, "K3241.K03200Y0.D50510.SOCIOCSV"),
        "w",
        encoding="ISO-8859-1",
        newline="\n",
    ) as f:
        for i in keys:
            for line in _soc_lines(i):
                f.write(line + "\n")
    _CSV_CACHE[sf_dir] = d
    return d


_INGEST_CACHE: dict[str, str] = {}  # sf_dir -> lake root


def _csv_ingest(spark: SparkSession, sf_dir: str) -> str:
    """Scan both fixture files through their catalog specs and apply them to
    the lake (keyed MERGE for empresas, keyless append for socios)."""
    root = _INGEST_CACHE.get(sf_dir)
    if root and os.path.isdir(root):
        return root
    batch_dir = _synth_csv_batch(sf_dir)
    root = _mk_scratch("csv_lake_")
    cfg = EngineConfig(n_buckets=8, salt_factor=2)
    for fname in sorted(os.listdir(batch_dir)):
        ftype, spec = spec_for_filename(fname)  # P6 classifier
        df = read_csv_batch(spark, os.path.join(batch_dir, fname), spec)
        if ftype == "EMPRECSV":
            table = LakeTable.create(
                os.path.join(root, "empresas"),
                EMPRESA_TABLE_SCHEMA,
                key_cols=["cnpj_basico"],
                n_buckets=cfg.n_buckets,
            )
            ch = df.withColumn("op", F.lit("I")).withColumn(
                "lsn", F.col("cnpj_basico").cast("long")
            )
        else:  # SOCIOCSV → the keyless append-only path
            table = LakeTable.create(
                os.path.join(root, "socios"),
                SOCIO_TABLE_SCHEMA,
                key_cols=None,
                n_buckets=cfg.n_buckets,
            )
            ch = df.withColumn("op", F.lit("I")).withColumn(
                "lsn",
                F.col("cnpj_basico").cast("long") * 10
                + F.when(F.col("nome_socio").startswith("SÓCIO 1"), 1).otherwise(0),
            )
        apply_changes(spark, table, ch, epoch=0, cfg=cfg)
    _INGEST_CACHE[sf_dir] = root
    return root


def q_csv_batch_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV batch → spec scan → lake → read-back join: per empresa, its typed
    fields (decimal-comma double, ''→NULL porte) plus socio count and earliest
    zero-tolerant entry date from the keyless table."""
    root = _csv_ingest(spark, sf_dir)
    emp = LakeTable.load(os.path.join(root, "empresas")).read(spark)
    soc = LakeTable.load(os.path.join(root, "socios")).read(spark)
    stats = soc.groupBy("cnpj_basico").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("data_entrada_sociedade").alias("min_entrada"),
    )
    return (
        emp.select("cnpj_basico", "razao_social", "capital_social", "porte")
        .join(stats, "cnpj_basico", "left")
        .select(
            "cnpj_basico",
            "razao_social",
            "capital_social",
            "porte",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_socios"),
            "min_entrada",
        )
    )


_ZIP_CACHE: dict[str, str] = {}  # sf_dir -> zip archive path


def _synth_zip_batch(sf_dir: str) -> str:
    """Pack the fixture CSVs into a zip archive (the reference's monthly drop
    shape: one archive, members selected by filename token)."""
    z = _ZIP_CACHE.get(sf_dir)
    if z and os.path.isfile(z):
        return z
    import zipfile

    batch_dir = _synth_csv_batch(sf_dir)
    z = os.path.join(_mk_scratch("zip_batch_"), "K3241.K03200Y0.D50510.zip")
    with zipfile.ZipFile(z, "w", zipfile.ZIP_DEFLATED) as zf:
        for fname in sorted(os.listdir(batch_dir)):
            zf.write(os.path.join(batch_dir, fname), arcname=fname)
    _ZIP_CACHE[sf_dir] = z
    return z


def q_zip_member_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 end-to-end: binaryFile zip scan → in-executor member filter
    (EMPRECSV only — the SOCIOCSV member is never decompressed) → vectorized
    member CSV parse → spec projection. Typed output gated against a DuckDB
    derivation from the same source rows."""
    z = _synth_zip_batch(sf_dir)
    return read_zipped_csv_batch(
        spark, z, EMPRESA_SPEC, member_pattern=r"EMPRECSV$"
    )


QUERIES = {
    "q_csv_batch_ingest": q_csv_batch_ingest,
    "q_zip_member_scan": q_zip_member_scan,
}

ORACLES = {
    "q_csv_batch_ingest": """
        WITH emp AS (
          SELECT lpad(CAST(p_partkey % 100000000 AS VARCHAR), 8, '0') AS cnpj_basico,
                 'EMPRESA AÇÃO ' || CAST(p_partkey % 7 AS VARCHAR) || ' LTDA' AS razao_social,
                 try_cast(replace(
                   CAST(p_partkey % 1000 AS VARCHAR) || ',' ||
                   lpad(CAST(p_partkey % 100 AS VARCHAR), 2, '0'),
                   ',', '.') AS DOUBLE) AS capital_social,
                 CASE p_partkey % 4 WHEN 1 THEN '01' WHEN 2 THEN '03'
                      WHEN 3 THEN '05' ELSE NULL END AS porte,
                 p_partkey AS i
          FROM part
        ),
        soc AS (
          SELECT i FROM emp WHERE i % 2 = 0
          UNION ALL
          SELECT i FROM emp WHERE i % 6 = 0
        ),
        soc_dates AS (
          SELECT lpad(CAST(i % 100000000 AS VARCHAR), 8, '0') AS cnpj_basico,
                 CASE WHEN i % 5 IN (0, 1) THEN NULL
                      ELSE CAST(try_strptime(
                             '2019' || lpad(CAST((i % 12) + 1 AS VARCHAR), 2, '0')
                                    || lpad(CAST((i % 28) + 1 AS VARCHAR), 2, '0'),
                             '%Y%m%d') AS DATE) END AS d
          FROM soc
        ),
        stats AS (
          SELECT cnpj_basico, count(*) AS n, min(d) AS min_entrada
          FROM soc_dates GROUP BY cnpj_basico
        )
        SELECT e.cnpj_basico, e.razao_social, e.capital_social, e.porte,
               CAST(coalesce(s.n, 0) AS BIGINT) AS n_socios, s.min_entrada
        FROM emp e LEFT JOIN stats s ON e.cnpj_basico = s.cnpj_basico
    """,
    "q_zip_member_scan": """
        SELECT lpad(CAST(p_partkey % 100000000 AS VARCHAR), 8, '0') AS cnpj_basico,
               'EMPRESA AÇÃO ' || CAST(p_partkey % 7 AS VARCHAR) || ' LTDA' AS razao_social,
               CAST(2000 + p_partkey % 40 AS VARCHAR) AS natureza_juridica,
               CAST(p_partkey % 50 AS VARCHAR) AS qualificacao_responsavel,
               try_cast(replace(
                 CAST(p_partkey % 1000 AS VARCHAR) || ',' ||
                 lpad(CAST(p_partkey % 100 AS VARCHAR), 2, '0'),
                 ',', '.') AS DOUBLE) AS capital_social,
               CASE p_partkey % 4 WHEN 1 THEN '01' WHEN 2 THEN '03'
                    WHEN 3 THEN '05' ELSE NULL END AS porte,
               CAST(NULL AS VARCHAR) AS ente_federativo_responsavel
        FROM part
    """,
}
