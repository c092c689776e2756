"""SQL-surface fuzz: seeded random mutations (truncate / inject / shuffle /
splice / unknown-table) of valid DDL and DML statements must fail CLOSED —
only ``ValueError`` (the surface's own refusal) or Spark's analysis/parse
errors for SELECT bodies may escape, never an AttributeError/TypeError from
a half-matched regex — and a failed statement must leave the live table
readable and its registry entry intact."""

from __future__ import annotations

import random

import pyspark.errors
import pytest

from cnpj_data_pipeline_spark.lake.ddl import execute_ddl, run_sql_script

CREATE = (
    "CREATE TABLE t1 (conv_id STRING, turn_idx INT, text STRING, "
    "ts TIMESTAMP, PRIMARY KEY (conv_id, turn_idx)) "
    "CLUSTERED BY (conv_id) INTO 4 BUCKETS LOCATION '{loc}'"
)

DDL = [
    "ALTER TABLE t1 RENAME COLUMN text TO body",
    "ALTER TABLE t1 ADD COLUMN extra STRING",
    "ALTER TABLE t1 SET TBLPROPERTIES ('k'='v')",
    "ALTER TABLE t1 WRITE ORDERED BY (ts)",
    "SHOW CREATE TABLE t1",
    "DESCRIBE EXTENDED t1",
    "VACUUM t1 RETAIN 2 SNAPSHOTS",
    "RESTORE TABLE t1 TO VERSION AS OF 0",
    "ALTER TABLE t1 CREATE TAG 'x'",
    "SHOW TAGS t1",
    "SHOW SNAPSHOTS t1",
]

# materialized-view statements join the pool with {mv} filled per test run;
# REFRESH/SHOW against a never-registered view must refuse with ValueError
DDL_MV = [
    "CREATE MATERIALIZED VIEW mv1 LOCATION '{mv}' AS SELECT conv_id, "
    "count(*) AS n, sum(length(text)) AS chars FROM t1 GROUP BY conv_id",
    "CREATE MATERIALIZED VIEW mv1 LOCATION '{mv}' AS SELECT conv_id, "
    "count(*) AS n, min(length(text)) AS lo FROM t1 GROUP BY conv_id",
    "REFRESH MATERIALIZED VIEW mv1",
    "SHOW CREATE MATERIALIZED VIEW mv1",
]

# round-5 statement families: CHECK constraints, GENERATED/DEFAULT
# columns, secondary indexes, consumer lag. The index statements target a
# never-registered name / unknown source so even an unmutated survivor
# refuses with ValueError instead of launching a sync job mid-fuzz.
DDL_R5 = [
    "ALTER TABLE t1 ADD CONSTRAINT c1 CHECK (turn_idx >= 0) "
    "ON VIOLATION DROP",
    "ALTER TABLE t1 ADD CONSTRAINT c2 CHECK (length(text) < 10000)",
    "ALTER TABLE t1 DROP CONSTRAINT IF EXISTS c1",
    "ALTER TABLE t1 ADD COLUMN day BIGINT GENERATED ALWAYS AS "
    "(CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT))",
    "ALTER TABLE t1 ADD COLUMN tag STRING DEFAULT ('v1')",
    "CREATE INDEX ix1 ON no_such USING NEARDUP (conv_id, text) "
    "LOCATION '{ix}'",
    "CREATE INDEX ix1 ON t1 USING BTREE (conv_id, text) LOCATION '{ix}'",
    "REFRESH INDEX ix1",
    "SHOW CREATE INDEX ix1",
    "SHOW CONSUMERS",
    # SCD2 history + ANALYZE (late round 5). The CREATE targets an unknown
    # source so even an unmutated survivor refuses instead of launching a
    # sync mid-fuzz; REFRESH/SHOW target a never-registered name.
    "CREATE HISTORY TABLE h1 ON no_such LOCATION '{ix}'",
    "REFRESH HISTORY TABLE h1",
    "SHOW CREATE HISTORY TABLE h1",
    "ANALYZE TABLE t1 COMPUTE STATISTICS FOR COLUMNS conv_id",
    "ANALYZE TABLE t1 COMPUTE STATISTICS INCREMENTAL",
]

DML = [
    "MERGE INTO t1 USING batch s ON t1.conv_id = s.conv_id AND "
    "t1.turn_idx = s.turn_idx WHEN MATCHED AND s.op = 'D' THEN DELETE "
    "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
    "UPDATE t1 SET text = upper(text) WHERE conv_id = 'a'",
    "DELETE FROM t1 WHERE turn_idx > 100",
    "SELECT conv_id, count(*) AS n FROM t1 GROUP BY conv_id",
    "INSERT INTO t1 SELECT conv_id, turn_idx, text, ts FROM t1 WHERE 1=0",
]

ALLOWED = (
    ValueError,
    pyspark.errors.AnalysisException,
    pyspark.errors.ParseException,
)


def _mutate(rng: random.Random, s: str) -> str:
    mode = rng.randrange(5)
    if mode == 0:
        return s[: rng.randrange(len(s))]
    if mode == 1:
        i = rng.randrange(len(s))
        return s[:i] + rng.choice("();',%$#@!*=") + s[i:]
    if mode == 2:
        toks = s.split(" ")
        rng.shuffle(toks)
        return " ".join(toks)
    if mode == 3:
        return s.replace("t1", "no_such_table")
    i, j = rng.randrange(len(s)), rng.randrange(len(s))
    return s[:i] + s[j:]


@pytest.mark.parametrize("seed", [7, 13])
def test_mutated_statements_fail_closed(spark, tmp_path, seed):
    rng = random.Random(seed)
    tables: dict = {}
    t = execute_ddl(spark, CREATE.format(loc=tmp_path / "t1"), tables)
    spark.createDataFrame(
        [("a", 0, "hi", None, "U", 1)],
        "conv_id string, turn_idx int, text string, ts timestamp, "
        "op string, lsn long",
    ).createOrReplaceTempView("batch")
    sid0 = t.current_snapshot_id()

    ddl_pool = (
        DDL
        + [s.format(mv=tmp_path / "mv1") for s in DDL_MV]
        + [
            s.format(ix=tmp_path / "ix1") if "{ix}" in s else s
            for s in DDL_R5
        ]
    )
    epoch = 100
    for trial in range(90):
        pool = ddl_pool if trial % 3 else DML
        s = _mutate(rng, rng.choice(pool))
        epoch += 1
        try:
            # fresh registry copy per trial so a SUCCESSFUL rename/tag
            # mutation can't drift the fixture statements out of date
            run_sql_script(
                spark, s + ";", dict(tables), epoch_base=epoch
            )
        except ALLOWED:
            pass
        # any other exception type propagates and fails the test

    # the live table survived every refusal: registry intact, still
    # readable, no phantom commits from failed statements beyond the
    # successful mutations' own metadata ops
    assert tables["t1"] is t
    assert t.read(spark).count() >= 0
    assert t.current_snapshot_id() >= sid0
