"""SQL DML surface: MERGE INTO / INSERT INTO statements compiling to
apply_changes (lake/dml.py). The reference's consumers write SQL — its
ingest IS text SQL (INSERT ... ON CONFLICT DO UPDATE,
src/database/postgres.py:269-531); these tests prove a pure-SQL writer
drives the same gated apply (exactly-once ledger, LWW fold, atomic
commit) as the Python API, and that the statement's output state is
bit-equal to apply_changes over the same batch."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyspark.sql.types as T
import pytest

from cnpj_data_pipeline_spark import (
    EngineConfig,
    LakeTable,
    apply_changes,
    merge_into,
)
from cnpj_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA

KEY = ["conv_id", "turn_idx"]
CFG = EngineConfig(n_buckets=4, salt_factor=1, compact_threshold=None)
TS = dt.datetime(2026, 1, 1)


def _batch_df(spark, rows):
    sch = T.StructType(
        list(TRANSCRIPT_SCHEMA.fields)
        + [
            T.StructField("op", T.StringType(), False),
            T.StructField("lsn", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(rows, sch)


ROWS0 = [
    ("a", 0, "user", "hi", None, TS, "I", 1),
    ("b", 0, "user", "yo", None, TS, "I", 2),
    ("a", 1, "assistant", "hello", "search", TS, "I", 3),
]
ROWS1 = [
    ("a", 0, "user", "hi-edited", None, TS, "U", 4),
    ("b", 0, None, None, None, None, "D", 5),
    ("c", 0, "user", "new", None, TS, "I", 6),
]


def _mk(spark, root):
    t = LakeTable.create(str(root), TRANSCRIPT_SCHEMA, KEY, CFG.n_buckets)
    apply_changes(spark, t, _batch_df(spark, ROWS0), epoch=0, cfg=CFG)
    return t


MERGE = """
    MERGE INTO transcripts AS t
    USING batch AS s
    ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
    WHEN MATCHED AND s.op = 'D' THEN DELETE
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *
"""


def test_merge_into_equals_python_apply(spark, tmp_path):
    t_sql = _mk(spark, tmp_path / "sql")
    t_py = _mk(spark, tmp_path / "py")
    _batch_df(spark, ROWS1).createOrReplaceTempView("batch")
    m = merge_into(
        spark, MERGE, {"transcripts": t_sql}, epoch=1, cfg=CFG
    )
    assert m["rows_applied"] > 0 and not m["skipped"]
    apply_changes(spark, t_py, _batch_df(spark, ROWS1), epoch=1, cfg=CFG)
    got = t_sql.read(spark).orderBy(*KEY).toPandas().reset_index(drop=True)
    want = t_py.read(spark).orderBy(*KEY).toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert set(got["conv_id"]) == {"a", "c"}  # b deleted
    # exactly-once: replaying the SAME statement+epoch is a skip
    m2 = merge_into(spark, MERGE, {"transcripts": t_sql}, epoch=1, cfg=CFG)
    assert m2["skipped"]


def test_merge_using_subquery(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    _batch_df(spark, ROWS1).createOrReplaceTempView("raw_feed")
    stmt = """
        MERGE INTO transcripts t
        USING (SELECT * FROM raw_feed WHERE conv_id <> 'c') s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN MATCHED AND s.op = 'D' THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    """
    merge_into(spark, stmt, {"transcripts": t}, epoch=1, cfg=CFG)
    got = t.read(spark).orderBy(*KEY).toPandas()
    assert set(got["conv_id"]) == {"a"}  # b deleted, c filtered out
    assert got[got["turn_idx"] == 0]["text"].iloc[0] == "hi-edited"


def test_merge_matched_only_restricts_to_existing_keys(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    _batch_df(spark, ROWS1).createOrReplaceTempView("batch")
    stmt = """
        MERGE INTO transcripts AS t USING batch AS s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN MATCHED AND s.op = 'D' THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
    """
    merge_into(spark, stmt, {"transcripts": t}, epoch=1, cfg=CFG)
    got = t.read(spark).orderBy(*KEY).toPandas()
    # no INSERT clause: ('c', 0) must NOT appear; updates/deletes applied
    assert set(got["conv_id"]) == {"a"}
    assert got[got["turn_idx"] == 0]["text"].iloc[0] == "hi-edited"


def test_insert_into_keyless_append(spark, tmp_path):
    t = LakeTable.create(
        str(tmp_path / "log"), TRANSCRIPT_SCHEMA, None, CFG.n_buckets
    )
    _batch_df(spark, ROWS0).drop("op").createOrReplaceTempView("src_rows")
    m = merge_into(
        spark,
        "INSERT INTO log SELECT * FROM src_rows",
        {"log": t}, epoch=0, cfg=CFG,
    )
    assert m["rows_applied"] == 3
    assert t.read(spark).count() == 3


def test_merge_validation(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    _batch_df(spark, ROWS1).createOrReplaceTempView("batch")
    tables = {"transcripts": t}
    with pytest.raises(ValueError, match="exactly the table key"):
        merge_into(spark, """
            MERGE INTO transcripts t USING batch s
            ON t.conv_id = s.conv_id
            WHEN MATCHED THEN UPDATE SET *
        """, tables, epoch=9, cfg=CFG)
    with pytest.raises(ValueError, match="UPDATE SET"):
        merge_into(spark, """
            MERGE INTO transcripts t USING batch s
            ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
            WHEN NOT MATCHED THEN INSERT *
        """, tables, epoch=9, cfg=CFG)
    with pytest.raises(ValueError, match="partial-update"):
        merge_into(spark, """
            MERGE INTO transcripts t USING batch s
            ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
            WHEN MATCHED THEN UPDATE SET text = s.text
        """, tables, epoch=9, cfg=CFG)
    with pytest.raises(ValueError, match="unknown DML target"):
        merge_into(spark, MERGE, {"other": t}, epoch=9, cfg=CFG)
    with pytest.raises(ValueError, match="lsn"):
        spark.sql("SELECT 'x' AS conv_id, 0 AS turn_idx").createOrReplaceTempView(
            "nolsn"
        )
        merge_into(spark, """
            MERGE INTO transcripts t USING nolsn s
            ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
            WHEN MATCHED THEN UPDATE SET *
        """, tables, epoch=9, cfg=CFG)
    with pytest.raises(ValueError, match="unsupported WHEN"):
        merge_into(
            spark,
            MERGE + " WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *",
            tables, epoch=9, cfg=CFG,
        )


def test_merge_column_subset_patch_on_partial_engine(spark, tmp_path):
    t = LakeTable.create(
        str(tmp_path / "p"), TRANSCRIPT_SCHEMA, KEY, CFG.n_buckets,
        merge_engine="partial",
    )
    apply_changes(spark, t, _batch_df(spark, ROWS0), epoch=0, cfg=CFG)
    _batch_df(
        spark, [("a", 0, "ignored", "patched", "tool-x", TS, "U", 9)]
    ).createOrReplaceTempView("patch")
    stmt = """
        MERGE INTO transcripts t USING patch s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN MATCHED THEN UPDATE SET text = s.text, tool = s.tool
        WHEN NOT MATCHED THEN INSERT *
    """
    merge_into(spark, stmt, {"transcripts": t}, epoch=1, cfg=CFG)
    got = (
        t.read(spark)
        .filter("conv_id = 'a' and turn_idx = 0")
        .toPandas()
        .iloc[0]
    )
    # patched columns updated, untouched column keeps its old value
    assert got["text"] == "patched" and got["tool"] == "tool-x"
    assert got["role"] == "user"


def test_delete_where_payload_predicate(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    m = merge_into(
        spark,
        "DELETE FROM transcripts WHERE role = 'assistant'",
        {"transcripts": t}, epoch=1, cfg=CFG,
    )
    assert m["rows_applied"] == 1 and not m["skipped"]
    got = t.read(spark).orderBy(*KEY).toPandas()
    assert list(zip(got["conv_id"], got["turn_idx"])) == [("a", 0), ("b", 0)]
    # exactly-once: same statement + epoch replays as a skip
    m2 = merge_into(
        spark,
        "DELETE FROM transcripts WHERE role = 'assistant'",
        {"transcripts": t}, epoch=1, cfg=CFG,
    )
    assert m2["skipped"]


def test_delete_where_key_predicate(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    merge_into(
        spark,
        "DELETE FROM transcripts AS t WHERE t.conv_id = 'a'",
        {"transcripts": t}, epoch=1, cfg=CFG,
    )
    got = t.read(spark).toPandas()
    assert set(got["conv_id"]) == {"b"}


def test_update_expression_and_lww_fold(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    m = merge_into(
        spark,
        """UPDATE transcripts
           SET text = concat(text, '!'), tool = 'audited'
           WHERE conv_id = 'a'""",
        {"transcripts": t}, epoch=1, cfg=CFG,
    )
    assert m["rows_applied"] == 2
    got = t.read(spark).orderBy(*KEY).toPandas()
    a_rows = got[got["conv_id"] == "a"]
    assert list(a_rows["text"]) == ["hi!", "hello!"]
    assert set(a_rows["tool"]) == {"audited"}
    # untouched row unchanged
    assert got[got["conv_id"] == "b"]["text"].iloc[0] == "yo"
    # the statement's LSN beats every applied LSN: a later stream UPDATE at
    # a HIGHER lsn still wins over it
    apply_changes(
        spark, t,
        _batch_df(spark, [("a", 0, "user", "stream-wins", None, TS, "U", 99)]),
        epoch=2, cfg=CFG,
    )
    assert (
        t.read(spark).filter("conv_id='a' and turn_idx=0")
        .toPandas()["text"].iloc[0] == "stream-wins"
    )


def test_update_column_patch_on_partial_engine(spark, tmp_path):
    t = LakeTable.create(
        str(tmp_path / "p"), TRANSCRIPT_SCHEMA, KEY, CFG.n_buckets,
        merge_engine="partial",
    )
    apply_changes(spark, t, _batch_df(spark, ROWS0), epoch=0, cfg=CFG)
    merge_into(
        spark,
        "UPDATE transcripts SET tool = 'patched' WHERE conv_id = 'a'",
        {"transcripts": t}, epoch=1, cfg=CFG,
    )
    got = t.read(spark).filter("conv_id = 'a'").orderBy(*KEY).toPandas()
    assert set(got["tool"]) == {"patched"}
    # untouched columns keep their own values under the partial fold
    assert list(got["text"]) == ["hi", "hello"]
    assert list(got["role"]) == ["user", "assistant"]


def test_update_delete_validation(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    tables = {"transcripts": t}
    with pytest.raises(ValueError, match="key column"):
        merge_into(
            spark,
            "UPDATE transcripts SET conv_id = 'z' WHERE turn_idx = 0",
            tables, epoch=9, cfg=CFG,
        )
    with pytest.raises(ValueError, match="unknown column"):
        merge_into(
            spark,
            "UPDATE transcripts SET nope = 'z' WHERE turn_idx = 0",
            tables, epoch=9, cfg=CFG,
        )
    with pytest.raises(ValueError, match="unknown alias"):
        merge_into(
            spark,
            "UPDATE transcripts AS t SET x.text = 'z' WHERE turn_idx = 0",
            tables, epoch=9, cfg=CFG,
        )
    keyless = LakeTable.create(
        str(tmp_path / "log"), TRANSCRIPT_SCHEMA, None, CFG.n_buckets
    )
    with pytest.raises(ValueError, match="keyless"):
        merge_into(
            spark, "DELETE FROM log WHERE role = 'user'",
            {"log": keyless}, epoch=9, cfg=CFG,
        )
    with pytest.raises(ValueError, match="keyless"):
        merge_into(
            spark, "UPDATE log SET text = 'x' WHERE role = 'user'",
            {"log": keyless}, epoch=9, cfg=CFG,
        )
    # a WHERE-less DELETE/UPDATE does not parse (full-table mutations must
    # say WHERE true explicitly)
    with pytest.raises(ValueError, match="expected"):
        merge_into(spark, "DELETE FROM transcripts", tables, epoch=9, cfg=CFG)


def test_update_renamed_column_uses_logical_name(spark, tmp_path):
    """A renamed column is assignable (and only assignable) under its
    current LOGICAL name — the name every other surface speaks."""
    t = _mk(spark, tmp_path / "t")
    t.rename_column("tool", "tool_name")
    merge_into(
        spark,
        "UPDATE transcripts SET tool_name = 'calc' WHERE conv_id = 'a'",
        {"transcripts": t}, epoch=1, cfg=CFG,
    )
    got = t.read(spark).orderBy(*KEY).toPandas()
    assert list(got.columns)[:5] == [
        "conv_id", "turn_idx", "role", "text", "tool_name",
    ]
    assert list(got[got["conv_id"] == "a"]["tool_name"]) == ["calc", "calc"]
    # the stale physical name is refused loudly, not half-applied
    with pytest.raises(ValueError, match="unknown column"):
        merge_into(
            spark,
            "UPDATE transcripts SET tool = 'x' WHERE conv_id = 'a'",
            {"transcripts": t}, epoch=2, cfg=CFG,
        )


def test_alias_stripping_is_quote_aware(spark, tmp_path):
    """Alias qualifiers are stripped OUTSIDE string literals only: a
    predicate literal containing '<alias>.' must survive verbatim."""
    t = _mk(spark, tmp_path / "t")
    apply_changes(
        spark, t,
        _batch_df(spark, [("d", 0, "user", "u.s.a.", None, TS, "I", 7)]),
        epoch=1, cfg=CFG,
    )
    # alias 's' appears inside the literal: pre-fix this deleted nothing
    # (literal corrupted to 'u.a.'); post-fix it deletes exactly row d/0
    merge_into(
        spark,
        "DELETE FROM transcripts AS s WHERE s.text = 'u.s.a.'",
        {"transcripts": t}, epoch=2, cfg=CFG,
    )
    got = t.read(spark).toPandas()
    assert "d" not in set(got["conv_id"]) and len(got) == 3

    # UPDATE SET rhs literal with alias-dot inside survives too
    merge_into(
        spark,
        "UPDATE transcripts AS s SET text = 's. holmes' "
        "WHERE s.conv_id = 'b'",
        {"transcripts": t}, epoch=3, cfg=CFG,
    )
    got = t.read(spark).toPandas()
    assert list(got[got["conv_id"] == "b"]["text"]) == ["s. holmes"]


MERGE_SYNC = """
    MERGE INTO transcripts AS t
    USING batch AS s
    ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *
    WHEN NOT MATCHED BY SOURCE THEN DELETE
"""


def test_merge_not_matched_by_source_full_sync(spark, tmp_path):
    """The full-snapshot-sync clause: after the MERGE, the table's key set
    equals the source's — upserts applied, absent keys tombstoned."""
    t = _mk(spark, tmp_path / "t")
    # snapshot source: keeps a/0 (edited), keeps a/1, drops b/0, adds c/0
    snap = [
        ("a", 0, "user", "hi-sync", None, TS, "U", 10),
        ("a", 1, "assistant", "hello", "search", TS, "U", 11),
        ("c", 0, "user", "new", None, TS, "I", 12),
    ]
    _batch_df(spark, snap).createOrReplaceTempView("batch")
    merge_into(spark, MERGE_SYNC, {"transcripts": t}, epoch=1, cfg=CFG)
    got = t.read(spark).orderBy(*KEY).toPandas()
    assert [tuple(r) for r in got[["conv_id", "turn_idx"]].values] == [
        ("a", 0), ("a", 1), ("c", 0),
    ]
    assert list(got["text"]) == ["hi-sync", "hello", "new"]
    # idempotent re-apply of the same epoch is a ledger no-op
    m = merge_into(spark, MERGE_SYNC, {"transcripts": t}, epoch=1, cfg=CFG)
    assert m["skipped"]
    # re-running as a NEW epoch is also a fixpoint (sync of a synced table)
    merge_into(spark, MERGE_SYNC, {"transcripts": t}, epoch=2, cfg=CFG)
    got2 = t.read(spark).orderBy(*KEY).toPandas()
    assert list(got2["text"]) == ["hi-sync", "hello", "new"]


def test_merge_by_source_respects_matched_only_form(spark, tmp_path):
    """BY SOURCE composes with a matched-only merge (no INSERT clause):
    unmatched source keys are dropped, absent target keys tombstoned."""
    t = _mk(spark, tmp_path / "t")
    snap = [
        ("a", 0, "user", "hi-2", None, TS, "U", 10),
        ("z", 9, "user", "ghost", None, TS, "U", 11),  # not in target
    ]
    _batch_df(spark, snap).createOrReplaceTempView("batch")
    merge_into(
        spark,
        """MERGE INTO transcripts AS t USING batch AS s
           ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED BY SOURCE THEN DELETE""",
        {"transcripts": t}, epoch=1, cfg=CFG,
    )
    got = t.read(spark).orderBy(*KEY).toPandas()
    # a/0 updated; b/0 and a/1 tombstoned (absent from source); z/9 dropped
    assert [tuple(r) for r in got[["conv_id", "turn_idx"]].values] == [
        ("a", 0),
    ]
    assert list(got["text"]) == ["hi-2"]


def test_bare_relation_names_as_qualifiers(spark, tmp_path):
    """With no alias declared, standard SQL qualifies columns by the
    relation name itself — accepted across MERGE ON, DELETE and UPDATE."""
    t = _mk(spark, tmp_path / "t")
    _batch_df(spark, ROWS1).createOrReplaceTempView("batch")
    merge_into(
        spark,
        """MERGE INTO transcripts USING batch
           ON transcripts.conv_id = batch.conv_id
              AND transcripts.turn_idx = batch.turn_idx
           WHEN MATCHED AND batch.op = 'D' THEN DELETE
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
        {"transcripts": t}, epoch=1, cfg=CFG,
    )
    got = t.read(spark).orderBy(*KEY).toPandas()
    assert list(got["text"]) == ["hi-edited", "hello", "new"]
    merge_into(
        spark,
        "UPDATE transcripts SET text = concat(transcripts.text, '!') "
        "WHERE transcripts.conv_id = 'c'",
        {"transcripts": t}, epoch=2, cfg=CFG,
    )
    merge_into(
        spark,
        "DELETE FROM transcripts WHERE transcripts.conv_id = 'a' "
        "AND transcripts.turn_idx = 1",
        {"transcripts": t}, epoch=3, cfg=CFG,
    )
    got = t.read(spark).orderBy(*KEY).toPandas()
    assert list(got["text"]) == ["hi-edited", "new!"]


def test_merge_delete_condition_refuses_target_qualifiers(spark, tmp_path):
    """WHEN MATCHED AND <cond> THEN DELETE evaluates over the SOURCE row;
    a target-qualified reference used to be silently stripped and
    re-evaluated against the source's same-named column (wrong rows
    deleted, no error) — it is now refused loudly, for both the explicit
    alias and the bare target name."""
    t = _mk(spark, tmp_path / "t")
    _batch_df(spark, ROWS1).createOrReplaceTempView("batch")
    for qual in ("t.role", "transcripts.role"):
        with pytest.raises(ValueError, match="SOURCE columns"):
            merge_into(
                spark,
                f"""
                MERGE INTO transcripts AS t USING batch AS s
                ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
                WHEN MATCHED AND {qual} = 'obsolete' THEN DELETE
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *
                """,
                {"transcripts": t},
                epoch=1,
                cfg=CFG,
            )
    # a target-alias-looking token inside a STRING LITERAL is fine
    m = merge_into(
        spark,
        """
        MERGE INTO transcripts AS t USING batch AS s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN MATCHED AND s.op = 'D'
            AND (s.text IS NULL OR s.text != 't. marker') THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """,
        {"transcripts": t},
        epoch=1,
        cfg=CFG,
    )
    assert not m["skipped"]
    keys = {
        (r["conv_id"], r["turn_idx"]) for r in t.read(spark).collect()
    }
    assert ("b", 0) not in keys and ("c", 0) in keys


def test_update_set_literal_containing_where(spark, tmp_path):
    """The SET/WHERE split is quote- and paren-aware: a string literal
    containing the word WHERE (or parens) must not cut the statement."""
    t = _mk(spark, tmp_path / "t")
    m = merge_into(
        spark,
        "UPDATE transcripts SET text = 'fix WHERE clause (v2)' "
        "WHERE conv_id = 'a' AND turn_idx = 0",
        {"transcripts": t},
        epoch=1,
        cfg=CFG,
    )
    assert m["rows_applied"] == 1
    rows = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in t.read(spark).collect()
    }
    assert rows[("a", 0)] == "fix WHERE clause (v2)"
    with pytest.raises(ValueError, match="WHERE"):
        merge_into(
            spark,
            "UPDATE transcripts SET text = 'no predicate'",
            {"transcripts": t},
            epoch=2,
            cfg=CFG,
        )
