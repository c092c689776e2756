"""Typed change feed (LakeTable.read_changes_typed): Delta-CDF-style rows
with pre/post images.

The plain change feed emits only NEW images (per-epoch LWW winners +
tombstones) — enough to replicate state, not enough to RETRACT: an
incremental aggregate consumer needs the old row to subtract its
contribution. ``read_changes_typed`` closes that gap with the
``readChangeFeed`` row shape: insert / update_preimage / update_postimage /
delete, computed for a net snapshot window.

Semantics under test, against an independent pandas referee:

- pre-image = the key's LWW state at the window-start snapshot; post-image =
  LWW(pre, window winners) — NOT merely the window winner: a late low-LSN
  replay that loses to pre-window state emits NOTHING (the table did not
  change);
- deletes carry the pre-image; inserts the post-image; updates both;
- additive schema evolution inside the window pads pre-images with NULL;
- a full-history window (from_snapshot=0) is pure inserts.
"""

from __future__ import annotations

import pandas as pd
import pytest

from cnpj_data_pipeline_spark import EngineConfig, LakeTable
from cnpj_data_pipeline_spark.gen import epoch_batches, gen_changes
from cnpj_data_pipeline_spark.lake.format import CHANGE_TYPE_COL
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA

KEY = ["conv_id", "turn_idx"]
ORDER_COLS = ["lsn", "ts", "op", "_text", "_tool", "_role"]


def _fold(raw: pd.DataFrame, payload: list[str]) -> pd.DataFrame:
    """Engine-order LWW winners INCLUDING tombstones (one row per key)."""
    df = raw.copy()
    for c in ("text", "tool", "role"):
        df[f"_{c}"] = df[c].fillna("") if c in df else ""
    df = df.sort_values(
        ORDER_COLS, ascending=[False] * len(ORDER_COLS), kind="mergesort"
    )
    out = df.drop_duplicates(subset=KEY, keep="first")
    return out[KEY + payload + ["op", "lsn"]].reset_index(drop=True)


def _typed_referee(
    raw: pd.DataFrame, boundary_epoch: int, payload: list[str]
) -> pd.DataFrame:
    """Independent pandas derivation of the typed feed for the window
    (state after ``boundary_epoch``] -> head."""
    pre = _fold(raw[raw["epoch"] <= boundary_epoch], payload)
    post = _fold(raw, payload)
    touched = raw[raw["epoch"] > boundary_epoch][KEY].drop_duplicates()
    pre_i = pre.set_index(["conv_id", "turn_idx"])
    post_i = post.set_index(["conv_id", "turn_idx"])
    rows = []

    def emit(img, ctype):
        rows.append({**{c: img[c] for c in payload}, "lsn": img["lsn"],
                     CHANGE_TYPE_COL: ctype,
                     "conv_id": img.name[0], "turn_idx": img.name[1]})

    for k in touched.itertuples(index=False):
        k = (k.conv_id, k.turn_idx)
        p = pre_i.loc[k] if k in pre_i.index else None
        q = post_i.loc[k]
        p_live = p is not None and p["op"] != "D"
        q_live = q["op"] != "D"
        changed = p is None or any(
            not (pd.isna(p[c]) and pd.isna(q[c])) and p[c] != q[c]
            for c in payload + ["op", "lsn"]
        )
        if not p_live and q_live:
            emit(q, "insert")
        elif p_live and q_live and changed:
            emit(p, "update_preimage")
            emit(q, "update_postimage")
        elif p_live and not q_live:
            emit(p, "delete")
    cols = KEY + payload + ["lsn", CHANGE_TYPE_COL]
    if not rows:
        return pd.DataFrame(columns=cols)
    return pd.DataFrame(rows)[cols]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(KEY + [CHANGE_TYPE_COL, "lsn"], kind="mergesort")
        .reset_index(drop=True)
    )


def _ingest(spark, root, ch, n_epochs, cfg, **kw):
    table = LakeTable.create(root, TRANSCRIPT_SCHEMA, KEY, cfg.n_buckets)
    sids = []
    for e, batch in epoch_batches(ch, n_epochs, **kw):
        sids.append(apply_changes(spark, table, batch, epoch=e, cfg=cfg)["snapshot_id"])
    return table, sids


PAYLOAD = ["role", "text", "tool", "ts"]


def test_typed_feed_matches_referee(spark, tmp_table):
    cfg = EngineConfig(n_buckets=8)
    ch = gen_changes(
        spark, n_events=4_000, n_convs=60, n_epochs=3,
        delete_ratio=0.15, late_ratio=0.10,
    )
    raw = ch.toPandas()
    table, sids = _ingest(spark, tmp_table, ch, 3, cfg)

    got = _norm(table.read_changes_typed(spark, sids[0]).toPandas())
    exp = _norm(_typed_referee(raw, 0, PAYLOAD))
    pd.testing.assert_frame_equal(
        got[exp.columns], exp, check_dtype=False
    )
    # every change type exercised at this size
    kinds = set(got[CHANGE_TYPE_COL])
    assert {"insert", "update_preimage", "update_postimage", "delete"} <= kinds
    # update images come in pairs
    ups = got[got[CHANGE_TYPE_COL].str.startswith("update_")]
    assert len(ups) % 2 == 0
    pre_n = (ups[CHANGE_TYPE_COL] == "update_preimage").sum()
    assert pre_n * 2 == len(ups)


def test_typed_feed_full_history_is_pure_inserts(spark, tmp_table):
    cfg = EngineConfig(n_buckets=4)
    ch = gen_changes(spark, n_events=1_500, n_convs=30, n_epochs=2)
    raw = ch.toPandas()
    table, _ = _ingest(spark, tmp_table, ch, 2, cfg)

    got = _norm(table.read_changes_typed(spark, 0).toPandas())
    assert set(got[CHANGE_TYPE_COL]) == {"insert"}
    exp = _norm(_typed_referee(raw, -1, PAYLOAD))
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_typed_feed_late_replay_emits_nothing(spark, tmp_table):
    """A window whose events ALL lose the LWW order to pre-window state (a
    late, lower-LSN replay of already-applied data) must emit zero typed
    rows — the table did not change, so no consumer should see a change."""
    cfg = EngineConfig(n_buckets=4)
    base = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": [0, 1, 0],
            "role": ["user"] * 3,
            "text": ["new-a", "new-b", "new-c"],
            "tool": [None] * 3,
            "ts": [pd.Timestamp("2026-01-02")] * 3,
            "op": ["I", "I", "I"],
            "lsn": [100, 101, 102],
        }
    )
    late = base.assign(
        text=["old-a", "old-b", "old-c"],
        ts=[pd.Timestamp("2026-01-01")] * 3,
        lsn=[1, 2, 3],
    )
    table = LakeTable.create(tmp_table, TRANSCRIPT_SCHEMA, KEY, 4)
    sid0 = apply_changes(
        spark, table, spark.createDataFrame(base), epoch=0, cfg=cfg
    )["snapshot_id"]
    apply_changes(spark, table, spark.createDataFrame(late), epoch=1, cfg=cfg)

    assert table.read_changes_typed(spark, sid0).count() == 0
    # the plain feed DOES carry the (losing) window rows — the typed feed is
    # the one that reflects net state change
    assert table.read_changes(spark, sid0).count() == 3


def test_typed_feed_pads_pre_evolution_preimages(spark, tmp_table):
    """Schema evolves inside the window: pre-images (written before the new
    column existed) read back with a NULL-padded evolved column."""
    cfg = EngineConfig(n_buckets=4)
    ch = gen_changes(
        spark, n_events=2_000, n_convs=40, n_epochs=2, evolve_at_epoch=1,
        delete_ratio=0.10,
    )
    raw = ch.toPandas()
    table, sids = _ingest(spark, tmp_table, ch, 2, cfg, drop_evolved_before=1)

    got = _norm(table.read_changes_typed(spark, sids[0]).toPandas())
    assert "tool_meta" in got.columns
    # referee: the sink never saw tool_meta for epoch-0 rows
    raw.loc[raw["epoch"] < 1, "tool_meta"] = None
    exp = _norm(_typed_referee(raw, 0, PAYLOAD + ["tool_meta"]))
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)
    # pre-images predate the evolution -> padded NULL
    pres = got[got[CHANGE_TYPE_COL] == "update_preimage"]
    assert len(pres) > 0 and pres["tool_meta"].isna().all()


def test_typed_feed_requires_keys(spark, tmp_path):
    from pyspark.sql import types as T

    table = LakeTable.create(
        str(tmp_path / "keyless"),
        T.StructType([T.StructField("v", T.StringType())]),
        None,
        4,
    )
    with pytest.raises(ValueError, match="key"):
        table.read_changes_typed(spark, 0)
