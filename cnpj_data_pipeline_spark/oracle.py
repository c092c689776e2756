"""Single-threaded correctness oracle (pandas fold).

Plays the role the reference's Postgres plays for its pipeline: the independent
referee for final table state. Applies the change envelopes in a strict
deterministic total order and keeps the last writer per key:

    ORDER BY lsn DESC, ts DESC, op DESC, coalesce(text,'') DESC,
             coalesce(tool,'') DESC, coalesce(role,'') DESC        →  row 1 wins
    winner.op == 'D'  →  key absent from final state

This mirrors the reference's batched merge (``ROW_NUMBER() OVER (PARTITION BY pk
ORDER BY batch_row_num DESC) rn ... WHERE rn = 1`` then ``ON CONFLICT DO UPDATE``,
``src/database/postgres.py:478-501``), generalized with an explicit LSN and a
fully deterministic tie-break so replay equality is bit-for-bit.
"""

from __future__ import annotations

import pandas as pd

KEY = ["conv_id", "turn_idx"]
ORDER = ["lsn", "ts", "op", "_text_key", "_tool_key", "_role_key"]


def final_state(changes: pd.DataFrame, payload_cols: list[str] | None = None) -> pd.DataFrame:
    """Golden final state for a full change stream (any epoch interleaving —
    the engine must converge to this regardless of batching, late events, or
    replays)."""
    if payload_cols is None:
        payload_cols = [c for c in changes.columns if c not in ("op", "lsn", "epoch")]
    df = changes.copy()
    df["_text_key"] = df["text"].fillna("") if "text" in df else ""
    df["_tool_key"] = df["tool"].fillna("") if "tool" in df else ""
    df["_role_key"] = df["role"].fillna("") if "role" in df else ""
    df = df.sort_values(ORDER, ascending=[False] * len(ORDER), kind="mergesort")
    winners = df.drop_duplicates(subset=KEY, keep="first")
    alive = winners[winners["op"] != "D"]
    out = alive[payload_cols].sort_values(KEY, kind="mergesort").reset_index(drop=True)
    return out


def partial_final_state(
    changes: pd.DataFrame, payload_cols: list[str] | None = None
) -> pd.DataFrame:
    """Golden final state under the PARTIAL-update merge engine
    (``operators/partial.py``): per key, the newest tombstone LSN is the
    delete horizon; each payload column independently takes the value of
    the highest-LSN non-delete event strictly above that horizon; the key
    is alive iff any non-delete event sits strictly above the horizon.

    Assumes (key, lsn) unique within the stream (``gen_partial_changes``
    pins dup_ratio=0) — value-level tie-breaking is pinned by the engine's
    own cross-partitioning determinism tests, not by this pandas fold."""
    if payload_cols is None:
        payload_cols = [
            c for c in changes.columns if c not in ("op", "lsn", "epoch")
        ]
    value_cols = [c for c in payload_cols if c not in KEY]
    df = changes.copy()
    dels = (
        df[df["op"] == "D"]
        .groupby(KEY, sort=False)["lsn"]
        .max()
        .rename("__dl")
    )
    df = df.merge(dels, on=KEY, how="left")
    df["__dl"] = df["__dl"].fillna(-1)
    live = df[(df["op"] != "D") & (df["lsn"] > df["__dl"])]
    live = live.sort_values(
        KEY + ["lsn"], ascending=[True] * len(KEY) + [False], kind="mergesort"
    )
    # GroupBy.first skips nulls: exactly "newest non-null per column"
    agg = live.groupby(KEY, sort=True, as_index=False).agg(
        {c: "first" for c in value_cols}
    )
    return (
        agg[KEY + value_cols]
        .sort_values(KEY, kind="mergesort")
        .reset_index(drop=True)
    )
