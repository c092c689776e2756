"""Last-writer-wins dedup — the core window operator of the engine (SURVEY W1).

Reference analogue: within-batch dedup before merge,
``ROW_NUMBER() OVER (PARTITION BY pk ORDER BY batch_row_num DESC) rn ... WHERE
rn = 1`` (``src/database/postgres.py:478-501``) and ``DISTINCT ON (pk)``
(``src/database/postgres.py:421-436``). We standardize on the deterministic
ROW_NUMBER form with a total order so results are identical across partitionings,
parallelism levels, and reruns.

Scale notes: ``Window.partitionBy(key)`` shuffles by the FULL key
(conv_id, turn_idx) — a hot conversation does not concentrate on one task because
each of its turns hashes independently. No additional salting is needed for this
operator; skew handling matters at the merge, where grouping is by bucket.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LWW_ROW_NUMBER_COL = "__rn"


def lww_order_cols(
    lsn_col: str = "lsn",
    ts_col: str = "ts",
    text_col: str = "text",
    op_col: str = "op",
    tool_col: str = "tool",
):
    """The engine-wide deterministic total order: LSN is authoritative (WAL
    position); ts, op, text, tool break ties among deliberately duplicated
    LSNs so every execution picks the same winner. tool closes the last
    ambiguity: two tombstones can share (key, lsn, ts) with NULL text but
    different tool payloads — without it the winner would be
    partitioning-dependent."""
    return [
        F.col(lsn_col).desc(),
        F.col(ts_col).desc(),
        F.col(op_col).desc(),
        F.coalesce(F.col(text_col), F.lit("")).desc(),
        F.coalesce(F.col(tool_col), F.lit("")).desc(),
    ]


def lww_dedup(
    changes: DataFrame,
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    lsn_col: str = "lsn",
    ts_col: str = "ts",
) -> DataFrame:
    """Keep exactly one event per key: the last writer under the total order."""
    w = Window.partitionBy(*key_cols).orderBy(*lww_order_cols(lsn_col, ts_col))
    return (
        changes.withColumn(LWW_ROW_NUMBER_COL, F.row_number().over(w))
        .filter(F.col(LWW_ROW_NUMBER_COL) == 1)
        .drop(LWW_ROW_NUMBER_COL)
    )


def lww_winners_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    lsn_col: str = "lsn",
    ts_col: str = "ts",
    text_col: str = "text",
    op_col: str = "op",
    tool_col: str = "tool",
) -> DataFrame:
    """The same LWW winner per group, as a hash aggregate instead of a sorted
    window: ``max_by(struct(all columns), struct(lsn, ts, op, text-key))``.
    Lexicographic struct max == the all-DESC row_number()==1 row (NULL order
    keys lose in both forms). Measured ~2x faster than the window at merge
    scale — no post-shuffle sort, and map-side partial aggregation collapses
    duplicate keys before they ever shuffle (the map-side-combine the
    reference gets from Postgres's DISTINCT ON, done at the right layer).
    When the input is already hash-partitioned on a subset of ``group_cols``
    (the merge's explicit (bucket, salt) repartition), no extra exchange is
    inserted and the output keeps that clustering for the partitioned write.

    Requires the total order to be total per distinct payload: two rows that
    tie on (lsn, ts, op, text) must be identical in the remaining columns
    (true for transcript envelopes — role/tool are functions of key and
    text; real WALs have unique (key, lsn) anyway)."""
    order_key = F.struct(
        F.col(lsn_col),
        F.col(ts_col),
        F.col(op_col),
        F.coalesce(F.col(text_col), F.lit("")),
        F.coalesce(F.col(tool_col), F.lit("")),
    )
    payload = F.struct(*[F.col(c) for c in df.columns])
    return (
        df.groupBy(*[F.col(c) for c in group_cols])
        .agg(F.max_by(payload, order_key).alias("__w"))
        .select("__w.*")
    )
