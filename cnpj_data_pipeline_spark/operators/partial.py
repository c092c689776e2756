"""Partial-update merge engine — per-column last-non-null fold.

The LWW engine (``operators.dedup``) resolves a key to its single newest
ROW; a CDC stream of partial updates (Debezium sources with unchanged-TOAST
columns, wide tables patched a few fields at a time, multi-writer column
ownership) instead wants the newest value PER COLUMN. Paimon calls this the
``partial-update`` merge engine and Hudi the partial-update payload; both
punt on out-of-order input — Paimon requires in-sequence arrival per key
(or per-column sequence groups configured by hand), Hudi documents the
ordering field as authoritative per row. This implementation is correct for
ARBITRARY arrival order and across compactions, because the fold is made
associative by carrying its provenance:

* ``__col_lsns`` (map<column, lsn>) on every folded row records which LSN
  each surviving column value came from. A later fold that mixes a folded
  row with raw late events compares per COLUMN at the true origin LSN — a
  compacted row never smuggles an old value forward under the row's max
  LSN.
* ``__del_lsn`` on every folded row records the newest tombstone LSN seen,
  so a column value arriving late (origin below a delete that compaction
  already folded away) still loses to that delete.

With those two meta columns, fold(fold(A), B) == fold(A ∪ B) for any split
of the version set — the per-column winner is a max over (origin LSN,
tiebreaks) and the delete horizon is a max, both commutative semilattices.
That associativity is what lets the SAME function serve within-batch
dedup at ingest, merge-on-read resolution at read time, and the compaction
rewrite — and lets each run over any partitioning.

Semantics per key:

* a column's value = the value with the highest origin LSN among non-delete
  versions, if that origin is STRICTLY above the newest delete LSN;
* the row is alive iff any non-delete version is strictly above the newest
  delete LSN (an all-NULL insert still creates the key);
* ties on origin LSN break by (row LSN, value-as-string) so every
  partitioning and engine picks the same winner; an exact (origin == delete
  LSN) tie resolves to the delete.

Scale shape: identical to the LWW fold — ONE hash aggregate that reuses the
merge's (bucket, salt-of-full-key) exchange; per payload column it runs one
``max_by``, all JVM-side, map-side partials collapsing duplicate versions
before the shuffle. No windows, no sorts, no Python.

Reference analogue: none — the reference's upsert replaces whole rows
(``ON CONFLICT DO UPDATE SET col = EXCLUDED.col`` for every column,
src/database/postgres.py:216-264). Partial-update is a capability its
Postgres target would express as per-column COALESCE in the conflict
clause; at lake scale it must be a merge engine.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: physical meta column: map<payload column name, origin lsn> of each
#: surviving column value on a FOLDED row (absent/null on raw WAL rows —
#: their origin is the row's own lsn)
COL_LSNS_META_COL = "__col_lsns"
#: physical meta column: newest tombstone lsn folded into this row (absent/
#: null when no delete has been seen for the key)
DEL_LSN_META_COL = "__del_lsn"

#: sentinel "no delete seen" — below any real LSN (engine LSNs are ≥ 0)
_NO_DEL = -1


#: per-column fold functions of the AGGREGATE merge engine. "last" is the
#: partial-update fold (newest non-null, origin-LSN provenance); the rest
#: are commutative monoids — associative by algebra, so folded partials
#: re-fold exactly. Aggregate tables REJECT tombstones at ingest (a sum
#: cannot retract a contribution a compaction already folded away), which
#: keeps the delete-horizon branch dead and the monoids pure.
AGG_FNS = ("last", "sum", "min", "max")


def partial_winners_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    payload_cols: Sequence[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
    agg_spec: dict[str, str] | None = None,
) -> DataFrame:
    """One folded row per group under partial-update semantics (module doc),
    or — with ``agg_spec`` — the AGGREGATE merge engine's spec-driven fold.

    ``group_cols`` is the grouping key — the table key, optionally prefixed
    by (bucket, salt) exactly like ``dedup.lww_winners_agg`` so the fold
    reuses the merge's existing exchange. ``payload_cols`` are the non-key
    payload columns to fold per-column (key columns are group keys and never
    folded). ``lsn_col``/``op_col`` name the envelope — raw ("lsn", "op")
    for WAL batches, physical meta names for committed table files.

    ``agg_spec`` maps a payload column to its fold fn (:data:`AGG_FNS`);
    unlisted columns default to "last". "sum"/"min"/"max" contributions are
    the column DELTAS the stream carries (a counters table ships +n events
    and the fold accumulates); a folded row re-contributes its partial
    aggregate, which is exact because each fn is a commutative monoid.

    Input may or may not carry ``__col_lsns``/``__del_lsn`` (raw WAL rows
    don't); output ALWAYS does — the provenance that keeps the fold
    associative. Output columns: group_cols + payload_cols + lsn_col +
    op_col + __col_lsns + __del_lsn.
    """
    agg_spec = agg_spec or {}
    bad = {c: f for c, f in agg_spec.items() if f not in AGG_FNS}
    if bad:
        raise ValueError(f"unknown agg fns {bad} (have {AGG_FNS})")
    cols = set(df.columns)
    lsn = F.col(lsn_col)
    op = F.col(op_col)

    # newest delete seen, per row: an explicit tombstone's lsn, or the
    # folded-in delete horizon a previous fold recorded
    row_del = F.when(op == "D", lsn).otherwise(F.lit(_NO_DEL))
    if DEL_LSN_META_COL in cols:
        row_del = F.greatest(
            row_del, F.coalesce(F.col(DEL_LSN_META_COL), F.lit(_NO_DEL))
        )

    def origin(c: str):
        if COL_LSNS_META_COL in cols:
            return F.coalesce(
                F.element_at(F.col(COL_LSNS_META_COL), F.lit(c)), lsn
            )
        return lsn

    aggs = [
        F.max(row_del).alias("__DEL"),
        F.max(F.when(op != "D", lsn)).alias("__LIVE"),
    ]
    for c in payload_cols:
        fn = agg_spec.get(c, "last")
        contrib = F.col(c).isNotNull() & (op != "D")
        if fn in ("sum", "min", "max"):
            # commutative monoid: fold the raw contribution directly; the
            # "origin" of a monoid column is just the newest contributing
            # lsn (metadata for symmetry — refolds never need it)
            agg_f = {"sum": F.sum, "min": F.min, "max": F.max}[fn]
            aggs.append(
                F.struct(
                    F.max(F.when(contrib, lsn)).alias("o"),
                    agg_f(F.when(contrib, F.col(c))).alias("v"),
                ).alias(f"__p_{c}")
            )
            continue
        o = origin(c)
        # deterministic total order per column: origin, then row lsn, then
        # the value itself (as string) — same winner on every partitioning
        ordk = F.struct(
            o, lsn, F.coalesce(F.col(c).cast("string"), F.lit(""))
        )
        aggs.append(
            F.max_by(
                F.struct(o.alias("o"), F.col(c).alias("v")),
                F.when(contrib, ordk),
            ).alias(f"__p_{c}")
        )

    agg = df.groupBy(*[F.col(g) for g in group_cols]).agg(*aggs)

    dele = F.col("__DEL")
    live = F.col("__LIVE")
    alive = live.isNotNull() & (live > dele)

    def survives(c: str):
        p = F.col(f"__p_{c}")
        return p.isNotNull() & (p["o"] > dele)

    out_cols = [F.col(g) for g in group_cols]
    for c in payload_cols:
        out_cols.append(
            F.when(survives(c), F.col(f"__p_{c}")["v"]).alias(c)
        )
    out_cols.append(F.when(alive, live).otherwise(dele).alias(lsn_col))
    out_cols.append(F.when(alive, F.lit("U")).otherwise(F.lit("D")).alias(op_col))
    if payload_cols:
        entries = F.array(
            *[
                F.struct(
                    F.lit(c).alias("key"),
                    F.when(survives(c), F.col(f"__p_{c}")["o"]).alias("value"),
                )
                for c in payload_cols
            ]
        )
        col_lsns = F.map_filter(
            F.map_from_entries(entries), lambda _k, v: v.isNotNull()
        )
    else:
        col_lsns = F.lit(None).cast("map<string,bigint>")
    out_cols.append(col_lsns.alias(COL_LSNS_META_COL))
    out_cols.append(
        F.when(dele >= 0, dele).cast("long").alias(DEL_LSN_META_COL)
    )
    return agg.select(*out_cols)
