"""Z-order (Morton) clustering for the map-only bucket rewrite.

A lexicographic ``sort_order`` clusters perfectly on its FIRST column and
not at all on the rest; Z-ordering interleaves the bits of several columns'
rank positions so every declared column's values end up locally clustered —
a range predicate on ANY of them prunes row groups (the Delta OPTIMIZE
ZORDER / Iceberg z-ordered sort analogue).

Scale shape: the z-value is computed PER BUCKET inside the rewrite task on
the already-folded Arrow state (numpy, vectorized, no Python loop over
rows) — no global stats pass, no extra shuffle, no driver participation.
Rank-based binning (argsort of argsort) rather than min/max scaling makes
the interleave distribution-free: a skewed column still spreads evenly
across its 16-bit bins, so no column's bits dominate the curve.

Reference analogue: none — the reference's Postgres heaps have no
clustering at all (init-db/postgres.sql)."""

from __future__ import annotations

import numpy as np

# bits per column in the interleave; 4 columns max keeps the z-value in
# uint64 (4 x 16 = 64) and 16 bits of rank resolution is far below any
# realistic row-group count per file (~2^5), so precision never limits
# pruning
BITS = 16
MAX_COLS = 4


def ranks_of(col: np.ndarray, nan_greatest: bool = False) -> np.ndarray:
    """Stable rank positions of one column (int64). NaN/None rank lowest
    by default (the layout use: nulls cluster first, deterministically);
    ``nan_greatest=True`` ranks float NaN HIGHEST instead — Spark's
    NaN-greatest total order — for value tie-breaks that must pick the
    same winner as a Spark ``max_by`` (candidates there are never null,
    so None handling is irrelevant on that path)."""
    n = len(col)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    # nulls (object None or float NaN) must rank FIRST deterministically
    if col.dtype == object:
        valid = np.array([v is not None for v in col], dtype=bool)
        # argsort needs a homogeneous comparable array: sort valid values
        # only, then prepend the nulls
        order = np.empty(n, dtype=np.int64)
        inv = np.flatnonzero(~valid)
        val_idx = np.flatnonzero(valid)
        order[: len(inv)] = inv
        order[len(inv):] = val_idx[
            np.argsort(col[valid], kind="stable")
        ]
    else:
        if np.issubdtype(col.dtype, np.floating):
            # NaN must sort STRICTLY outside the value range, not merely at
            # ±inf: mapping NaN to inf would TIE it with a genuine Infinity
            # value, and in the nan_greatest (Spark total order) use a
            # duplicate-LSN tie between NaN and Infinity must still rank
            # NaN above. Two-key lexsort: the NaN mask is the primary key
            # (False<True puts NaN last = greatest; inverted for the
            # nulls-first layout default), values the secondary.
            isnan = np.isnan(col)
            vals = np.where(isnan, 0.0, col)
            order = np.lexsort(
                (vals, isnan if nan_greatest else ~isnan)
            ).astype(np.int64)
        else:
            order = np.argsort(col, kind="stable")
    ranks = np.empty(n, dtype=np.int64)
    ranks[order] = np.arange(n)
    return ranks


def rank_bins(col: np.ndarray) -> np.ndarray:
    """Map one column to uint64 bins in [0, 2^BITS): stable rank positions
    scaled to the bin range."""
    ranks = ranks_of(col)
    denom = max(len(col) - 1, 1)
    return ((ranks * ((1 << BITS) - 1)) // denom).astype(np.uint64)


def zvalues(cols: list[np.ndarray]) -> np.ndarray:
    """Interleave the rank bins of up to MAX_COLS columns into one uint64
    Morton code per row (bit i of column j lands at position i*k + j)."""
    if not 1 <= len(cols) <= MAX_COLS:
        raise ValueError(
            f"zorder supports 1..{MAX_COLS} columns, got {len(cols)}"
        )
    k = len(cols)
    bins = [rank_bins(c) for c in cols]
    out = np.zeros(len(bins[0]), dtype=np.uint64)
    for j, b in enumerate(bins):
        for i in range(BITS):
            out |= ((b >> np.uint64(i)) & np.uint64(1)) << np.uint64(
                i * k + j
            )
    return out


def arrow_column_to_numpy(tbl, name: str) -> np.ndarray:
    """One Arrow column as a rankable numpy array: numerics/temporals keep
    their order as numbers (nulls -> NaN), strings/binaries come out as
    object arrays with None for nulls."""
    col = tbl.column(name)
    try:
        return col.to_numpy(zero_copy_only=False)
    except Exception:
        return np.array(col.to_pylist(), dtype=object)


def sort_indices_zorder(tbl, cols: list[str], tiebreak: list[str]):
    """Row order (numpy int64 indices) sorting ``tbl`` by the z-value of
    ``cols``, tiebroken by ``tiebreak``'s FULL ranks (bins collide past
    2^BITS rows; raw ranks keep the order total and deterministic)."""
    z = zvalues([arrow_column_to_numpy(tbl, c) for c in cols])
    keys = [
        ranks_of(arrow_column_to_numpy(tbl, c))
        for c in reversed(tiebreak)
        if c not in cols
    ]
    return np.lexsort([*keys, z]) if keys else np.argsort(z, kind="stable")
