"""AS-OF (temporal) join — an operator Spark's join family lacks natively,
composed from existing DataFrame ops (SURVEY §2.3 extension; the brief's
canonical "custom operator" case).

Semantics: each fact row is joined to the LATEST dim row with
``dim.order_col <= fact.order_col`` within the same key (backward as-of, the
CDC-natural direction: "the dimension state in force when this event
happened"). Equal order values match (inclusive).

Physical shape — the scale rationale: the naive formulations are a range
join (O(F·D) without a range-join optimizer) or a per-fact subquery. This
implementation is the union+running-last composition:

1. tag dim rows 0 / fact rows 1 and union them;
2. ONE shuffle: window partitioned by key, ordered by (order_col, tag),
   ``last(dim_struct, ignorenulls=True)`` over rows-unbounded-preceding —
   the running "dimension state in force";
3. keep fact rows, unpack the struct.

Cost is one shuffle + one linear pass per key — no pair explosion, no
broadcast requirement on either side. Hot keys concentrate their window on
one task (the inherent sort order dependency); at 10^10 facts with few
giant keys, pre-split by a coarse time bucket that closes over dim
revisions, or use the lake's bucket clustering — documented trade, same as
every sorted-merge as-of implementation (kdb, QuestDB, DuckDB ASOF)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ASOF_TAG = "__asof_tag"
ASOF_STATE = "__asof_state"


def asof_join(
    facts: DataFrame,
    dims: DataFrame,
    on: Sequence[str],
    order_col: str,
    payload_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: ``facts`` rows gain ``<payload>{suffix}`` columns
    from the latest ``dims`` row at-or-before their ``order_col`` per key
    (NULL when no dim row precedes the fact). ``payload_cols`` must not
    collide with fact column names."""
    overlap = set(payload_cols) & set(facts.columns)
    if overlap:
        raise ValueError(f"payload columns collide with fact columns: {overlap}")
    d = dims.select(
        *on,
        F.col(order_col),
        F.struct(*[F.col(c) for c in payload_cols]).alias(ASOF_STATE),
    ).withColumn(ASOF_TAG, F.lit(0))
    f = facts.withColumn(ASOF_TAG, F.lit(1)).withColumn(
        ASOF_STATE, F.lit(None).cast(d.schema[ASOF_STATE].dataType)
    )
    both = f.unionByName(d, allowMissingColumns=True)
    # dim(0) sorts before fact(1) at equal order values → inclusive match;
    # last(..., ignorenulls) carries the newest dim STRUCT forward (a dim row
    # with NULL payload fields is still a revision, matching ASOF JOIN).
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(order_col).asc(), F.col(ASOF_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.withColumn(ASOF_STATE, F.last(ASOF_STATE, ignorenulls=True).over(w))
    out = carried.filter(F.col(ASOF_TAG) == 1).drop(ASOF_TAG)
    for c in payload_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(ASOF_STATE)[c])
    return out.drop(ASOF_STATE)
