"""JoinSyncJob — an incrementally-maintained JOIN view over two lake tables.

The materialized form of the FK join every consumer of this data model runs:
child rows (turns, keyed ``(conv_id, turn_idx)``) LEFT-joined to their parent
row (conversation metadata, keyed ``(conv_id,)``). The reference has no
equivalent — its consumers re-join Postgres tables per query
(``init-db/postgres.sql:54,73`` declare the FKs; every read pays the join).
Here the join is materialized ONCE as a lake table and maintained from both
sources' change feeds, so at 10^10 child rows a reader pays a plain scan.

View definition (LEFT join, view keyed by the CHILD key):

    V = SELECT c.*, p.<payload> FROM child c LEFT JOIN parent p ON <join cols>

where ``join cols`` = the parent's key, which must be columns of the child.
A child row with no parent carries NULL parent columns; a parent DELETE
reverts its children's parent columns to NULL (referential reads never
resurrect deleted metadata); a child DELETE tombstones the view row.

Incremental maintenance per sync round, O(changed data) on both sides:

* child side — the child's TYPED window (`read_changes_typed`) yields net
  post-images (upserts) and deletes; a late-losing replay emits nothing.
  Each upsert needs its parent's CURRENT row: one bucket-pruned
  ``read_keys`` against the parent at the round's frontier.
* parent side — the plain window's DISTINCT join-key set is the fan-out:
  all live child rows of those parents are re-emitted with refreshed parent
  columns. The child lookup is ``read_keys(on=join_cols)`` — bucket-pruned
  when the child table is bucketed on the join columns
  (``bucket_cols=("conv_id",)``), the layout this job is designed around;
  an unpruned child degrades to one scan + semi join per round.
* both deltas union into one change envelope and merge into the view with
  the standard LWW apply (one shuffle).

Exactly-once WITHOUT integer epochs: this consumer tracks a FRONTIER PER
SOURCE — (child snapshot id, parent snapshot id) — which cannot live in the
single ``applied_epochs`` ledger. It rides in the view's table PROPERTIES:
each round's merge commits ``props={frontier key: new}`` guarded by
``expected_props={frontier key: old}`` (the CAS), atomically with the data.
A crashed round left no commit (re-runs cleanly); a racing second instance
loses the CAS and skips. The view's LWW lsn is ``child_sid + parent_sid``,
strictly increasing per round (every round advances at least one frontier).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark.config import EngineConfig
from cnpj_data_pipeline_spark.lake.format import (
    CHANGE_TYPE_COL,
    FrontierConflictError,
    LakeTable,
)
from cnpj_data_pipeline_spark.operators.merge import apply_changes


class JoinSyncJob:
    def __init__(
        self,
        child_root: str,
        parent_root: str,
        view_root: str,
        cfg: EngineConfig | None = None,
        n_buckets: int | None = None,
        name: str = "default",
        parent_cols: list[str] | None = None,
    ):
        """``parent_cols`` selects which parent payload columns the view
        carries (default: all non-key columns) — the escape hatch when a
        parent column name collides with a child column (the view is flat)."""
        self.child_root = child_root
        self.parent_root = parent_root
        self.view_root = view_root
        self.cfg = cfg or EngineConfig()
        self.n_buckets = n_buckets
        self.prop_key = f"joinsync.{name}.frontier"
        self.parent_cols = list(parent_cols) if parent_cols is not None else None

    # ---------------- internals ----------------

    def _parent_payload_cols(self, parent: LakeTable, join_cols: list[str]) -> list[str]:
        all_payload = [
            f.name for f in parent.schema().fields if f.name not in join_cols
        ]
        if self.parent_cols is None:
            return all_payload
        missing = set(self.parent_cols) - set(all_payload)
        if missing:
            raise ValueError(
                f"parent_cols {sorted(missing)} not in the parent's non-key "
                f"payload {all_payload}"
            )
        return list(self.parent_cols)

    def _ensure_view(
        self, child: LakeTable, parent: LakeTable, join_cols: list[str]
    ) -> LakeTable:
        if LakeTable.exists(self.view_root):
            return LakeTable.load(self.view_root)
        child_fields = list(child.schema().fields)
        child_names = {f.name for f in child_fields}
        selected = set(self._parent_payload_cols(parent, join_cols))
        p_fields = [
            f for f in parent.schema().fields
            if f.name not in join_cols and f.name in selected
        ]
        clash = [f.name for f in p_fields if f.name in child_names]
        if clash:
            raise ValueError(
                f"parent payload columns {clash} collide with child columns "
                "— rename them in the parent table (the view is flat)"
            )
        import pyspark.sql.types as T

        schema = T.StructType(child_fields + p_fields)
        return LakeTable.create(
            self.view_root,
            schema,
            key_cols=child.key_cols(),
            n_buckets=self.n_buckets or child.n_buckets(),
            bucket_cols=child.bucket_cols(),
        )

    # ---------------- public API ----------------

    def run_once(self, spark: SparkSession) -> dict:
        """One sync round: advance the view to both sources' current heads."""
        t0 = time.monotonic()
        child = LakeTable.load(self.child_root)
        parent = LakeTable.load(self.parent_root)
        join_cols = parent.key_cols()
        if join_cols is None:
            raise ValueError("parent table must be keyed (it is the join dim)")
        child_keys = child.key_cols()
        if child_keys is None or not set(join_cols) <= set(child_keys) | set(
            f.name for f in child.schema().fields
        ):
            raise ValueError(
                "child table must be keyed and carry the parent's key columns"
            )

        view = self._ensure_view(child, parent, join_cols)
        frontier = view.props().get(self.prop_key) or {"child": 0, "parent": 0}
        c0, p0 = int(frontier["child"]), int(frontier["parent"])
        c1 = child.current_snapshot_id()
        p1 = parent.current_snapshot_id()
        if (c0, p0) == (c1, p1):
            return {
                "advanced": False,
                "frontier": {"child": c1, "parent": p1},
                "rows_applied": 0,
                "seconds": round(time.monotonic() - t0, 3),
            }

        p_payload = self._parent_payload_cols(parent, join_cols)
        child_payload = [f.name for f in child.schema().fields]
        lsn = c1 + p1  # strictly increases: every round advances a frontier

        deltas: list[DataFrame] = []
        convs_needed: list[DataFrame] = []

        if c1 > c0:
            typed = child.read_changes_typed(spark, c0, c1)
            ups = typed.filter(
                F.col(CHANGE_TYPE_COL).isin("insert", "update_postimage")
            ).select(*child_payload)
            dels = typed.filter(F.col(CHANGE_TYPE_COL) == "delete").select(
                *child_payload
            )
            convs_needed.append(ups.select(*join_cols))
            deltas.append(
                ups.withColumn("__vop", F.lit("U"))
            )
            deltas.append(dels.withColumn("__vop", F.lit("D")))

        if p1 > p0:
            # parents whose row changed (any event — a late-losing replay
            # only costs a value-identical refresh, never a wrong value,
            # because parent columns are read from the FRONTIER state below)
            touched_parents = (
                parent.read_changes(spark, p0, p1).select(*join_cols).distinct()
            )
            fanout = child.read_keys(
                spark,
                touched_parents,
                on=join_cols,
                broadcast_keys=False,
                snapshot_id=c1,
            ).select(*child_payload)
            convs_needed.append(fanout.select(*join_cols))
            deltas.append(fanout.withColumn("__vop", F.lit("U")))

        env = deltas[0]
        for d in deltas[1:]:
            env = env.unionByName(d)

        # one parent lookup at the round frontier serves both delta sources;
        # LEFT join: missing/deleted parents yield NULL parent columns
        convs = convs_needed[0]
        for c in convs_needed[1:]:
            convs = convs.unionByName(c)
        if p_payload:
            pvals = parent.read_keys(
                spark, convs.distinct(), broadcast_keys=False, snapshot_id=p1
            ).select(*join_cols, *p_payload)
            env = env.join(pvals, on=join_cols, how="left")
        env = env.select(
            *child_payload,
            *p_payload,
            F.col("__vop").alias("op"),
            F.lit(lsn).cast("long").alias("lsn"),
        )

        try:
            m = apply_changes(
                spark,
                view,
                env,
                epoch=None,
                cfg=self.cfg,
                props={self.prop_key: {"child": c1, "parent": p1}},
                expected_props={
                    self.prop_key: None if (c0, p0) == (0, 0) else frontier
                },
            )
        except FrontierConflictError:
            # a racing instance advanced the frontier first — exactly-once
            # means this round's work is discarded (orphans GC later).
            # ONLY the frontier CAS is a benign skip: any other
            # CommitConflictError (persistent rebase losses, a layout
            # change) propagates — masking it as a skip would silently
            # stop the view from ever advancing
            return {
                "advanced": False,
                "skipped_by": "concurrent-consumer",
                "frontier": view.props().get(self.prop_key),
                "rows_applied": 0,
                "seconds": round(time.monotonic() - t0, 3),
            }
        return {
            "advanced": True,
            "frontier": {"child": c1, "parent": p1},
            "rows_applied": m["rows_applied"],
            "seconds": round(time.monotonic() - t0, 3),
        }

    def run_follow(
        self,
        spark: SparkSession,
        poll_seconds: float = 5.0,
        max_polls: int | None = None,
    ) -> dict:
        totals = {"rounds_advanced": 0, "rows_applied": 0, "polls": 0}
        while True:
            m = self.run_once(spark)
            totals["rounds_advanced"] += int(m["advanced"])
            totals["rows_applied"] += m["rows_applied"]
            totals["polls"] += 1
            if max_polls is not None and totals["polls"] >= max_polls:
                return totals
            time.sleep(poll_seconds)

    def read(self, spark: SparkSession) -> DataFrame:
        return LakeTable.load(self.view_root).read(spark)
