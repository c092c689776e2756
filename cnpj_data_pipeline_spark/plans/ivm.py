"""AggSyncJob — incremental VIEW MAINTENANCE for grouped aggregates, fed by
the typed change feed.

A materialized ``GROUP BY`` view (``SELECT group_cols, count(*), sum(expr)...``)
over a lake table, kept fresh WITHOUT recomputation: each base epoch's
``read_changes_typed`` window carries pre- AND post-images, so every
SUM/COUNT-style aggregate is delta-maintainable —

    Δ(group) = Σ expr(post-images ∪ inserts) − Σ expr(pre-images ∪ deletes)

and the new group value is ``old + Δ``. Groups whose row count reaches zero
are tombstoned out of the view (a ``GROUP BY`` emits no row for an empty
group). This is the classical incremental-view-maintenance algebra
(insert/retract multiset deltas) expressed purely as DataFrame ops.

Cost per sync epoch, at any table size:

1. typed window read — O(changed data) (delta files + a bucket-pruned
   pre-image lookup);
2. one hash aggregate over the typed rows → Δ per affected group;
3. a bucket-pruned read of ONLY the affected groups' current values (the
   view is a lake table keyed by the group columns — the lookup prunes to
   the touched buckets, keys never leave the executors);
4. one O(affected groups) MERGE into the view.

The view is never rebuilt and the base is never re-scanned — the property
that makes a fleet of always-fresh aggregate views affordable at 10^10 rows
(the reference's consumers re-aggregate Postgres on every query).

Maintainable measures: anything of the form ``SUM(<row expr>)`` — including
``COUNT(*)`` (expr ``1``) and ``COUNT(col)`` (``CASE WHEN col IS NOT NULL
THEN 1 END``). A NULL expr value contributes nothing in either direction
(matching SQL SUM), so NULL-producing expressions stay consistent between
insert and retract. MIN/MAX are NOT delta-maintainable under deletes
(retracting the current extremum needs the runner-up); maintain those with a
group-refresh consumer instead (``FeedSyncJob`` + re-aggregation of affected
groups).

Exactly-once: base epochs are the unit of progress and the view's own
``applied_epochs`` set is the consumer checkpoint — a crash mid-run resumes
idempotently, the same ledger the ingest itself uses (reference analogue:
the processed-files table, ``main.py:100-131``).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark.config import EngineConfig
from cnpj_data_pipeline_spark.lake.format import CHANGE_TYPE_COL, LakeTable
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.plans.sync import _pending_windows

N_ROWS_COL = "n_rows"  # implicit COUNT(*) measure: the view's liveness signal


def _apply_snapshots(table: LakeTable) -> list[dict]:
    return [
        s for s in table.snapshots()
        if s["op"] in ("append", "evolve") and s.get("epoch") is not None
    ]


class AggSyncJob:
    def __init__(
        self,
        source_root: str,
        view_root: str,
        group_cols: list[str],
        measures: dict[str, str],
        cfg: EngineConfig | None = None,
        n_buckets: int | None = None,
    ):
        """``measures``: name -> per-row SQL expression; the view maintains
        ``SUM(expr)`` per group under insert/retract deltas. ``n_rows``
        (COUNT(*)) is always maintained — it decides group liveness."""
        if N_ROWS_COL in measures:
            raise ValueError(f"measure name {N_ROWS_COL!r} is reserved (COUNT(*))")
        bad = [m for m in measures if m in set(group_cols)]
        if bad:
            raise ValueError(f"measure names collide with group columns: {bad}")
        self.source_root = source_root
        self.view_root = view_root
        self.group_cols = list(group_cols)
        self.measures = dict(measures)
        self.cfg = cfg or EngineConfig()
        self.n_buckets = n_buckets

    # ---------------- internals ----------------

    def _deltas(self, typed: DataFrame) -> DataFrame:
        """Δ per affected group from one typed window: post-images and
        inserts contribute +expr, pre-images and deletes retract −expr."""
        sign = F.when(
            F.col(CHANGE_TYPE_COL).isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        aggs = [
            F.sum(sign * F.expr(e)).alias(name)
            for name, e in self.measures.items()
        ]
        aggs.append(F.sum(sign).cast("long").alias(N_ROWS_COL))
        return typed.groupBy(*self.group_cols).agg(*aggs)

    def _ensure_view(self, deltas: DataFrame, src: LakeTable) -> LakeTable:
        if LakeTable.exists(self.view_root):
            return LakeTable.load(self.view_root)
        return LakeTable.create(
            self.view_root,
            deltas.schema,  # group cols + measure cols, types from the algebra
            self.group_cols,
            self.n_buckets or src.n_buckets(),
        )

    def _merge_window(
        self,
        spark: SparkSession,
        view: LakeTable,
        deltas: DataFrame,
        epochs: list[int],
    ) -> dict:
        mcols = list(self.measures) + [N_ROWS_COL]
        deltas = deltas.persist()
        try:
            cur = view.read_keys(
                spark,
                deltas.select(*self.group_cols),
                broadcast_keys=False,  # affected-group set is O(batch): keys
                # stay distributed, only bucket ids reach the driver
            )
            d, c = deltas.alias("d"), cur.alias("c")
            joined = d.join(c, self.group_cols, "left_outer")
            existed = F.col(f"c.{N_ROWS_COL}").isNotNull()
            new_vals = [
                (
                    F.coalesce(F.col(f"c.{m}"), F.lit(0))
                    + F.coalesce(F.col(f"d.{m}"), F.lit(0))
                ).alias(m)
                for m in mcols
            ]
            env = joined.select(
                *[F.col(f"d.{g}").alias(g) for g in self.group_cols],
                *new_vals,
                existed.alias("__existed"),
            )
            env = env.filter(
                F.col("__existed") | (F.col(N_ROWS_COL) > 0)
            ).select(
                *self.group_cols,
                *mcols,
                F.when(F.col(N_ROWS_COL) <= 0, "D").otherwise("U").alias("op"),
                # max epoch of the window: later windows always outrank
                # earlier ones in the view's LWW order
                F.lit(max(epochs)).cast("long").alias("lsn"),
            )
            return apply_changes(spark, view, env, epoch=epochs, cfg=self.cfg)
        finally:
            deltas.unpersist()

    # ---------------- public API ----------------

    def run_once(
        self, spark: SparkSession, max_window_epochs: int | None = None
    ) -> dict:
        """Maintain the view through every pending base epoch.

        Pending epochs fold into CATCH-UP WINDOWS (``_pending_windows``):
        one typed read + one delta merge per run of consecutive pending
        epochs. The typed feed is computed over the NET window, so folding
        K epochs costs ONE pre-image lookup and one merge instead of K —
        and intermediate states a key passed through inside the window are
        never materialized at all. ``max_window_epochs`` bounds one apply;
        windows never span an already-applied epoch (its deltas would
        double-count — the feed-vs-ledger invariant)."""
        t0 = time.monotonic()
        src = LakeTable.load(self.source_root)
        applies = _apply_snapshots(src)
        view = (
            LakeTable.load(self.view_root)
            if LakeTable.exists(self.view_root)
            else None
        )
        done = view.applied_epochs() if view is not None else set()
        synced, rows = [], 0
        for window, prev_sid in _pending_windows(
            applies, done, max_window_epochs
        ):
            typed = src.read_changes_typed(
                spark, prev_sid, window[-1]["snapshot_id"]
            )
            deltas = self._deltas(typed)
            if view is None:
                view = self._ensure_view(deltas, src)
            epochs = [s["epoch"] for s in window]
            m = self._merge_window(spark, view, deltas, epochs)
            synced.extend(epochs)
            rows += m["rows_applied"]
        lag = len(applies) - (len(view.applied_epochs()) if view else 0)
        return {
            "epochs_synced": synced,
            "rows_applied": rows,
            "epochs_behind": max(lag, 0),
            "seconds": round(time.monotonic() - t0, 3),
        }

    def run_follow(
        self,
        spark: SparkSession,
        poll_seconds: float = 5.0,
        max_polls: int | None = None,
        max_window_epochs: int | None = None,
    ) -> dict:
        """Poll loop: sync, sleep, repeat (the always-fresh-view shape)."""
        totals = {"epochs_synced": [], "rows_applied": 0, "polls": 0}
        while True:
            m = self.run_once(spark, max_window_epochs=max_window_epochs)
            totals["epochs_synced"].extend(m["epochs_synced"])
            totals["rows_applied"] += m["rows_applied"]
            totals["polls"] += 1
            if max_polls is not None and totals["polls"] >= max_polls:
                return totals
            time.sleep(poll_seconds)

    def read(self, spark: SparkSession) -> DataFrame:
        """The maintained view's current state (live groups only)."""
        return LakeTable.load(self.view_root).read(spark)
