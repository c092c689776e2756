"""ProjectionSyncJob — a secondary index: the source table re-KEYED by other
columns, maintained from the TYPED change feed.

The net change feed (``read_changes``) delivers only NEW images, so a
consumer whose derived table is keyed by something the update CHANGED cannot
retract the stale row — it would have to read the old value first (the
read-before-write every secondary-index design fights; see
plans/neardup.py's module doc for where this bites: the band index is keyed
``(doc_id, band)`` precisely because a hash-keyed layout could not be
retracted from the net feed). The TYPED feed (``read_changes_typed``)
removes the constraint: it delivers ``update_preimage``/``delete`` rows —
the OLD image — so the consumer retracts by projection of the pre-image and
asserts by projection of the post-image, never reading the source.

Ordering inside the derived table does not reuse the source lsns (a
retraction would tie with the row it retracts); instead every window writes
with ``lsn = window-end snapshot id`` — constant within a window, strictly
increasing across windows — and retractions are ANTI-JOINED against the
window's own assertions first (an update whose projected key did not change
nets to just the re-assertion). One key therefore never carries two ops at
one lsn, and windows fold associatively like every other consumer.

Exactly-once bookkeeping is the standard consumer shape (plans/sync.py):
the projection table's own ``applied_epochs`` set is the checkpoint, catch-up
windows never span an applied epoch, per-epoch cost is O(changed rows).

Chained off the near-dup band index this is the "second hash-keyed
projection" its module doc defers: base docs -> band index (keyed
(doc_id, band)) -> THIS job (keyed (band, h1, h2, doc_id)) — two CDC hops,
exactly-once at each, giving point-lookup candidate retrieval whose join is
co-located with the projection's bucket layout while the correctness-
critical band index stays single-writer-simple. (DynamoDB GSIs and
Materialize arrangements are maintained the same way: from the base's
retractable change stream.)
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark.config import EngineConfig
from cnpj_data_pipeline_spark.lake.format import CHANGE_TYPE_COL, LakeTable
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.plans.sync import (
    _apply_snapshots,
    _pending_windows,
)


class ProjectionSyncJob:
    def __init__(
        self,
        source_root: str,
        proj_root: str,
        key_cols: tuple[str, ...],
        payload_cols: tuple[str, ...] = (),
        cfg: EngineConfig | None = None,
        n_buckets: int | None = None,
    ):
        """``key_cols``: the projection's primary key — source columns (the
        re-keying). Include enough of the source key to keep it unique per
        source row (e.g. ``(band, h1, h2, doc_id)``). ``payload_cols``:
        source columns carried as non-key payload."""
        self.source_root = source_root
        self.proj_root = proj_root
        self.key_cols = tuple(key_cols)
        self.payload_cols = tuple(payload_cols)
        self.cfg = cfg or EngineConfig()
        self.n_buckets = n_buckets

    def _ensure_proj(self, spark: SparkSession, src: LakeTable) -> LakeTable:
        if LakeTable.exists(self.proj_root):
            return LakeTable.load(self.proj_root)
        cols = [*self.key_cols, *self.payload_cols]
        src_schema = src.logical_schema()
        import pyspark.sql.types as T

        schema = T.StructType([src_schema[c] for c in cols])
        return LakeTable.create(
            self.proj_root,
            schema,
            list(self.key_cols),
            self.n_buckets or src.n_buckets(),
        )

    def _envelope(self, typed: DataFrame, lsn: int) -> DataFrame:
        cols = [*self.key_cols, *self.payload_cols]
        ct = F.col(CHANGE_TYPE_COL)
        ups = typed.filter(
            ct.isin("insert", "update_postimage")
        ).select(*cols)
        downs = (
            typed.filter(ct.isin("delete", "update_preimage"))
            .select(*self.key_cols)
            # an update whose projected key did not change nets to the
            # re-assertion alone; with the source key inside key_cols the
            # anti-join can only ever drop the same source row's retraction
            .join(ups.select(*self.key_cols), list(self.key_cols), "left_anti")
        )
        for c in self.payload_cols:
            downs = downs.withColumn(
                c, F.lit(None).cast(typed.schema[c].dataType)
            )
        return ups.withColumn("op", F.lit("U")).unionByName(
            downs.withColumn("op", F.lit("D"))
        ).withColumn("lsn", F.lit(lsn).cast("long"))

    def run_once(
        self, spark: SparkSession, max_window_epochs: int | None = None
    ) -> dict:
        """Project every pending source epoch (exactly-once, crash-safe —
        the projection table's applied_epochs set is the checkpoint)."""
        t0 = time.monotonic()
        src = LakeTable.load(self.source_root)
        proj = self._ensure_proj(spark, src)
        applies = _apply_snapshots(src)
        done = proj.applied_epochs()
        synced, rows = [], 0
        for window, prev_sid in _pending_windows(
            applies, done, max_window_epochs
        ):
            to_sid = window[-1]["snapshot_id"]
            typed = src.read_changes_typed(spark, prev_sid, to_sid)
            env = self._envelope(typed, lsn=to_sid)
            epochs = [s["epoch"] for s in window]
            m = apply_changes(spark, proj, env, epoch=epochs, cfg=self.cfg)
            synced.extend(epochs)
            rows += m["rows_applied"]
        lag = len(_apply_snapshots(src)) - len(proj.applied_epochs())
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
    ) -> dict:
        totals = {"epochs_synced": [], "rows_applied": 0, "polls": 0}
        while True:
            m = self.run_once(spark)
            totals["epochs_synced"].extend(m["epochs_synced"])
            totals["rows_applied"] += m["rows_applied"]
            totals["polls"] += 1
            if max_polls is not None and totals["polls"] >= max_polls:
                return totals
            time.sleep(poll_seconds)

    def proj_table(self) -> LakeTable:
        return LakeTable.load(self.proj_root)

    def read(self, spark: SparkSession) -> DataFrame:
        return self.proj_table().read(spark).select(
            *self.key_cols, *self.payload_cols
        )
