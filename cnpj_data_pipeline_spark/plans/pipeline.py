"""IngestJob — the epoch loop: plan → apply → commit → metrics.

Reference analogue: ``main()``'s run loop (``main.py:45-217``): discover
batches, filter processed, transform, ``bulk_upsert``, mark processed. Our loop
is resumable at epoch granularity with the commit made atomic per batch
(fixing the reference's mark-after-partial-failure window, ``main.py:180-189``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from cnpj_data_pipeline_spark.config import EngineConfig
from cnpj_data_pipeline_spark.lake.format import LakeTable
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA
from cnpj_data_pipeline_spark.sources.change_stream import iter_pending


@dataclass
class IngestJob:
    table_path: str
    cfg: EngineConfig = field(default_factory=EngineConfig)

    def ensure_table(self) -> LakeTable:
        if LakeTable.exists(self.table_path):
            return LakeTable.load(self.table_path)
        return LakeTable.create(
            self.table_path,
            TRANSCRIPT_SCHEMA,
            key_cols=list(self.cfg.key_cols),
            n_buckets=self.cfg.n_buckets,
        )

    def run_batches(
        self, spark: SparkSession, batches, fail_after: int | None = None
    ) -> list[dict]:
        """Apply an iterable of (epoch, DataFrame[, rows_hint]) batches in order.

        ``fail_after``: test hook — raise after N successful applies to
        simulate a mid-stream crash (resume tests re-run without it)."""
        table = self.ensure_table()
        metrics = []
        done = 0
        for batch in batches:
            epoch, df = batch[0], batch[1]
            hint = batch[2] if len(batch) > 2 else None
            m = apply_changes(
                spark, table, df, epoch, self.cfg, batch_rows_hint=hint
            )
            m["events_per_sec"] = (
                m["rows_applied"] / m["seconds"] if m["seconds"] > 0 else None
            )
            metrics.append(m)
            if not m["skipped"]:
                done += 1
                if fail_after is not None and done >= fail_after:
                    raise RuntimeError(f"injected failure after {done} epochs")
        return metrics

    def run_stream(
        self, spark: SparkSession, stream_root: str, fail_after: int | None = None
    ) -> list[dict]:
        """Tail a WAL directory: discover pending epochs (skipping lineage-
        recorded ones — the resume path) and apply them in order."""
        table = self.ensure_table()
        return self.run_batches(
            spark, iter_pending(spark, stream_root, table), fail_after=fail_after
        )

    def metrics_summary(self, metrics: list[dict]) -> dict:
        applied = [m for m in metrics if not m["skipped"]]
        total_rows = sum(m["rows_applied"] for m in applied)
        total_sec = sum(m["seconds"] for m in applied)
        return {
            "epochs_applied": len(applied),
            "epochs_skipped": len(metrics) - len(applied),
            "rows_applied": total_rows,
            "seconds": total_sec,
            "events_per_sec": total_rows / total_sec if total_sec else None,
            "started_at": time.time(),
        }
