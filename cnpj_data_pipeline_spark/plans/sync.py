"""FeedSyncJob — the CDC *consumer* job: tail a lake table's change feed into
a second lake table, incrementally and exactly-once.

The producer half of the engine tails an upstream WAL into a lake table
(``IngestJob``); this is the downstream half: derived tables, replicas, and
indexes stay fresh by consuming ``LakeTable.read_changes`` windows instead of
re-reading state. Two built-in shapes:

- **mirror** (``transform=None``): an incremental lake->lake replica — the
  cross-region / cross-tier replication job. Schema evolution flows through
  (an ``evolve`` window pads old deltas, the merge unions the schema).
- **derived** (``transform=fn``): any payload-level projection/enrichment
  (e.g. per-turn text stats); deletes propagate because the base's op/lsn
  ride along.

Exactly-once without a separate consumer-offset store: epochs are the unit
of progress, and the DERIVED table's own ``applied_epochs`` set is the
consumer checkpoint — the same idempotent-replay guard the ingest uses
(reference analogue: the processed-files ledger, ``main.py:100-131``). A
crash mid-sync re-runs from the top; applied epochs skip at metadata cost.

Per-sync cost is O(changed data): each window reads only the delta files the
base's apply commit appended, and the merge is the same O(batch) MoR append.
At 10^10 rows the derived table is never rebuilt and the base is never
re-scanned — the property that makes N consumers affordable.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark.config import EngineConfig
from cnpj_data_pipeline_spark.lake.format import (
    LSN_META_COL,
    OP_META_COL,
    LakeTable,
)
from cnpj_data_pipeline_spark.operators.merge import apply_changes

Transform = Callable[[DataFrame], DataFrame]


def _apply_snapshots(table: LakeTable) -> list[dict]:
    return [
        s for s in table.snapshots()
        if s["op"] in ("append", "evolve") and s.get("epoch") is not None
    ]


def _pending_windows(
    applies: list[dict],
    done: set[int],
    max_window_epochs: int | None = None,
) -> list[tuple[list[dict], int]]:
    """Group the PENDING apply snapshots into contiguous catch-up windows:
    ``(snapshots, window_start_sid)`` pairs where every snapshot in the run
    is unapplied and consecutive in the lineage. A window NEVER spans an
    already-applied epoch — the folded feed would re-read (and for delta
    consumers, double-count) that epoch's changes. ``max_window_epochs``
    caps one window's length (admission control for huge backlogs)."""
    windows: list[tuple[list[dict], int]] = []
    run: list[dict] = []
    prev = 0
    for s in applies:
        if s["epoch"] in done:
            if run:
                windows.append((run, prev))
                run = []
            prev = s["snapshot_id"]
            continue
        run.append(s)
        if max_window_epochs is not None and len(run) >= max_window_epochs:
            windows.append((run, prev))
            prev = run[-1]["snapshot_id"]
            run = []
    if run:
        windows.append((run, prev))
    return windows


class FeedSyncJob:
    def __init__(
        self,
        source_root: str,
        derived_root: str,
        transform: Transform | None = None,
        cfg: EngineConfig | None = None,
        n_buckets: int | None = None,
        key_cols: tuple[str, ...] | None = None,
    ):
        """``key_cols`` overrides the derived table's primary key — required
        when the transform changes row identity (e.g. a row-EXPANDING
        transform like the near-dup band index, where one source doc becomes
        one row per band keyed (doc_id, band)). Default: the source's keys
        (1:1 payload transforms)."""
        self.source_root = source_root
        self.derived_root = derived_root
        self.transform = transform
        self.cfg = cfg or EngineConfig()
        self.n_buckets = n_buckets
        self.key_cols = key_cols

    def _envelope(self, feed: DataFrame) -> DataFrame:
        """Feed rows (payload + meta) -> change envelope (payload + op/lsn),
        with the user transform applied to the payload columns."""
        ch = feed.withColumnsRenamed({LSN_META_COL: "lsn", OP_META_COL: "op"})
        if self.transform is not None:
            ch = self.transform(ch)
            missing = {"op", "lsn"} - set(ch.columns)
            if missing:
                raise ValueError(
                    f"transform must preserve the {sorted(missing)} column(s) "
                    "— deletes and LWW ordering ride on them"
                )
        return ch

    def _ensure_derived(self, spark: SparkSession, src: LakeTable) -> LakeTable:
        if LakeTable.exists(self.derived_root):
            return LakeTable.load(self.derived_root)
        # schema: transform applied to an empty frame of the source's payload
        # schema (plus op/lsn so the transform may reference them)
        empty = spark.createDataFrame([], src.physical_schema())
        payload_schema = self._envelope(empty).drop("op", "lsn").schema
        key_cols = list(self.key_cols) if self.key_cols else src.key_cols()
        return LakeTable.create(
            self.derived_root,
            payload_schema,
            key_cols,
            self.n_buckets or src.n_buckets(),
        )

    def run_once(
        self, spark: SparkSession, max_window_epochs: int | None = None
    ) -> dict:
        """Sync every pending base epoch; returns consumer metrics.

        Pending epochs are folded into CATCH-UP WINDOWS: one change-feed read
        + one merge covers a whole run of consecutive pending epochs (LWW is
        associative, so folding the window equals applying its epochs one by
        one), and the window's epochs are marked applied in one atomic
        commit. A consumer resuming after a long pause pays one merge, not
        one per missed epoch. ``max_window_epochs`` bounds a single apply
        (memory/latency admission, the consumer-side twin of the ingest's
        ``max_epochs_per_run``); windows also break at any already-applied
        epoch so a fold can never re-include applied changes."""
        t0 = time.monotonic()
        src = LakeTable.load(self.source_root)
        derived = self._ensure_derived(spark, src)
        applies = _apply_snapshots(src)
        done = derived.applied_epochs()
        synced, rows = [], 0
        for window, prev_sid in _pending_windows(
            applies, done, max_window_epochs
        ):
            feed = src.read_changes(
                spark, prev_sid, window[-1]["snapshot_id"]
            )
            epochs = [s["epoch"] for s in window]
            m = apply_changes(
                spark, derived, self._envelope(feed), epoch=epochs, cfg=self.cfg
            )
            synced.extend(epochs)
            rows += m["rows_applied"]
        lag = len(_apply_snapshots(src)) - len(derived.applied_epochs())
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
        """Poll loop: sync, sleep, repeat (the long-running consumer shape).
        ``max_polls`` bounds the loop for tests/batch drains."""
        totals = {"epochs_synced": [], "rows_applied": 0, "polls": 0}
        while True:
            m = self.run_once(spark)
            totals["epochs_synced"].extend(m["epochs_synced"])
            totals["rows_applied"] += m["rows_applied"]
            totals["polls"] += 1
            if max_polls is not None and totals["polls"] >= max_polls:
                return totals
            time.sleep(poll_seconds)


def text_stats_transform(ch: DataFrame) -> DataFrame:
    """Built-in derived-table transform: per-turn text statistics."""
    return ch.select(
        "conv_id", "turn_idx", "role",
        F.length("text").cast("int").alias("n_chars"),
        F.size(F.split(F.col("text"), " ")).cast("int").alias("n_tokens"),
        "ts", "op", "lsn",
    )
