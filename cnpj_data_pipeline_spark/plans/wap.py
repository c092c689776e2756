"""Write-Audit-Publish ingestion: every change batch is STAGED invisibly
(the full merge pipeline runs, nothing commits), AUDITED with declarative
quality checks, and only then PUBLISHED — or quarantined without any reader
ever having seen it.

Iceberg's WAP pattern on this format's staged-commit descriptors
(``LakeTable.stage_commit`` / ``publish_staged`` / ``abandon_staged``). The
reference has no pre-publish gate — a corrupted extraction lands in Postgres
and is repaired after the fact (its failure handling marks files processed
even on partial failure, ``main.py:180-189``); here ``LakeTable.rollback``
remains for after-the-fact repair, but the WAP gate prevents the bad publish
entirely — the stronger property for a pipeline feeding model training.

Scale shape: the audit is ONE aggregate job over the staged rows (every
check contributes one JVM-side aggregate expression to a single ``agg`` —
no per-check scans), and the staged preview reads only manifest metadata
plus the staged files. Publish is an append-mode optimistic commit, so it
rebases over anything that landed during the audit.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark.config import EngineConfig
from cnpj_data_pipeline_spark.lake.format import (
    LakeTable,
    OP_META_COL,
)
from cnpj_data_pipeline_spark.operators.merge import apply_changes


class AuditFailedError(RuntimeError):
    """A staged batch failed its audit under ``on_audit_failure="raise"``.
    The batch was quarantined (staged files deleted, epoch NOT applied) —
    fixing the upstream extraction and re-running the ingest retries it."""

    def __init__(self, epoch, failures: dict):
        super().__init__(
            f"epoch {epoch} failed audit: {failures} — batch quarantined, "
            "epoch left pending for a fixed re-extraction"
        )
        self.epoch = epoch
        self.failures = failures


@dataclass(frozen=True)
class AuditCheck:
    """One declarative audit rule: an aggregate expression computed over the
    audit scope (one shared job for all checks) and a pass predicate on its
    value."""

    name: str
    expr: Column
    ok: Callable[[object], bool]


def min_rows(n: int) -> AuditCheck:
    """The batch must stage at least ``n`` rows (an empty or truncated
    extraction is suspicious, reference analogue: zero-row download)."""
    return AuditCheck(
        name=f"rows_ge_{n}",
        expr=F.count(F.lit(1)).cast("long"),
        ok=lambda v: (v or 0) >= n,
    )


def max_null_rate(col: str, rate: float) -> AuditCheck:
    """NULL share of ``col`` must not exceed ``rate`` — the classic upstream
    extraction bug (a renamed source field arrives as all-NULL)."""
    return AuditCheck(
        name=f"null_rate_{col}_le_{rate}",
        expr=F.avg(F.col(col).isNull().cast("double")),
        ok=lambda v: v is None or v <= rate,
    )


def max_delete_rate(rate: float) -> AuditCheck:
    """Tombstone share must not exceed ``rate`` — a delete storm usually
    means an upstream truncate/re-snapshot, not real deletes. Audit scope
    must be ``delta`` (the op column lives on staged rows)."""
    return AuditCheck(
        name=f"delete_rate_le_{rate}",
        expr=F.avg((F.col(OP_META_COL) == "D").cast("double")),
        ok=lambda v: v is None or v <= rate,
    )


def keys_not_null(key_cols: Sequence[str]) -> AuditCheck:
    """No staged row may have a NULL key component (it would be unmergeable
    and unpointable forever)."""
    cond = None
    for c in key_cols:
        n = F.col(c).isNull()
        cond = n if cond is None else (cond | n)
    return AuditCheck(
        name="null_keys",
        expr=F.sum(cond.cast("long")).cast("long"),
        ok=lambda v: (v or 0) == 0,
    )


class WapIngestJob:
    """Apply change batches through the stage → audit → publish gate.

    ``audit_scope``: ``"delta"`` (default) audits the staged batch rows
    themselves — O(batch), the right default at scale; ``"table"`` audits the
    full post-publish preview (current head ∪ staged deltas, LWW-resolved) —
    for invariants about the table, at O(table) read cost per batch."""

    def __init__(
        self,
        table_root: str,
        checks: Sequence[AuditCheck],
        cfg: EngineConfig | None = None,
        audit_scope: str = "delta",
    ):
        if audit_scope not in ("delta", "table"):
            raise ValueError(f"unknown audit_scope {audit_scope!r}")
        self.table_root = table_root
        self.checks = list(checks)
        self.cfg = cfg or EngineConfig()
        self.audit_scope = audit_scope

    def apply(
        self,
        spark: SparkSession,
        changes: DataFrame,
        epoch: int | Sequence[int],
        batch_rows_hint: int | None = None,
    ) -> dict:
        """Stage, audit, and publish (or quarantine) one change batch.
        Returns the apply metrics plus ``published``, the per-check audit
        values, and ``audit_failures`` when quarantined."""
        table = LakeTable.load(self.table_root)
        from cnpj_data_pipeline_spark.plans.pipeline import CopartBatch

        if isinstance(changes, CopartBatch):
            # the audit gate composes with the shuffle-free bucket-aligned
            # apply: stage via the map-only kernel, audit/publish identically
            from cnpj_data_pipeline_spark.operators.copart import (
                apply_changes_copart,
            )

            m = apply_changes_copart(
                spark, table, changes.bucket_files, epoch, cfg=self.cfg,
                stage_only=True,
            )
        else:
            m = apply_changes(
                spark, table, changes, epoch, cfg=self.cfg,
                batch_rows_hint=batch_rows_hint, stage_only=True,
            )
        if m.get("skipped"):
            return m
        token = m["token"]
        t0 = time.monotonic()
        values: dict[str, object] = {}
        failures: dict[str, object] = {}
        if self.checks:
            df = self._audit_frame(spark, table, token)
            row = df.agg(
                *[c.expr.alias(c.name) for c in self.checks]
            ).collect()[0]
            for c in self.checks:
                values[c.name] = row[c.name]
                if not c.ok(row[c.name]):
                    failures[c.name] = row[c.name]
        m["audit"] = values
        m["audit_seconds"] = round(time.monotonic() - t0, 3)
        if failures:
            st = table.abandon_staged(token)
            m.update(
                published=False,
                audit_failures=failures,
                quarantined_files=st["files_removed"],
            )
            return m
        sid = table.publish_staged(token)
        m.update(published=True, snapshot_id=sid, rows_applied=m["rows_staged"])
        return m

    def _audit_frame(
        self, spark: SparkSession, table: LakeTable, token: str
    ) -> DataFrame:
        if self.audit_scope == "delta":
            return table.read_staged(spark, token, only_delta=True)
        return table.read_staged(spark, token, include_meta=True)

    def read(self, spark: SparkSession) -> DataFrame:
        return LakeTable.load(self.table_root).read(spark)
