"""The MERGE/upsert engine — Spark-first re-expression of the reference's
``bulk_upsert`` family (SURVEY J1-J3).

Reference behavior being reproduced (semantics, not mechanics):

* ``INSERT ... ON CONFLICT (pk) DO UPDATE SET col = EXCLUDED.col`` — keyed
  last-writer-wins upsert (``src/database/postgres.py:269-307`` small path,
  ``:397-439`` staged path, ``:441-531`` batched path with ROW_NUMBER dedup).
* Within-batch dedup before merge (``DISTINCT ON`` / ``ROW_NUMBER ... rn = 1``).
* The three cardinality-based physical strategies collapse into one Spark plan:
  AQE handles size adaptivity; per-1M-row slice commits become one atomic
  snapshot commit per change batch (no row locks in a lake).

Physical shape (scale rationale):

1. Bucket every change row on ``xxhash64(conv_id, turn_idx) % n_buckets`` —
   the table's clustering. One shuffle.
2. LWW-dedup the batch per key (window; shuffles by full key — no hot-key
   concentration because turns of a conversation hash independently).
3. Read ONLY the touched buckets' state files (copy-on-write granularity;
   at 10^10 rows a change batch touches a bounded set of buckets and merge
   cost is independent of total table size).
4. Union state + changes and pick the per-key winner under the engine-wide
   total order. Two interchangeable kernels:
   - ``pandas``: ``groupBy(__bucket, __salt).applyInPandas`` — Arrow-vectorized
     pandas sort + drop_duplicates per group, no per-row Python (the shape
     mandated by BASELINE.json input_hint). ``__salt`` sub-splits a bucket by
     full-key hash so a hot bucket spreads over ``salt_factor`` tasks.
   - ``native``: the same LWW window entirely JVM-side (whole-stage codegen).
5. Write winners partitioned by bucket into the next snapshot's staging dir,
   collect footer stats, commit atomically.

Deletes are retained as tombstones (``__op='D'``) so a late event with a lower
LSN than an applied delete still loses deterministically (SURVEY §7.5 hard
part 2); ``LakeTable.vacuum_tombstones`` reclaims them behind an LSN horizon.
"""

from __future__ import annotations

import os
import time
from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cnpj_data_pipeline_spark.config import (
    BUCKET_COL,
    SALT_COL,
    EngineConfig,
)
from cnpj_data_pipeline_spark.lake.format import (
    EpochAlreadyAppliedError,
    LakeTable,
    OP_META_COL,
    batch_to_physical,
    bucket_expr,
    owned_write_conf,
)
from cnpj_data_pipeline_spark.config import LSN_META_COL
from cnpj_data_pipeline_spark.operators.dedup import lww_winners_agg
from cnpj_data_pipeline_spark.schemas import union_schema

ENVELOPE_COLS = ("op", "lsn", "epoch")


def _payload_schema(changes: DataFrame) -> T.StructType:
    # BUCKET_COL can ride in as a partition column when a bucket-aligned WAL
    # epoch (sources.change_stream.write_epoch_bucketed) is read through the
    # general path — it is layout, not payload
    drop = set(ENVELOPE_COLS) | {BUCKET_COL}
    return T.StructType(
        [f for f in changes.schema.fields if f.name not in drop]
    )


def _align(df: DataFrame, schema: T.StructType, extra: Sequence[str]) -> DataFrame:
    """Project df onto schema's columns (missing → typed NULL), keeping extras."""
    cols = []
    have = set(df.columns)
    for f in schema.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    cols += [F.col(c) for c in extra]
    return df.select(*cols)



def _merge_partitions(
    spark: SparkSession,
    n_buckets: int,
    salt_factor: int,
    override: int | None = None,
) -> int:
    """Partition count for the merge shuffle: enough tasks to keep every core
    busy (~2 waves), but never more than the number of (bucket, salt) groups —
    and not thousands of tiny tasks whose serial driver dispatch (~5 ms each)
    would dominate small batches. On a 1000-executor cluster defaultParallelism
    drives this up; n_buckets * salt_factor is the hard cap. An explicit
    ``override`` (cfg.merge_partitions) sizes by data volume instead — the
    scaling bench uses it so N and 4N cores run the identical physical job."""
    if override is not None:
        return max(1, min(n_buckets * salt_factor, override))
    return max(1, min(n_buckets * salt_factor, 2 * spark.sparkContext.defaultParallelism))

def _merge_kernel(key_cols: list[str]):
    """Arrow-vectorized per-group merge: sort by the engine total order
    (lsn, ts, op, then the string tie-breaks present — text, tool, role —
    NULL-coalesced to ''), keep the first row per key. Pure pandas column
    ops — no Python row loop. Must stay bit-identical to
    operators.dedup.lww_winners_agg / lww_order_cols."""
    from cnpj_data_pipeline_spark.operators.dedup import LWW_STRING_TIEBREAKS

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        sort_cols = [c for c in ("lsn", "ts", "op") if c in pdf.columns]
        fills = {}
        for c in LWW_STRING_TIEBREAKS:
            if c in pdf.columns:
                fills[f"__k_{c}"] = pdf[c].fillna("")
                sort_cols.append(f"__k_{c}")
        pdf = pdf.assign(**fills).sort_values(
            sort_cols, ascending=[False] * len(sort_cols), kind="mergesort"
        )
        out = pdf.drop_duplicates(subset=key_cols, keep="first")
        return out.drop(columns=list(fills))

    return kernel


def _skipped_by_race(table: LakeTable, epoch, t0: float) -> dict:
    """A concurrent writer applied this epoch between our entry check and our
    commit CAS — exactly-once means our staged files stay orphaned (GC'd by
    clean_orphans) and the apply reports itself as skipped."""
    return {
        "epoch": epoch,
        "skipped": True,
        "skipped_by": "concurrent-writer",
        "rows_applied": 0,
        "buckets_touched": 0,
        "seconds": round(time.monotonic() - t0, 3),
        "snapshot_id": table.current_snapshot_id(),
    }


def _staged_result(
    table: LakeTable,
    epoch,
    epochs: list[int],
    updates: dict[int, dict],
    new_schema,
    stage: str,
    t0: float,
    phases: dict,
    evolved_changed: bool,
    merged: bool = True,
) -> dict:
    """Persist the pending-commit descriptor (WAP stage) and report it."""
    token = table.stage_commit(
        op="evolve" if evolved_changed else "append",
        epochs=epochs,
        bucket_updates=updates,
        new_schema=new_schema,
        stage_dir=stage,
        merged=merged,
    )
    return {
        "epoch": epoch,
        "skipped": False,
        "staged": True,
        "token": token,
        "rows_staged": sum(u["rows"] for u in updates.values()),
        "rows_applied": 0,
        "buckets_touched": len(updates),
        "seconds": round(time.monotonic() - t0, 3),
        "snapshot_id": None,
        # highest LSN in the staged batch: a transaction uses it as the
        # floor for later driver statements' minted LSNs, so statement
        # order inside the block decides the fold even when an earlier
        # MERGE staged WAL offsets far above the published high-water mark
        "max_lsn": max(
            (
                u["max_lsn"]
                for u in updates.values()
                if u.get("max_lsn") is not None
            ),
            default=None,
        ),
        "phases": phases,
    }


def apply_changes(
    spark: SparkSession,
    table: LakeTable,
    changes: DataFrame,
    epoch: int | Sequence[int] | None,
    cfg: EngineConfig | None = None,
    batch_rows_hint: int | None = None,
    props: dict | None = None,
    expected_props: dict | None = None,
    stage_only: bool = False,
) -> dict:
    """Apply one change batch (epoch) to the lake table with exactly-once,
    LWW, schema-evolution and skew-safe semantics. Returns metrics.

    ``epoch`` may be a SEQUENCE of epochs when ``changes`` is the fold of a
    multi-epoch catch-up window (the consumer backlog path): the merge runs
    once over the whole window and the commit atomically marks every epoch
    in it applied — all-or-nothing, same exactly-once ledger.

    ``epoch=None`` opts OUT of the integer-epoch ledger; the caller must
    then supply ``props``/``expected_props`` as its exactly-once guard (the
    frontier-CAS path, e.g. a join view tracking one frontier per source —
    see ``LakeTable.commit``). A stale frontier surfaces as
    :class:`CommitConflictError` from the commit.

    ``stage_only=True`` is the WRITE-AUDIT-PUBLISH entry: the full merge
    pipeline runs (shuffle, LWW, staged parquet, footer stats) but instead
    of committing, a pending-commit descriptor is persisted and its token
    returned (``metrics["token"]``) — the batch stays invisible until
    ``LakeTable.publish_staged(token)`` or is dropped by
    ``abandon_staged``. Append-mode paths only (MoR / keyless): a staged
    CoW rewrite could not rebase over intervening commits at publish time."""
    cfg = cfg or EngineConfig()
    t0 = time.monotonic()
    phases: dict[str, float] = {}
    _last = [t0]

    def _mark(name: str) -> None:
        now = time.monotonic()
        phases[name] = round(now - _last[0], 3)
        _last[0] = now

    if epoch is None and expected_props is None:
        raise ValueError(
            "epoch=None requires expected_props — some exactly-once guard "
            "must protect the apply"
        )
    if stage_only and (epoch is None or props or expected_props):
        raise ValueError(
            "stage_only requires an integer epoch ledger and no table "
            "properties — the publish is a plain append commit"
        )
    epoch_set = (
        {epoch} if isinstance(epoch, int)
        else set() if epoch is None
        else set(epoch)
    )
    already = epoch_set & table.applied_epochs()
    if epoch_set and already == epoch_set:
        # Idempotent replay guard — the reference's processed-files skip
        # (main.py:100-131), at change-batch granularity.
        return {
            "epoch": epoch,
            "skipped": True,
            "rows_applied": 0,
            "buckets_touched": 0,
            "seconds": 0.0,
            "snapshot_id": table.current_snapshot_id(),
        }
    if already:
        raise ValueError(
            f"window epochs {sorted(already)} already applied but "
            f"{sorted(epoch_set - already)} are not — a folded batch cannot "
            "be partially replayed; re-plan the window over pending epochs"
        )

    snap = table.snapshot()
    # CHECK constraints (lake/constraints.py): fail / drop / dlq the
    # violating events BEFORE the merge, against LOGICAL names (the
    # language constraints are declared in). One map-only pass over the
    # batch; tables without constraints skip this entirely.
    constraint_counts = None
    if any(
        k.startswith("constraint.") and v is not None
        for k, v in (snap.get("props") or {}).items()
    ):
        from cnpj_data_pipeline_spark.lake.constraints import enforce_general

        changes, constraint_counts = enforce_general(
            spark,
            snap,
            changes,
            epoch
            if isinstance(epoch, int)
            else f"{min(epoch_set)}-{max(epoch_set)}",
            os.path.join(table.root, "_dlq", "constraints"),
            table.logical_schema(),
        )
        _mark("constraints")
    # GENERATED columns (lake/generated.py): compute absent declared
    # columns (one fused Catalyst projection), verify supplied ones (one
    # map-only pass). Tables without declarations skip this entirely.
    if any(
        k.startswith("generated.") and v is not None
        for k, v in (snap.get("props") or {}).items()
    ):
        from cnpj_data_pipeline_spark.lake.generated import enforce_generated

        changes = enforce_generated(
            spark,
            snap,
            changes,
            epoch
            if isinstance(epoch, int)
            else f"{min(epoch_set)}-{max(epoch_set)}",
            table.logical_schema(),
        )
        _mark("generated")
    # renamed columns: producers speak logical names, files store physical
    # — map the batch at the boundary (identity when nothing was renamed)
    changes = batch_to_physical(changes, snap)
    key_cols = list(snap["key_cols"]) if snap["key_cols"] is not None else None
    bucket_cols = LakeTable._bucket_cols_of(snap)
    n_buckets = int(snap["n_buckets"])
    engine = snap.get("merge_engine", "lww")
    if engine != "lww" and cfg.write_mode != "mor":
        raise ValueError(
            f"merge_engine={engine!r} requires the merge-on-read write "
            "path — a copy-on-write apply materializes whole rows, which "
            "is the LWW semantics these engines exist to avoid"
        )
    if stage_only and key_cols is not None and cfg.write_mode != "mor":
        raise ValueError(
            "stage_only (write-audit-publish) requires the merge-on-read "
            "write path — a staged CoW rewrite cannot rebase at publish time"
        )

    # -- schema evolution (additive): table schema ∪ batch payload schema
    base_schema = table.schema()
    # key columns are FROZEN at the table's type: xxhash64 is
    # type-sensitive, so widening a key would hash the same logical key
    # into a different bucket than its existing versions — drifted key
    # batches cast down to the table type instead (pre-widening semantics)
    evolved = union_schema(
        base_schema, _payload_schema(changes), frozen=key_cols or (),
        dropped=snap.get("dropped_cols") or (),
    )
    # field-list comparison, not a length check: a WIDENING evolution
    # (int -> long) changes a type without adding a column
    evolved_changed = evolved.fields != base_schema.fields

    # -- normalize the batch: payload aligned to evolved schema + (op, lsn)
    ch = changes
    if "epoch" in ch.columns:
        ch = ch.drop("epoch")
    ch = _align(ch, evolved, extra=["op", "lsn"])
    ch = ch.withColumn(BUCKET_COL, bucket_expr(bucket_cols, n_buckets))

    # NOTE: no separate within-batch LWW pass here. The merge kernel below
    # applies the same total order across state ∪ changes, so batch-internal
    # duplicates resolve identically — pre-deduplicating would add a full
    # extra shuffle (window by key) for no semantic gain. The standalone
    # operator remains available as operators.dedup.lww_dedup (W1).

    _mark("plan")

    if key_cols is None:
        # KEYLESS APPEND-ONLY path (the reference's no-PK table family:
        # ``socios``/``dados_simples`` take pure executemany INSERT with no
        # conflict clause, src/database/postgres.py:213-214 +
        # init-db/postgres.sql:104-119). Every change row is an insert: no
        # LWW, no state read, no tombstones — just bucket, append delta
        # files, and commit atomically with lineage. Exactly-once comes from
        # the same applied_epochs guard as keyed tables. One shuffle
        # (repartition on bucket) bounds output files to one per bucket per
        # epoch regardless of source partitioning.
        parted = ch.repartition(
            _merge_partitions(spark, n_buckets, 1, cfg.merge_partitions),
            F.col(BUCKET_COL),
        )
        phys = parted.select(
            *[F.col(f.name) for f in evolved.fields],
            F.col("lsn").alias(LSN_META_COL),
            F.col("op").alias(OP_META_COL),
            F.col(BUCKET_COL),
        )
        if cfg.write_audit_col:
            phys = phys.withColumn(cfg.audit_col, F.current_timestamp())
        stage = table.new_staging_dir()
        _mark("build_plan")
        with owned_write_conf(spark):
            phys.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(stage)
        _mark("append_write")
        updates = table.collect_staged(stage, spark, blooms=cfg.key_blooms)
        _mark("collect_staged")
        if stage_only:
            return _staged_result(
                table, epoch, sorted(epoch_set), updates,
                evolved if evolved_changed else None, stage, t0, phases,
                evolved_changed,
            )
        try:
            sid = table.commit(
                op="evolve" if evolved_changed else "append",
                epoch=epoch,
                bucket_updates=updates,
                new_schema=evolved if evolved_changed else None,
                mode="append",
                expected_parent=snap["snapshot_id"],
                props=props,
                expected_props=expected_props,
            )
        except EpochAlreadyAppliedError:
            return _skipped_by_race(table, epoch, t0)
        _mark("commit")
        return {
            "epoch": epoch,
            "skipped": False,
            "rows_applied": sum(u["rows"] for u in updates.values()),
            "buckets_touched": len(updates),
            "seconds": time.monotonic() - t0,
            "snapshot_id": sid,
            "schema_evolved": evolved_changed,
            "phases": phases,
            **(
                {"constraint_violations": constraint_counts}
                if constraint_counts is not None
                else {}
            ),
        }

    if cfg.write_mode == "mor":
        # MERGE-ON-READ fast path: no state read at all. LWW-dedup the batch
        # (batch losers can never be global winners — the total order is the
        # same one readers apply), append the winners as delta files to their
        # buckets, commit. Per-epoch cost is O(batch) regardless of table
        # size — the property that keeps ingest linear at 10^10 events where
        # every batch touches every bucket and CoW would be quadratic.
        # Single shuffle: repartition on (bucket, salt-of-full-key), then the
        # LWW hash aggregate grouped by (bucket, salt, key) reuses that
        # partitioning (HashPartitioning on a subset of the group keys
        # satisfies its ClusteredDistribution) — no second exchange, no sort;
        # each output task holds exactly one (bucket, salt) group → one file
        # per task.
        ch = ch.withColumn(
            SALT_COL,
            F.pmod(
                F.xxhash64(*[F.col(c) for c in key_cols], F.lit(cfg.salt_seed)),
                F.lit(cfg.salt_factor),
            ).cast("int"),
        )
        parted = ch.repartition(
            _merge_partitions(spark, n_buckets, cfg.salt_factor, cfg.merge_partitions),
            F.col(BUCKET_COL),
            F.col(SALT_COL),
        )
        extra_meta: list = []
        if engine != "lww":
            # per-column fold: within-batch folding stays correct for
            # out-of-order streams because the fold emits per-column origin
            # LSNs, and monoid (sum/min/max) columns are associative by
            # algebra — the batch's folded row is refoldable against
            # anything (operators/partial.py). Same exchange reuse as the
            # LWW agg. Aggregate tables reject tombstones HERE (a sum
            # cannot retract a contribution a compaction already folded);
            # the raise rides the fold's own scan via raise_error — zero
            # cost on the delete-free path, no extra batch pass.
            from cnpj_data_pipeline_spark.operators.partial import (
                COL_LSNS_META_COL,
                DEL_LSN_META_COL,
                partial_winners_agg,
            )

            if engine == "aggregate":
                parted = parted.withColumn(
                    "lsn",
                    F.when(
                        F.col("op") == "D",
                        F.raise_error(
                            F.lit(
                                "merge_engine='aggregate' rejects "
                                "tombstones: a folded sum cannot retract a "
                                "contribution; model removals as explicit "
                                "negative deltas"
                            )
                        ).cast("long"),
                    ).otherwise(F.col("lsn")),
                )
            key_set = set(key_cols)
            winners = partial_winners_agg(
                parted,
                [BUCKET_COL, SALT_COL, *key_cols],
                [f.name for f in evolved.fields if f.name not in key_set],
                agg_spec=snap.get("agg_spec"),
            ).drop(SALT_COL)
            extra_meta = [F.col(COL_LSNS_META_COL), F.col(DEL_LSN_META_COL)]
        else:
            winners = lww_winners_agg(
                parted, [BUCKET_COL, SALT_COL, *key_cols]
            ).drop(SALT_COL)
        phys = winners.select(
            *[F.col(f.name) for f in evolved.fields],
            F.col("lsn").alias(LSN_META_COL),
            F.col("op").alias(OP_META_COL),
            *extra_meta,
            F.col(BUCKET_COL),
        )
        if cfg.write_audit_col:
            phys = phys.withColumn(cfg.audit_col, F.current_timestamp())

        stage = table.new_staging_dir()
        _mark("build_plan")
        with owned_write_conf(spark):
            phys.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(stage)
        _mark("merge_write")
        updates = table.collect_staged(stage, spark, blooms=cfg.key_blooms)
        _mark("collect_staged")
        if stage_only:
            return _staged_result(
                table, epoch, sorted(epoch_set), updates,
                evolved if evolved_changed else None, stage, t0, phases,
                evolved_changed,
            )
        try:
            sid = table.commit(
                op="evolve" if evolved_changed else "append",
                epoch=epoch,
                bucket_updates=updates,
                new_schema=evolved if evolved_changed else None,
                mode="append",
                expected_parent=snap["snapshot_id"],
                props=props,
                expected_props=expected_props,
            )
        except EpochAlreadyAppliedError:
            return _skipped_by_race(table, epoch, t0)
        _mark("commit")
        compacted_sid = None
        if cfg.compact_threshold:
            # inline auto-compaction rides the GATED ingest path: under
            # "auto" it stays footer-only (blooms are built by explicit
            # maintenance — run_maintenance.py / table.compact — where
            # Iceberg likewise spends its stats budget); "force" pays the
            # extra column-pruned read per rewritten file here too
            compacted_sid = table.compact_if_needed(
                spark,
                cfg.compact_threshold,
                salt_factor=cfg.salt_factor,
                max_buckets=cfg.compact_max_buckets,
                blooms=cfg.key_blooms == "force",
            )
            if compacted_sid is not None:
                sid = compacted_sid
                _mark("compact")
        secs = time.monotonic() - t0
        rows_applied = sum(u["rows"] for u in updates.values())
        return {
            "epoch": epoch,
            "skipped": False,
            "rows_applied": rows_applied,
            "buckets_touched": len(updates),
            "seconds": secs,
            "snapshot_id": sid,
            "schema_evolved": evolved_changed,
            "compacted": compacted_sid is not None,
            "phases": phases,
            **(
                {"constraint_violations": constraint_counts}
                if constraint_counts is not None
                else {}
            ),
        }

    # -- touched buckets (bounded by n_buckets; tiny driver-side list).
    # When the batch is large relative to the bucket count (cheap footer-level
    # row-count hint from the WAL source), every bucket is touched with
    # overwhelming probability ((1-1/B)^n), so skip the distinct scan — treating
    # an actually-empty bucket as touched is correct (its state is read and
    # rewritten unchanged), it only costs a little write amplification.
    if batch_rows_hint is not None and batch_rows_hint >= 16 * n_buckets:
        touched = list(range(n_buckets))
    else:
        touched = sorted(
            r[0] for r in ch.select(BUCKET_COL).distinct().collect()
        )
    _mark("touched_scan")
    if not touched:
        try:
            sid = table.commit(
                op="merge", epoch=epoch, bucket_updates={},
                props=props, expected_props=expected_props,
            )
        except EpochAlreadyAppliedError:
            return _skipped_by_race(table, epoch, t0)
        return {
            "epoch": epoch,
            "skipped": False,
            "rows_applied": 0,
            "buckets_touched": 0,
            "seconds": time.monotonic() - t0,
            "snapshot_id": sid,
        }

    # -- current state of touched buckets, padded to the evolved schema,
    #    re-enveloped with its ORIGINAL (lsn, op) so the combined LWW total
    #    order is exactly the oracle's (no state-vs-change special cases).
    state = table.read_state_for_merge(spark, touched, evolved)
    state_env = state.select(
        *[F.col(f.name) for f in evolved.fields],
        F.col(OP_META_COL).alias("op"),
        F.col(LSN_META_COL).alias("lsn"),
        F.col(BUCKET_COL),
    )

    combined = state_env.unionByName(ch)

    # -- per-key winner
    if cfg.merge_strategy == "native":
        # SINGLE-SHUFFLE merge: repartition once on (bucket, salt-of-full-key),
        # then run the LWW window partitioned by (bucket, salt, key...). Because
        # (bucket, salt) is a subset of the window's partition keys, the
        # HashPartitioning from the explicit repartition already satisfies the
        # window's ClusteredDistribution — EnsureRequirements inserts only a
        # local sort, no second exchange. The explicit numPartitions also keeps
        # AQE from coalescing the write stage below the core count, and each
        # output task holds exactly one (bucket, salt) group, so partitionBy
        # emits exactly one file per task (bounded file counts at scale).
        from pyspark.sql import Window

        combined = combined.withColumn(
            SALT_COL,
            F.pmod(
                F.xxhash64(*[F.col(c) for c in key_cols], F.lit(cfg.salt_seed)),
                F.lit(cfg.salt_factor),
            ).cast("int"),
        )
        n_parts = min(
            _merge_partitions(spark, n_buckets, cfg.salt_factor, cfg.merge_partitions),
            max(len(touched) * cfg.salt_factor, 1),
        )
        parted = combined.repartition(
            n_parts, F.col(BUCKET_COL), F.col(SALT_COL)
        )
        merged = lww_winners_agg(
            parted, [BUCKET_COL, SALT_COL, *key_cols]
        ).drop(SALT_COL)
    else:
        # salted grouped-map merge: group key is (bucket, salt-of-full-key) so a
        # hot bucket splits across salt_factor Arrow tasks while each
        # (conv_id, turn_idx) stays within exactly one group.
        combined = combined.withColumn(
            SALT_COL,
            F.pmod(
                F.xxhash64(*[F.col(c) for c in key_cols], F.lit(cfg.salt_seed)),
                F.lit(cfg.salt_factor),
            ).cast("int"),
        )
        out_schema = T.StructType(
            list(evolved.fields)
            + [
                T.StructField("op", T.StringType(), False),
                T.StructField("lsn", T.LongType(), False),
                T.StructField(BUCKET_COL, T.IntegerType(), False),
                T.StructField(SALT_COL, T.IntegerType(), False),
            ]
        )
        merged = (
            combined.groupBy(BUCKET_COL, SALT_COL)
            .applyInPandas(_merge_kernel(key_cols), schema=out_schema)
            .drop(SALT_COL)
        )

    # -- physical rows: payload + __lsn/__op (tombstones kept)
    phys = merged.select(
        *[F.col(f.name) for f in evolved.fields],
        F.col("lsn").alias(LSN_META_COL),
        F.col("op").alias(OP_META_COL),
        F.col(BUCKET_COL),
    )
    if cfg.write_audit_col:
        phys = phys.withColumn(cfg.audit_col, F.current_timestamp())

    stage = table.new_staging_dir()
    _mark("build_plan")
    with owned_write_conf(spark):
        phys.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(stage)
    _mark("merge_write")

    updates = table.collect_staged(stage, spark, blooms=cfg.key_blooms)
    _mark("collect_staged")
    # a touched bucket can stage zero files only if all its rows vanished —
    # impossible under tombstone retention, but keep the manifest consistent:
    for b in touched:
        updates.setdefault(b, {"files": [], "rows": 0, "max_lsn": None})

    try:
        sid = table.commit(
            op="evolve" if evolved_changed else "merge",
            epoch=epoch,
            bucket_updates=updates,
            new_schema=evolved if evolved_changed else None,
            expected_parent=snap["snapshot_id"],
            props=props,
            expected_props=expected_props,
        )
    except EpochAlreadyAppliedError:
        return _skipped_by_race(table, epoch, t0)
    _mark("commit")
    secs = time.monotonic() - t0
    rows_applied = sum(u["rows"] for u in updates.values())
    return {
        "epoch": epoch,
        "skipped": False,
        "rows_applied": rows_applied,
        "buckets_touched": len(touched),
        "seconds": secs,
        "snapshot_id": sid,
        "schema_evolved": evolved_changed,
        "phases": phases,
        **(
            {"constraint_violations": constraint_counts}
            if constraint_counts is not None
            else {}
        ),
    }
