"""Lakehouse-lite: a from-scratch Iceberg-semantics table format on Parquet.

Why from scratch: this sandbox has no network and no iceberg/delta runtime jars
(verified), and the north rule demands a from-scratch engine, not a port. The
format reproduces the Iceberg properties the engine needs:

* **Snapshot isolation + atomic commit** — data files are written under a
  staging path that no reader can discover; a JSON snapshot manifest is written
  next; visibility flips only when the ``_current`` pointer file is atomically
  replaced (``os.replace``). A crash at any earlier step leaves the table
  unchanged (orphan files are GC-able). This fixes the reference's
  mark-after-partial-failure window (``main.py:180-189`` marks every file
  processed even when some failed) by making the snapshot the only commit point.
* **Exactly-once lineage** — each snapshot embeds the epoch it applied plus
  per-bucket ``(rows, max_lsn)`` watermarks; the cumulative ``applied_epochs``
  set is the replacement for the reference's ``processed_files`` checkpoint
  table (``src/database/postgres.py:122-196``).
* **Additive schema evolution** — the snapshot carries the table schema; old
  data files are read with the evolved schema (missing columns → NULL), the
  `mergeSchema` semantics done explicitly.
* **File-level stats (manifest-style)** — per data file we record row count and
  min/max LSN straight from Parquet footers (no data scan), Iceberg-manifest
  style, enabling watermark queries and future pruning without touching data.
* **Time travel** — any historical snapshot can be read by id.

Physical layout::

    <root>/data/snap-<N>/__bucket=<b>/part-*.parquet
    <root>/meta/snapshot-<N>.json
    <root>/meta/_current          # contents: "<N>"

Rows are clustered into ``n_buckets`` hash buckets on
``xxhash64(conv_id, turn_idx)``. Two write paths (Iceberg CoW-vs-MoR trade):

* **merge-on-read (default)** — each epoch appends its LWW winners as delta
  files to the touched buckets (cost O(batch), independent of table size —
  the property that keeps ingest viable at 10^10 rows where every batch
  touches every bucket). A per-bucket ``merged`` flag records whether the
  bucket holds exactly one winner per key; readers run the LWW window only
  over unmerged buckets. ``compact()`` rewrites multi-generation buckets back
  to one winner per key, bounding read cost.
* **copy-on-write** — a merge rewrites touched buckets to final state
  (cheap reads, O(table) writes when batches touch all buckets).

Tombstones (``__op = 'D'``) are retained so late events with lower LSN
than an applied delete lose deterministically; ``vacuum()`` drops tombstones
below a caller-supplied LSN horizon.

Meta columns stored per row: ``__lsn`` (the LSN that produced the row) and
``__op`` (its original op) — keeping the original op means re-merging state
rows against late/duplicate events reproduces exactly the same total order the
oracle uses, no special state-vs-change tie rules.

Single-writer protocol (one driver commits): snapshot ids must advance
monotonically (checked at snapshot-write time), a crashed commit's retry of
the same id safely overwrites its own orphan manifest, and visibility is only
ever the pointer swap; readers never lock.
"""

from __future__ import annotations

import datetime as _dt
import glob
import json
import os
import time as _time
from typing import Callable, Iterable, Sequence

import pyarrow.parquet as _pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cnpj_data_pipeline_spark.config import (
    BUCKET_COL,
    LSN_META_COL,
)
from cnpj_data_pipeline_spark.schemas import schema_from_json, union_schema

OP_META_COL = "__op"
PHYSICAL_META_FIELDS = [
    T.StructField(LSN_META_COL, T.LongType(), False),
    T.StructField(OP_META_COL, T.StringType(), False),
]


def bucket_expr(key_cols: Sequence[str] | None, n_buckets: int, lsn_col: str = "lsn"):
    """Stable bucket assignment on the FULL key. Hashing (conv_id, turn_idx)
    rather than conv_id alone spreads a hot conversation's turns over many
    buckets — the skew mitigation the north rule asks for, applied at the
    storage layout level.

    Keyless (append-only) tables bucket on the LSN instead — any even spread
    works because no per-key locality is required (there are no keys)."""
    if key_cols:
        cols = [F.col(c) for c in key_cols]
    else:
        cols = [F.col(lsn_col)]
    return F.pmod(F.xxhash64(*cols), F.lit(n_buckets)).cast("int")


def _utcnow_iso() -> str:
    return _dt.datetime.now(_dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%fZ")


# Driver-side metadata IO retry: the TableFormat claims object-store
# readiness, and object stores throw transient errors where a local FS never
# does. Mirrors the reference's DB-op backoff wrapper semantics
# (src/database/postgres.py:16-57: bounded attempts, exponential sleep) for
# the pointer/manifest reads and writes — the executors' data IO already has
# Spark task retries; this covers the driver's commit path.
_RETRY_ATTEMPTS = 5
_RETRY_BASE_SLEEP = 0.05


def _retry_io(fn: Callable, *args, **kwargs):
    last: Exception | None = None
    for attempt in range(_RETRY_ATTEMPTS):
        try:
            return fn(*args, **kwargs)
        except FileNotFoundError:
            # not transient: a missing manifest means the snapshot was
            # expired (or the table never existed) — surface immediately
            raise
        except OSError as e:
            last = e
            if attempt < _RETRY_ATTEMPTS - 1:
                _time.sleep(_RETRY_BASE_SLEEP * (2**attempt))
    raise last


def _file_stats(path: str, lsn_col: str = LSN_META_COL) -> dict:
    """Row count + min/max LSN from the Parquet footer only (no data read) —
    the Iceberg-manifest trick that makes watermark/pruning metadata free."""
    md = _pq.ParquetFile(path).metadata
    rows = md.num_rows
    lo = hi = None
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            if col.path_in_schema == lsn_col and col.statistics is not None:
                st = col.statistics
                if st.has_min_max:
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
    return {"rows": rows, "min_lsn": lo, "max_lsn": hi}


class LakeTable:
    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        self.meta_dir = os.path.join(self.root, "meta")
        self.data_dir = os.path.join(self.root, "data")

    # ---------------- lifecycle ----------------

    @classmethod
    def create(
        cls,
        root: str,
        schema: T.StructType,
        key_cols: Sequence[str] | None,
        n_buckets: int,
    ) -> "LakeTable":
        """``key_cols=None`` declares a KEYLESS append-only table (the
        reference's no-PK ``socios`` path, src/database/postgres.py:213-214,
        init-db/postgres.sql:104-119): every change row is a pure insert with
        lineage/exactly-once, no LWW resolution, no tombstones."""
        t = cls(root)
        if os.path.exists(t._pointer_path()):
            raise FileExistsError(f"table already exists at {root}")
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        snap = {
            "snapshot_id": 0,
            "parent_id": None,
            "epoch": None,
            "op": "create",
            "schema": schema.json(),
            "key_cols": list(key_cols) if key_cols is not None else None,
            "n_buckets": int(n_buckets),
            "buckets": {},
            "applied_epochs": [],
            "lineage": [],
            "rows_total": 0,
            "committed_at": _utcnow_iso(),
        }
        t._write_snapshot(snap)
        t._swap_pointer(0)
        return t

    @classmethod
    def load(cls, root: str) -> "LakeTable":
        t = cls(root)
        if not os.path.exists(t._pointer_path()):
            raise FileNotFoundError(f"no lake table at {root}")
        return t

    @classmethod
    def exists(cls, root: str) -> bool:
        return os.path.exists(cls(root)._pointer_path())

    # ---------------- metadata ----------------

    def _pointer_path(self) -> str:
        return os.path.join(self.meta_dir, "_current")

    def _snapshot_path(self, sid: int) -> str:
        return os.path.join(self.meta_dir, f"snapshot-{sid}.json")

    def current_snapshot_id(self) -> int:
        def _read() -> int:
            with open(self._pointer_path()) as f:
                return int(f.read().strip())

        return _retry_io(_read)

    def snapshot(self, sid: int | None = None) -> dict:
        if sid is None:
            sid = self.current_snapshot_id()

        def _read() -> dict:
            with open(self._snapshot_path(sid)) as f:
                return json.load(f)

        return _retry_io(_read)

    def snapshots(self) -> list[dict]:
        """All committed snapshots reachable from the current pointer (lineage
        chain, oldest first) — the time-travel index. The walk stops at the
        expiration horizon: ``expire_snapshots`` deletes old manifests, so a
        missing parent manifest marks truncated history, not corruption."""
        chain = []
        sid: int | None = self.current_snapshot_id()
        while sid is not None:
            try:
                s = self.snapshot(sid)
            except FileNotFoundError:
                break
            chain.append(s)
            sid = s["parent_id"]
        return list(reversed(chain))

    def schema(self, sid: int | None = None) -> T.StructType:
        return schema_from_json(self.snapshot(sid)["schema"])

    def physical_schema(self, sid: int | None = None) -> T.StructType:
        return T.StructType(list(self.schema(sid).fields) + PHYSICAL_META_FIELDS)

    def key_cols(self) -> list[str] | None:
        kc = self.snapshot()["key_cols"]
        return list(kc) if kc is not None else None

    def n_buckets(self) -> int:
        return int(self.snapshot()["n_buckets"])

    def applied_epochs(self) -> set[int]:
        return set(self.snapshot()["applied_epochs"])

    def watermarks(self, sid: int | None = None) -> dict[int, int | None]:
        """bucket -> max applied LSN (per-partition offset checkpoint)."""
        s = self.snapshot(sid)
        return {int(b): info.get("max_lsn") for b, info in s["buckets"].items()}

    # ---------------- read ----------------

    def _bucket_files(self, snap: dict, buckets: Iterable[int] | None = None) -> list[str]:
        sel = None if buckets is None else {int(b) for b in buckets}
        out: list[str] = []
        for b, info in snap["buckets"].items():
            if sel is None or int(b) in sel:
                out.extend(os.path.join(self.root, p) for p in info["files"])
        return out

    def read(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        include_meta: bool = False,
        include_tombstones: bool = False,
        buckets: Iterable[int] | None = None,
    ) -> DataFrame:
        """Read the table at a snapshot. Old files written before a schema
        evolution are read with the evolved schema (missing columns → NULL).

        Merge-on-read: buckets whose ``merged`` flag is false hold multiple
        versions per key (delta generations); the LWW window resolves the
        winner at read time, but ONLY over those buckets — compacted/merged
        buckets take the window-free fast path and the two sides are unioned.
        Keys never span buckets, so the split is safe.

        Keyless (append-only) tables are a plain scan: every appended row is
        visible, no LWW, and no tombstone filtering (delete semantics need a
        key)."""
        snap = self.snapshot(snapshot_id)
        keyless = snap["key_cols"] is None
        phys = T.StructType(
            list(schema_from_json(snap["schema"]).fields) + PHYSICAL_META_FIELDS
        )
        sel = None if buckets is None else {int(b) for b in buckets}
        merged_b, unmerged_b = [], []
        for b, info in snap["buckets"].items():
            if sel is not None and int(b) not in sel:
                continue
            is_merged = keyless or info.get("merged", True)
            (merged_b if is_merged else unmerged_b).append(int(b))

        def _scan(bs: list[int]) -> DataFrame:
            files = self._bucket_files(snap, bs)
            if not files:
                return spark.createDataFrame([], phys)
            return spark.read.schema(phys).parquet(*files)

        df = _scan(merged_b)
        if unmerged_b:
            from cnpj_data_pipeline_spark.operators.dedup import lww_winners_agg

            # hash-aggregate LWW: map-side partials collapse the delta
            # generations before the shuffle — the MoR read tax shrinks with
            # combine, instead of shuffling every version to a sort
            winners = lww_winners_agg(
                _scan(unmerged_b),
                snap["key_cols"],
                lsn_col=LSN_META_COL,
                op_col=OP_META_COL,
            )
            df = df.unionByName(winners)
        if not include_tombstones and not keyless:
            df = df.filter(F.col(OP_META_COL) != "D")
        if not include_meta:
            df = df.drop(LSN_META_COL, OP_META_COL)
        return df

    def read_keys(
        self,
        spark: SparkSession,
        keys: DataFrame,
        include_meta: bool = False,
    ) -> DataFrame:
        """Point / multi-get lookup with BUCKET PRUNING: the requested keys
        are hashed to their buckets and only those buckets' files are
        scanned — O(|keys|/n_buckets · table) IO instead of a full scan,
        the read-side payoff of hash-bucketed clustering (at 2^14 buckets a
        point lookup touches 1/16384 of the data files). The surviving rows
        are left-semi-joined against the broadcast key set.

        The bucket list is computed driver-side (bounded by
        min(|keys|, n_buckets) — metadata-scale, like the merge's touched
        list); ``keys`` must be small enough to broadcast, the normal mget
        contract."""
        snap = self.snapshot()
        key_cols = snap["key_cols"]
        if key_cols is None:
            raise ValueError("point lookup requires key columns (keyless table)")
        kd = keys.select(*key_cols).distinct()
        buckets = [
            r[0]
            for r in kd.select(
                bucket_expr(key_cols, snap["n_buckets"])
            ).distinct().collect()
        ]
        df = self.read(spark, include_meta=include_meta, buckets=buckets)
        return df.join(F.broadcast(kd), on=list(key_cols), how="left_semi")

    def read_changes(
        self,
        spark: SparkSession,
        from_snapshot: int,
        to_snapshot: int | None = None,
        include_meta: bool = True,
    ) -> DataFrame:
        """Iceberg-style incremental change feed (CDF): the change rows
        committed by apply snapshots in ``(from_snapshot, to_snapshot]``,
        read by scanning ONLY the delta files those commits appended —
        O(changed data) IO, never O(table). This is how a downstream
        incremental consumer (a derived table, an index builder, a cache
        invalidator) tails the lake table without re-reading state, the
        lake-side analogue of the WAL tail the ingest side consumes
        (reference keeps no equivalent: its consumers re-SELECT Postgres).

        Semantics: each merge-on-read apply commit appends its batch's
        per-key LWW winners — including ``__op='D'`` tombstones — as
        bucket-delta files. The union of those files over the window IS the
        change feed (one row per key PER EPOCH that touched it). Folding the
        feed with the engine's LWW total order yields the NET per-key change
        of the window: LWW is an associative max, so per-epoch-winner then
        max-over-epochs equals max over all window events.

        Maintenance commits (``compact``/``vacuum``) rewrite files without
        logical changes and are skipped; their rewrites do not delete the
        delta files older snapshots reference (only ``expire_snapshots``'s
        GC does), so the feed stays readable until the window's snapshots
        are expired — a missing file fails loudly at scan time, never
        silently drops changes. A copy-on-write apply commit REPLACES bucket
        contents (its file diff would be table state, not changes), so one
        inside the window raises.
        """
        to_sid = self.current_snapshot_id() if to_snapshot is None else to_snapshot
        chain = self.snapshots()
        by_id = {s["snapshot_id"]: s for s in chain}
        if from_snapshot != 0 and from_snapshot not in by_id:
            raise ValueError(
                f"from_snapshot {from_snapshot} not in reachable history "
                "(expired or never committed)"
            )
        if to_sid not in by_id:
            raise ValueError(f"to_snapshot {to_sid} not in reachable history")
        new_files: list[str] = []
        for s in chain:
            sid = s["snapshot_id"]
            if not (from_snapshot < sid <= to_sid):
                continue
            if s["op"] in ("create", "compact", "vacuum", "rebucket"):
                continue  # no logical change
            parent = by_id.get(s["parent_id"])
            if parent is None:
                raise ValueError(
                    f"snapshot {sid}'s parent is expired — change feed "
                    f"window ({from_snapshot}, {to_sid}] is no longer readable"
                )
            pfiles = {
                f for info in parent["buckets"].values() for f in info["files"]
            }
            for b, info in s["buckets"].items():
                cur_files = info["files"]
                prev_info = parent["buckets"].get(b)
                if prev_info is not None and any(
                    f not in set(cur_files) for f in prev_info["files"]
                ):
                    raise ValueError(
                        f"snapshot {sid} (op={s['op']}) replaced files in "
                        f"bucket {b}: copy-on-write commits don't retain a "
                        "change feed — use merge-on-read (cfg.write_mode="
                        "'mor') for CDF windows"
                    )
                new_files.extend(
                    os.path.join(self.root, f) for f in cur_files if f not in pfiles
                )
        phys = T.StructType(
            list(schema_from_json(by_id[to_sid]["schema"]).fields)
            + PHYSICAL_META_FIELDS
        )
        if not new_files:
            df = spark.createDataFrame([], phys)
        else:
            df = spark.read.schema(phys).parquet(*new_files)
        if not include_meta:
            df = df.drop(LSN_META_COL, OP_META_COL)
        return df

    def read_state_for_merge(
        self, spark: SparkSession, buckets: Iterable[int], evolved_schema: T.StructType
    ) -> DataFrame:
        """Physical rows (incl. tombstones + meta) of the touched buckets, padded
        to the evolved schema, with the bucket column re-derived."""
        snap = self.snapshot()
        phys = T.StructType(list(evolved_schema.fields) + PHYSICAL_META_FIELDS)
        files = self._bucket_files(snap, buckets)
        if not files:
            df = spark.createDataFrame([], phys)
        else:
            df = spark.read.schema(phys).parquet(*files)
        return df.withColumn(
            BUCKET_COL, bucket_expr(snap["key_cols"], snap["n_buckets"])
        )

    def lineage_df(self, spark: SparkSession) -> DataFrame:
        """FIXTURES.md F4 lineage table, materialized from snapshot manifests."""
        rows = []
        for s in self.snapshots():
            at = _dt.datetime.strptime(s["committed_at"], "%Y-%m-%dT%H:%M:%S.%fZ")
            for e in s["lineage"]:
                rows.append(
                    (
                        s["snapshot_id"],
                        s["parent_id"],
                        e.get("epoch"),
                        e["partition_id"],
                        e.get("max_lsn"),
                        s["op"],
                        e["rows_applied"],
                        at,
                    )
                )
        from cnpj_data_pipeline_spark.schemas import LINEAGE_SCHEMA

        return spark.createDataFrame(rows, LINEAGE_SCHEMA)

    # ---------------- write / commit ----------------

    def staging_dir(self, next_sid: int) -> str:
        return os.path.join(self.data_dir, f"snap-{next_sid}")

    def collect_staged(self, next_sid: int) -> dict[int, dict]:
        """Inventory freshly staged files: bucket -> {files, rows, max_lsn},
        stats from Parquet footers only."""
        stage = self.staging_dir(next_sid)
        out: dict[int, dict] = {}
        for bdir in sorted(glob.glob(os.path.join(stage, f"{BUCKET_COL}=*"))):
            b = int(os.path.basename(bdir).split("=", 1)[1])
            files = sorted(glob.glob(os.path.join(bdir, "*.parquet")))
            rows = 0
            max_lsn = None
            rel = []
            for fp in files:
                st = _file_stats(fp)
                rows += st["rows"]
                if st["max_lsn"] is not None:
                    max_lsn = st["max_lsn"] if max_lsn is None else max(max_lsn, st["max_lsn"])
                rel.append(os.path.relpath(fp, self.root))
            out[b] = {"files": rel, "rows": rows, "max_lsn": max_lsn}
        return out

    def commit(
        self,
        *,
        op: str,
        epoch: int | None,
        bucket_updates: dict[int, dict],
        new_schema: T.StructType | None = None,
        mode: str = "replace",
        merged: bool = True,
        new_n_buckets: int | None = None,
    ) -> int:
        """Atomically publish a new snapshot: carry forward untouched buckets,
        replace (CoW/compact) or append to (MoR delta) touched ones, append
        lineage, then swap the pointer. The swap is the single visibility point
        (crash before it = clean no-op).

        ``merged``: whether the updated buckets hold exactly one winner row per
        key afterwards. Appending to a bucket that already has files always
        clears the flag (multiple generations)."""
        cur = self.snapshot()
        keyless = cur["key_cols"] is None
        sid = cur["snapshot_id"] + 1
        # a bucket-count change invalidates every old bucket assignment, so
        # the update set must be the COMPLETE new layout (rebucket rewrite)
        buckets = {} if new_n_buckets is not None else dict(cur["buckets"])
        lineage = []
        for b, info in sorted(bucket_updates.items()):
            prev = buckets.get(
                str(b), {"max_lsn": None, "files": [], "rows": 0, "merged": True}
            )
            max_lsn = info.get("max_lsn")
            if mode == "append":
                files = list(prev.get("files", [])) + list(info["files"])
                rows = prev.get("rows", 0) + info["rows"]
                pmax = prev.get("max_lsn")
                if max_lsn is None or (pmax is not None and pmax > max_lsn):
                    max_lsn = pmax
                gens = prev.get("gens", 1 if prev.get("files") else 0) + (
                    1 if info["files"] else 0
                )
                # keyless tables have no per-key versions to resolve: every
                # generation is final state, so the bucket is always "merged"
                is_merged = True if keyless else gens <= 1
            else:
                files = info["files"]
                rows = info["rows"]
                if max_lsn is None:
                    max_lsn = prev.get("max_lsn")
                gens = 1 if files else 0
                is_merged = merged
            buckets[str(b)] = {
                "files": files,
                "rows": rows,
                "max_lsn": max_lsn,
                "merged": bool(is_merged),
                "gens": gens,
            }
            lineage.append(
                {
                    "partition_id": int(b),
                    "epoch": epoch,
                    "max_lsn": max_lsn,
                    "rows_applied": info["rows"],
                }
            )
        applied = list(cur["applied_epochs"])
        if epoch is not None and epoch not in applied:
            applied.append(epoch)
        schema_json = new_schema.json() if new_schema is not None else cur["schema"]
        snap = {
            "snapshot_id": sid,
            "parent_id": cur["snapshot_id"],
            "epoch": epoch,
            "op": op,
            "schema": schema_json,
            "key_cols": cur["key_cols"],
            "n_buckets": int(new_n_buckets) if new_n_buckets is not None else cur["n_buckets"],
            "buckets": buckets,
            "applied_epochs": applied,
            "lineage": lineage,
            "rows_total": sum(i["rows"] for i in buckets.values()),
            "committed_at": _utcnow_iso(),
        }
        self._write_snapshot(snap)
        self._swap_pointer(sid)
        return sid

    def _write_snapshot(self, snap: dict) -> None:
        # tmp + atomic rename: a crash between snapshot write and pointer swap
        # leaves an orphan manifest that the retry of the same id safely
        # overwrites (single-writer protocol; visibility is ONLY the pointer).
        path = self._snapshot_path(snap["snapshot_id"])
        cur = (
            self.current_snapshot_id() if os.path.exists(self._pointer_path()) else -1
        )
        if snap["snapshot_id"] <= cur:
            raise RuntimeError(
                f"snapshot {snap['snapshot_id']} already committed (current={cur})"
            )
        def _write() -> None:
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(snap, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)

        # retry-safe: rewriting the same tmp + re-replacing is idempotent
        _retry_io(_write)

    def _swap_pointer(self, sid: int) -> None:
        def _write() -> None:
            tmp = self._pointer_path() + ".tmp"
            with open(tmp, "w") as f:
                f.write(str(sid))
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self._pointer_path())

        # retry-safe: the pointer swap is the single visibility point and
        # replacing it with the same sid twice is idempotent
        _retry_io(_write)

    # ---------------- maintenance ----------------

    def _rewrite_buckets(
        self,
        spark: SparkSession,
        victims: list[int],
        op: str,
        salt_factor: int = 4,
        lsn_horizon: int | None = None,
    ) -> int:
        """Shared kernel for compact/vacuum: read the victims' physical rows,
        resolve the per-key LWW winner (single shuffle: repartition on
        (bucket, salt-of-key), window over (bucket, salt, key) reuses that
        partitioning), optionally drop tombstone winners below the LSN horizon,
        rewrite the buckets as single-generation state, commit."""
        from cnpj_data_pipeline_spark.config import SALT_COL
        from cnpj_data_pipeline_spark.operators.dedup import lww_winners_agg

        snap = self.snapshot()
        key_cols = snap["key_cols"]
        if key_cols is None:
            raise ValueError(
                "keyless append-only tables have no LWW merge maintenance"
            )
        df = self.read_state_for_merge(spark, victims, self.schema())
        df = df.withColumn(
            SALT_COL,
            F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(salt_factor)).cast(
                "int"
            ),
        )
        n_parts = max(
            1,
            min(
                len(victims) * salt_factor,
                2 * spark.sparkContext.defaultParallelism,
            ),
        )
        parted = df.repartition(n_parts, F.col(BUCKET_COL), F.col(SALT_COL))
        winners = lww_winners_agg(
            parted,
            [BUCKET_COL, SALT_COL, *key_cols],
            lsn_col=LSN_META_COL,
            op_col=OP_META_COL,
        ).drop(SALT_COL)
        if lsn_horizon is not None:
            winners = winners.filter(
                ~(
                    (F.col(OP_META_COL) == "D")
                    & (F.col(LSN_META_COL) < lsn_horizon)
                )
            )
        sid = self.current_snapshot_id() + 1
        stage = self.staging_dir(sid)
        # cluster each rewritten bucket by key (task-local sort, no extra
        # exchange): compaction is the read-optimization pass, so pay the
        # in-task sort once to make parquet row-group min/max stats selective
        # for key-range and point reads — the Iceberg sort-order analogue
        winners.sortWithinPartitions(BUCKET_COL, *key_cols).write.mode(
            "overwrite"
        ).partitionBy(BUCKET_COL).parquet(stage)
        updates = self.collect_staged(sid)
        for b in victims:
            updates.setdefault(b, {"files": [], "rows": 0, "max_lsn": None})
            # keep the watermark even if the bucket emptied (resume safety)
            if updates[b].get("max_lsn") is None:
                updates[b]["max_lsn"] = snap["buckets"][str(b)]["max_lsn"]
        return self.commit(
            op=op, epoch=None, bucket_updates=updates, mode="replace", merged=True
        )

    def compact(
        self,
        spark: SparkSession,
        buckets: Iterable[int] | None = None,
        salt_factor: int = 4,
    ) -> int:
        """Rewrite multi-generation (unmerged) buckets back to one winner row
        per key — the MoR maintenance op that bounds read amplification.
        Tombstones survive compaction (vacuum owns their removal)."""
        snap = self.snapshot()
        if buckets is None:
            victims = [
                int(b)
                for b, info in snap["buckets"].items()
                if not info.get("merged", True)
            ]
        else:
            victims = [int(b) for b in buckets]
        victims = sorted(set(victims))
        if not victims:
            return self.current_snapshot_id()
        return self._rewrite_buckets(spark, victims, op="compact", salt_factor=salt_factor)

    def compact_if_needed(
        self,
        spark: SparkSession,
        max_gens_per_bucket: int,
        salt_factor: int = 4,
        max_buckets: int | None = None,
    ) -> int | None:
        """Compact only the buckets whose delta-generation count crossed the
        threshold; returns the new snapshot id or None if nothing to do.

        ``max_buckets`` rate-limits one maintenance pass (most-generational
        buckets first), LSM-style: when a uniform workload pushes every
        bucket over the threshold in the same epoch, an unbounded pass would
        rewrite the whole table in one stall (measured 49 s against a 47M-row
        table vs ~5 s epochs); spreading it keeps ingest latency bounded
        while amortized cost stays the same."""
        snap = self.snapshot()
        victims = [
            (info.get("gens", len(info["files"])), int(b))
            for b, info in snap["buckets"].items()
            if not info.get("merged", True)
            and info.get("gens", len(info["files"])) >= max_gens_per_bucket
        ]
        if not victims:
            return None
        victims.sort(reverse=True)
        chosen = [b for _, b in victims]
        if max_buckets is not None:
            chosen = chosen[:max_buckets]
        return self._rewrite_buckets(
            spark, sorted(chosen), op="compact", salt_factor=salt_factor
        )

    def rebucket(
        self,
        spark: SparkSession,
        new_n_buckets: int,
        salt_factor: int = 4,
    ) -> int:
        """Bucket-count EVOLUTION: rewrite the whole table into a new
        hash-bucket layout — the growth path from a small table to the
        2^14-bucket layout a 10^10-row deployment wants, without creating a
        new table (reference analogue: none — its Postgres tables cannot
        re-shard; ALTER-free growth is a lake-format capability).

        One-off O(table) maintenance: every physical row (all versions AND
        tombstones — LWW/vacuum semantics are preserved verbatim, so the op
        is logically invisible and the change feed skips it) is re-assigned
        by the same key-hash into ``new_n_buckets``, distributed over
        (bucket, salt) tasks like the merge, key-clustered per file, and
        committed atomically — readers see the old layout until the pointer
        swap, and ``applied_epochs`` carries over so ingest resumes
        exactly-once against the new layout. Buckets land unmerged
        (conservative); a follow-up ``compact()`` restores single-winner
        files where wanted."""
        snap = self.snapshot()
        if int(new_n_buckets) == int(snap["n_buckets"]):
            return self.current_snapshot_id()
        key_cols = snap["key_cols"]
        phys = T.StructType(
            list(schema_from_json(snap["schema"]).fields) + PHYSICAL_META_FIELDS
        )
        files = self._bucket_files(snap)
        if files:
            df = spark.read.schema(phys).parquet(*files)
        else:
            df = spark.createDataFrame([], phys)
        from cnpj_data_pipeline_spark.config import SALT_COL

        df = df.withColumn(BUCKET_COL, bucket_expr(key_cols, new_n_buckets))
        salt_src = (
            [F.col(c) for c in key_cols] if key_cols else [F.col(LSN_META_COL)]
        )
        df = df.withColumn(
            SALT_COL,
            F.pmod(F.xxhash64(*salt_src), F.lit(salt_factor)).cast("int"),
        )
        n_parts = max(
            1,
            min(
                int(new_n_buckets) * salt_factor,
                2 * spark.sparkContext.defaultParallelism,
            ),
        )
        parted = df.repartition(
            n_parts, F.col(BUCKET_COL), F.col(SALT_COL)
        ).drop(SALT_COL)
        sid = self.current_snapshot_id() + 1
        stage = self.staging_dir(sid)
        sort_cols = list(key_cols) if key_cols else [LSN_META_COL]
        parted.sortWithinPartitions(BUCKET_COL, *sort_cols).write.mode(
            "overwrite"
        ).partitionBy(BUCKET_COL).parquet(stage)
        updates = self.collect_staged(sid)
        return self.commit(
            op="rebucket",
            epoch=None,
            bucket_updates=updates,
            mode="replace",
            merged=False,
            new_n_buckets=int(new_n_buckets),
        )

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Iceberg-style snapshot expiration + orphan GC: keep the newest
        ``keep_last`` snapshots reachable from the pointer, delete older
        manifests, and physically remove every data file no kept snapshot
        references (including staged-but-never-committed crash debris and
        pre-compaction delta generations). Time travel remains available for
        the kept snapshots only.

        At 10^10 rows this is what bounds storage: each MoR epoch adds delta
        files and each compaction supersedes whole generations — without
        expiration the table keeps every byte ever written.

        Safe by construction: visibility is only ever via ``_current``, which
        always points at a kept snapshot, and concurrent readers of kept
        snapshots see only referenced files (all kept). Returns removal
        stats."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        chain = self.snapshots()
        kept = chain[-keep_last:]
        kept_ids = {s["snapshot_id"] for s in kept}
        referenced: set[str] = set()
        for s in kept:
            for info in s["buckets"].values():
                referenced.update(info["files"])

        files_removed = 0
        bytes_removed = 0
        for fp in glob.glob(
            os.path.join(self.data_dir, "**", "*.parquet"), recursive=True
        ):
            rel = os.path.relpath(fp, self.root)
            if rel not in referenced:
                try:
                    bytes_removed += os.path.getsize(fp)
                    os.remove(fp)
                    files_removed += 1
                except OSError:
                    pass  # already gone / concurrent GC — harmless
        # drop now-empty bucket/stage dirs (cosmetic; readers use manifests)
        for d in sorted(
            glob.glob(os.path.join(self.data_dir, "**", ""), recursive=True),
            key=len,
            reverse=True,
        ):
            try:
                os.rmdir(d)
            except OSError:
                pass

        snaps_removed = 0
        for mp in glob.glob(os.path.join(self.meta_dir, "snapshot-*.json")):
            sid = int(os.path.basename(mp).split("-")[1].split(".")[0])
            if sid not in kept_ids:
                try:
                    os.remove(mp)
                    snaps_removed += 1
                except OSError:
                    pass
        return {
            "snapshots_removed": snaps_removed,
            "files_removed": files_removed,
            "bytes_removed": bytes_removed,
            "kept_snapshot_ids": sorted(kept_ids),
        }

    def vacuum_tombstones(
        self, spark: SparkSession, lsn_horizon: int, salt_factor: int = 4
    ) -> int:
        """Physically drop tombstones whose LSN is below the horizon (no late
        event with a lower LSN can still arrive). Implemented as a compaction
        with a horizon filter so multi-generation buckets stay correct (a bare
        tombstone filter would resurrect the older versions underneath)."""
        snap = self.snapshot()
        if snap["key_cols"] is None:
            return self.current_snapshot_id()  # keyless: no tombstone semantics
        victims = sorted(int(b) for b, info in snap["buckets"].items() if info["files"])
        if not victims:
            return self.current_snapshot_id()
        return self._rewrite_buckets(
            spark,
            victims,
            op="vacuum",
            salt_factor=salt_factor,
            lsn_horizon=lsn_horizon,
        )
