"""lake_cdf — the lake table's change feed as a first-class Structured
Streaming SOURCE (PySpark 4 Python Data Source API).

::

    from cnpj_data_pipeline_spark.streaming.cdf_source import register_cdf_source
    register_cdf_source(spark)
    feed = spark.readStream.format("lake_cdf").load("/path/to/lake")
    feed.writeStream.format("parquet")...   # any sink; offsets checkpoint

Semantics: offsets ARE snapshot ids. Each micro-batch is the change feed of
the snapshot window ``(start, end]`` — the same per-epoch LWW winner rows
(including ``__op='D'`` tombstones) that ``LakeTable.read_changes`` returns,
located by the same manifest file-diff (maintenance commits skipped, CoW
windows rejected). Spark's own offset log makes downstream consumption
exactly-once across restarts: a re-started query resumes from the committed
snapshot id, never re-emitting or skipping a window.

Execution shape: ``partitions(start, end)`` is driver-side METADATA only
(snapshot JSON diff → one input partition per delta file); ``read(part)``
runs on executors and yields Arrow record batches straight from the parquet
delta file, padded/cast to the stream schema (pre-evolution files gain NULL
columns, exactly like the batch reader). No state is scanned at any point —
per-batch cost is O(changed data), so the source keeps up with the ingest
by construction.

This is the API-complete twin of ``FeedSyncJob`` (which stays the fast path
for lake->lake sync: its windows read through the JVM parquet scanner, while
Python data sources read via pyarrow on the Python workers).
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from cnpj_data_pipeline_spark.lake.format import (
    PHYSICAL_META_FIELDS,
    LakeTable,
    schema_from_json,
)

FORMAT_NAME = "lake_cdf"


class _FilePartition(InputPartition):
    def __init__(self, path: str | None):
        self.path = path


def _physical_schema(root: str) -> T.StructType:
    """Stream schema: payload under LOGICAL names (renames applied as of
    query start — a stream's schema is fixed for its lifetime) + meta."""
    snap = LakeTable.load(root).snapshot()
    ren = snap.get("renames") or {}
    return T.StructType(
        [
            T.StructField(ren.get(f.name, f.name), f.dataType, f.nullable)
            for f in schema_from_json(snap["schema"]).fields
        ]
        + list(PHYSICAL_META_FIELDS)
    )


class LakeCDFStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        root: str,
        schema: T.StructType,
        from_snapshot: int = 0,
        max_snapshots_per_batch: int | None = None,
    ):
        self.root = root
        self.spark_schema = schema
        self.from_snapshot = from_snapshot
        self.max_snapshots = max_snapshots_per_batch
        # physical -> logical column map captured at query start; the
        # executor-side read uses it to match a logical stream field to
        # the physical column the delta files actually store
        self.renames = dict(
            LakeTable.load(root).snapshot().get("renames") or {}
        )
        # batch-size cursor: the last batch-end this reader planned. None
        # until learned (fresh start: initialOffset; restart: the first
        # partitions() call reveals the committed offset) — clamping against
        # a guessed cursor after restart could push latestOffset BEHIND the
        # committed start.
        self._cursor: int | None = None

    # ---- driver-side: offsets + planning (metadata only) ----

    def initialOffset(self) -> dict:
        # ``fromSnapshot`` lets a late-joining consumer skip history it has
        # already bootstrapped from a plain table read (the offset log takes
        # over from there; ignored on restart like any initial offset)
        self._cursor = self.from_snapshot
        return {"snapshot_id": self.from_snapshot}

    def latestOffset(self) -> dict:
        # admission control for a LIVE tail: once a batch boundary is known
        # (the cursor — learned from the first partitions() call), each later
        # micro-batch advances at most ``maxSnapshotsPerBatch`` commits, so a
        # producer outrunning the consumer yields bounded batches instead of
        # ever-growing ones. The FIRST batch of a query's lifetime is
        # unclamped by API constraint: Spark asks for latestOffset before
        # initialOffset/partitions reveal where the stream starts, and
        # returning an offset below a restart's committed start would be an
        # illegal offset regression. Bounding an initial backlog drain is the
        # batch reader's job (read_changes over explicit windows).
        head = LakeTable.load(self.root).current_snapshot_id()
        if self.max_snapshots is not None and self._cursor is not None:
            head = min(head, self._cursor + self.max_snapshots)
        # a streaming source's reported head must never move backwards
        self._latest_returned = max(head, getattr(self, "_latest_returned", 0))
        return {"snapshot_id": self._latest_returned}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        lo, hi = int(start["snapshot_id"]), int(end["snapshot_id"])
        self._cursor = max(self._cursor or 0, hi)  # rate-limit baseline
        files: list[str] = []
        if hi > lo:
            table = LakeTable.load(self.root)
            # THE SAME walk as batch read_changes (LakeTable is the single
            # source of truth for skip-list/CoW/expired-window semantics);
            # only the file list is kept — rows are read executor-side
            files, end_schema_json = table.change_window_files(lo, hi)
            # a stream's schema is fixed at query start; a schema-widening
            # commit inside the window would otherwise have its new column
            # silently dropped by the executor-side pad/cast — fail loudly
            # instead (mirrors the CoW rejection; the batch reader handles
            # evolution because each call re-reads the window-end schema)
            # compare in LOGICAL space: the stream schema carries logical
            # names, the window-end schema physical ones — a rename is
            # metadata-only, not a new column
            end_fields = {
                self.renames.get(f.name, f.name)
                for f in schema_from_json(end_schema_json).fields
            }
            stream_fields = {f.name for f in self.spark_schema.fields}
            new_cols = sorted(end_fields - stream_fields)
            if new_cols:
                raise RuntimeError(
                    f"lake_cdf: table schema evolved mid-stream — new "
                    f"column(s) {new_cols} committed in snapshot window "
                    f"({lo}, {hi}], but this query's schema was fixed at "
                    "start. Restart the streaming query to pick up the "
                    "evolved schema; no change data is silently narrowed."
                )
        if not files:
            return [_FilePartition(None)]  # empty batch still needs a task
        return [_FilePartition(f) for f in files]

    def commit(self, end: dict) -> None:
        pass  # Spark's offset log is the consumer checkpoint

    # ---- executor-side: Arrow-batched file reads ----

    def read(self, partition: _FilePartition) -> Iterator:
        if partition.path is None:
            return
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self.spark_schema)
        tbl = pq.read_table(partition.path)
        if self.renames:
            # delta files store physical names; surface logical ones
            tbl = tbl.rename_columns(
                [self.renames.get(c, c) for c in tbl.column_names]
            )
        cols = []
        for field in arrow_schema:
            if field.name in tbl.column_names:
                cols.append(tbl.column(field.name).cast(field.type))
            else:
                # pre-evolution delta file: pad the evolved column with NULLs
                import pyarrow as pa

                cols.append(pa.nulls(len(tbl), field.type))
        import pyarrow as pa

        out = pa.Table.from_arrays(cols, schema=arrow_schema)
        yield from out.to_batches()


class LakeCDFDataSource(DataSource):
    """``spark.readStream.format("lake_cdf").load(<table root>)``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> T.StructType:
        return _physical_schema(self.options["path"])

    def streamReader(self, schema: T.StructType) -> LakeCDFStreamReader:
        opts = self.options
        max_snaps = opts.get("maxsnapshotsperbatch")
        return LakeCDFStreamReader(
            opts["path"],
            schema,
            from_snapshot=int(opts.get("fromsnapshot", 0)),
            max_snapshots_per_batch=int(max_snaps) if max_snaps else None,
        )


def register_cdf_source(spark: SparkSession) -> None:
    spark.dataSource.register(LakeCDFDataSource)
