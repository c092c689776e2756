"""Structured Streaming front-end for the ingest engine.

The reference's loop is a hand-rolled micro-batcher (monthly files, chunked
reads, per-slice commits — SURVEY §2.9). The Spark-native form: a file-source
``readStream`` over the WAL directory, ``foreachBatch`` applying each
micro-batch through the same exactly-once merge path the batch job uses.

Exactly-once composition: Spark's streaming checkpoint guarantees each source
file is assigned to exactly one ``batch_id`` and re-delivers the same batch on
restart; ``apply_changes`` is idempotent per epoch (``applied_epochs`` lineage)
and per row (LWW vs state), so re-delivery commits nothing twice. Epoch ids are
offset by ``epoch_base`` to keep streaming epochs disjoint from any batch
epochs already applied to the table.

State lives in the lake table itself (as Postgres is the state for the
reference) — no mapGroupsWithState needed; watermark semantics are subsumed by
the per-key LSN total order (late = lower LSN = loses).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from cnpj_data_pipeline_spark.config import EngineConfig
from cnpj_data_pipeline_spark.lake.format import LakeTable
from cnpj_data_pipeline_spark.operators.merge import apply_changes


def stream_ingest(
    spark: SparkSession,
    stream_root: str,
    table: LakeTable,
    checkpoint_dir: str,
    schema: T.StructType,
    cfg: EngineConfig | None = None,
    epoch_base: int = 1_000_000,
    max_files_per_trigger: int = 4,
    available_now: bool = True,
):
    """Tail ``stream_root`` (parquet files of CHANGE-schema envelopes) into the
    lake table. With ``available_now`` the query drains what exists and stops —
    the testable mode; without it, it runs continuously."""
    cfg = cfg or EngineConfig()

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_root)
    )

    def _apply(batch_df, batch_id: int):
        apply_changes(spark, table, batch_df, epoch=epoch_base + batch_id, cfg=cfg)

    writer = (
        src.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    return q
