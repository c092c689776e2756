"""spark-submit entrypoint for the CDC ingest engine.

Cluster usage (the north-rule deployment shape)::

    zip -r engine.zip cnpj_data_pipeline_spark
    spark-submit --py-files engine.zip tools/run_ingest.py \\
        --wal  s3://bucket/wal            # or hdfs:// / file://
        --table s3://bucket/lake/transcripts \\
        --n-buckets 16384 --salt-factor 8 \\
        --stream                          # Structured Streaming tail (else batch)

In this sandbox ``python tools/run_ingest.py --master local[8] ...`` is the
single-node equivalent. The driver only ever touches metadata (epoch lists,
snapshot JSON); all data movement is executor-side, so the same script runs
unchanged at 1000 executors — cluster sizing comes from spark-submit flags
(``--num-executors`` etc.), not from this code.

Prints one JSON line of run metrics (epochs applied, rows, events/sec).
"""

from __future__ import annotations

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="CDC WAL -> lake table ingest")
    ap.add_argument("--wal", required=True, help="WAL root (epoch=K/ parquet dirs)")
    ap.add_argument("--table", required=True, help="lake table root")
    ap.add_argument("--master", default=None, help="only for local runs; omit under spark-submit")
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--salt-factor", type=int, default=4)
    ap.add_argument("--merge-partitions", type=int, default=None)
    ap.add_argument("--write-mode", choices=["mor", "cow"], default="mor")
    ap.add_argument("--compact-threshold", type=int, default=8)
    ap.add_argument("--compact-max-buckets", type=int, default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--stream", action="store_true",
                    help="tail via Structured Streaming (availableNow drain)")
    ap.add_argument("--checkpoint", default=None,
                    help="streaming checkpoint dir (default: <table>-ckpt)")
    ap.add_argument("--max-epochs", type=int, default=None,
                    help="bounded admission: at most this many epochs per run")
    ap.add_argument("--max-rows", type=int, default=None,
                    help="bounded admission: stop admitting past this row budget")
    ap.add_argument("--fold-window", type=int, default=None,
                    help="catch-up: fold up to K consecutive pending epochs "
                         "into one apply (one merge + one atomic commit)")
    ap.add_argument("--copart", choices=["auto", "off"], default="auto",
                    help="shuffle-free apply for bucket-aligned WAL epochs "
                         "(auto-detected per epoch via _bucketing.json)")
    ap.add_argument("--wal-format", choices=["parquet", "debezium"],
                    default="parquet",
                    help="debezium: epoch dirs hold newline-delimited "
                         "Debezium JSON envelopes instead of parquet")
    ap.add_argument("--dlq-dir", default=None,
                    help="(debezium) quarantine structurally-invalid lines "
                         "here per epoch instead of failing the stream")
    args = ap.parse_args()

    from cnpj_data_pipeline_spark import EngineConfig, IngestJob, LakeTable
    from cnpj_data_pipeline_spark.session import get_spark

    cfg = EngineConfig(
        n_buckets=args.n_buckets,
        salt_factor=args.salt_factor,
        merge_partitions=args.merge_partitions,
        write_mode=args.write_mode,
        compact_threshold=args.compact_threshold,
        compact_max_buckets=args.compact_max_buckets,
        copart=args.copart,
    )
    spark = get_spark(
        app_name="cdc-ingest",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions
        or max(2 * __import__("multiprocessing").cpu_count(), 32),
    )
    job = IngestJob(args.table, cfg)
    if args.stream:
        from cnpj_data_pipeline_spark.schemas import CHANGE_SCHEMA
        from cnpj_data_pipeline_spark.streaming.stream_job import stream_ingest

        table = job.ensure_table()
        q = stream_ingest(
            spark,
            args.wal,
            table,
            args.checkpoint or args.table + "-ckpt",
            schema=CHANGE_SCHEMA,
            cfg=cfg,
        )
        q.awaitTermination()
        table = LakeTable.load(args.table)
        out = {
            "mode": "stream",
            "snapshot_id": table.current_snapshot_id(),
            "epochs_applied": len(table.applied_epochs()),
            "rows_total": table.snapshot()["rows_total"],
        }
    else:
        metrics = job.run_stream(
            spark,
            args.wal,
            max_epochs=args.max_epochs,
            max_rows=args.max_rows,
            fold_window=args.fold_window,
            wal_format=args.wal_format,
            dlq_dir=args.dlq_dir,
        )
        out = {"mode": "batch", **job.metrics_summary(metrics)}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
