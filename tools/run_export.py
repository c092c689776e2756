"""spark-submit entrypoint for the outbound CDC *producer*: tail a lake
table's change feed into a directory stream of Debezium-JSON epochs.

Cluster usage::

    spark-submit --py-files engine.zip tools/run_export.py \\
        --source s3://bucket/lake/transcripts \\
        --out s3://bucket/feeds/transcripts-debezium \\
        --granularity window              # or: epoch (one per source commit)
        --follow --poll-seconds 30        # long-running producer (else one pass)

Each published ``epoch=<n>`` directory holds Debezium envelope JSON lines
plus a ``_window.json`` manifest (the source snapshot window it folds);
publication is rename-atomic and the manifests ARE the frontier — no
external offset store, re-running after a crash re-exports nothing.
A downstream engine consumes with ``read_debezium_epoch`` →
``apply_changes`` (see ``plans/export.py``). Prints one JSON line of
producer metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="lake change feed -> Debezium epoch stream")
    ap.add_argument("--source", required=True, help="source lake table root")
    ap.add_argument("--out", required=True, help="output stream root")
    ap.add_argument("--granularity", choices=["window", "epoch"], default="window")
    ap.add_argument("--files-per-epoch", type=int, default=4)
    ap.add_argument("--master", default=None, help="only for local runs; omit under spark-submit")
    ap.add_argument("--follow", action="store_true", help="poll forever")
    ap.add_argument("--poll-seconds", type=float, default=5.0)
    ap.add_argument("--max-polls", type=int, default=None)
    args = ap.parse_args()

    from cnpj_data_pipeline_spark.plans.export import ExportJob
    from cnpj_data_pipeline_spark.session import get_spark

    job = ExportJob(
        args.source,
        args.out,
        granularity=args.granularity,
        files_per_epoch=args.files_per_epoch,
    )
    spark = get_spark(master=args.master) if args.master else get_spark()
    if args.follow:
        m = job.run_follow(spark, args.poll_seconds, max_polls=args.max_polls)
    else:
        m = job.run_once(spark)
    print(json.dumps(m))


if __name__ == "__main__":
    main()
