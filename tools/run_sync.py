"""spark-submit entrypoint for the CDC *consumer*: tail a lake table's
change feed into a replica or derived lake table.

Cluster usage::

    spark-submit --py-files engine.zip tools/run_sync.py \\
        --source s3://bucket/lake/transcripts \\
        --derived s3://bucket/lake/transcripts_replica \\
        --transform mirror                # or: text-stats
        --follow --poll-seconds 30        # long-running consumer (else one pass)

``mirror`` is incremental lake->lake replication (schema evolution flows
through); ``text-stats`` maintains the per-turn text-statistics derived
table. Progress checkpointing is the derived table's own applied-epochs set
— no external offset store; re-running after a crash skips synced epochs at
metadata cost. Prints one JSON line of consumer metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="lake change-feed -> derived table sync")
    ap.add_argument("--source", required=True, help="base lake table root")
    ap.add_argument("--derived", required=True, help="derived/replica table root")
    ap.add_argument("--transform", choices=["mirror", "text-stats"], default="mirror")
    ap.add_argument("--master", default=None, help="only for local runs; omit under spark-submit")
    ap.add_argument("--n-buckets", type=int, default=None,
                    help="derived table bucket count (default: same as source)")
    ap.add_argument("--salt-factor", type=int, default=4)
    ap.add_argument("--merge-partitions", type=int, default=None)
    ap.add_argument("--follow", action="store_true", help="poll forever")
    ap.add_argument("--poll-seconds", type=float, default=5.0)
    ap.add_argument("--max-polls", type=int, default=None)
    args = ap.parse_args()

    from cnpj_data_pipeline_spark import EngineConfig, FeedSyncJob, text_stats_transform
    from cnpj_data_pipeline_spark.session import get_spark

    cfg = EngineConfig(
        salt_factor=args.salt_factor,
        merge_partitions=args.merge_partitions,
    )
    job = FeedSyncJob(
        args.source,
        args.derived,
        transform=text_stats_transform if args.transform == "text-stats" else None,
        cfg=cfg,
        n_buckets=args.n_buckets,
    )
    spark = get_spark(master=args.master) if args.master else get_spark()
    if args.follow:
        m = job.run_follow(spark, args.poll_seconds, max_polls=args.max_polls)
    else:
        m = job.run_once(spark)
    print(json.dumps(m))


if __name__ == "__main__":
    main()
