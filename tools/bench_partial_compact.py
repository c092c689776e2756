"""Measure map-only vs shuffle compaction for the PARTIAL merge engine.

Builds one partial-update table from a seeded patch stream, snapshots it,
then times ``compact(strategy=...)`` for both kernels from the same
pre-compaction snapshot (rollback between runs keeps the input identical).

Usage::

    python tools/bench_partial_compact.py [--events 8000000] [--buckets 32]
        [--reps 2] [--master local[8]]

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=8_000_000)
    ap.add_argument("--convs", type=int, default=400_000)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()

    from cnpj_data_pipeline_spark import EngineConfig, IngestJob, LakeTable
    from cnpj_data_pipeline_spark.gen import (
        epoch_batches,
        gen_partial_changes,
    )
    from cnpj_data_pipeline_spark.session import get_spark
    from cnpj_data_pipeline_spark.sources import change_stream as cs

    work = tempfile.mkdtemp(prefix="partial-compact-bench-")
    wal, lake = os.path.join(work, "wal"), os.path.join(work, "lake")
    spark = get_spark(app_name="bench-partial-compact", master=args.master)
    ch = gen_partial_changes(
        spark, n_events=args.events, n_convs=args.convs, n_epochs=4
    )
    for e, b in epoch_batches(ch, 4):
        cs.write_epoch(b, wal, e)
    IngestJob(
        lake,
        EngineConfig(
            n_buckets=args.buckets, merge_engine="partial",
            compact_threshold=None,
        ),
    ).run_stream(spark, wal)
    t = LakeTable.load(lake)
    base_sid = t.current_snapshot_id()
    rows = t.read(spark).count()

    def run(strategy: str) -> float:
        best = None
        for _ in range(args.reps):
            if t.current_snapshot_id() != base_sid:
                t.rollback(base_sid)
            t0 = time.perf_counter()
            t.compact(spark, strategy=strategy)
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        return best

    # interleave to share noise
    res = {}
    for strategy in ("map", "shuffle", "map", "shuffle"):
        el = run(strategy)
        res[strategy] = min(res.get(strategy, el), el)

    shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "partial-engine compaction: map vs shuffle",
                "events": args.events,
                "live_rows": rows,
                "buckets": args.buckets,
                "map_sec": round(res["map"], 3),
                "shuffle_sec": round(res["shuffle"], 3),
                "speedup": round(res["shuffle"] / res["map"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
