"""Phase-level profiler for the ingest job — run at a given core count.

Usage: python tools/profile_ingest.py [cores] [n_events] [n_epochs]
Prints per-epoch phase timings and total events/sec.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    # arg1: either a core count (-> local[N]) or a full master URL
    # (e.g. local-cluster[4,4,4096])
    spec = sys.argv[1] if len(sys.argv) > 1 else "32"
    if spec.isdigit():
        cores, master = int(spec), f"local[{spec}]"
    else:
        master = spec
        import re
        m = re.match(r"local-cluster\[(\d+),(\d+),\d+\]", spec)
        cores = int(m.group(1)) * int(m.group(2)) if m else 32
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from cnpj_data_pipeline_spark import EngineConfig, IngestJob
    from cnpj_data_pipeline_spark.gen import epoch_batches, gen_changes
    from cnpj_data_pipeline_spark.session import get_spark
    from cnpj_data_pipeline_spark.sources.change_stream import write_epoch

    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    base = tempfile.mkdtemp(prefix="profile_ingest_", dir=tmp_root)
    wal = os.path.join(base, "wal")
    lake = os.path.join(base, "lake")
    try:
        spark = get_spark(
            app_name=f"profile-{cores}",
            master=master,
            shuffle_partitions=max(cores, 16),
            extra_conf={"spark.local.dir": os.path.join(base, "spark-local")},
        )
        ch = gen_changes(
            spark,
            n_events=n_events,
            n_convs=max(n_events // 10, 1000),
            turns_per_conv=16,
            n_epochs=n_epochs,
            skew=1.2,
            dup_ratio=0.02,
            late_ratio=0.02,
        )
        for e, b in epoch_batches(ch, n_epochs):
            write_epoch(b.repartition(cores), wal, e)

        cfg = EngineConfig(n_buckets=64, salt_factor=4)
        job = IngestJob(lake, cfg)
        t0 = time.monotonic()
        metrics = job.run_stream(spark, wal)
        wall = time.monotonic() - t0
        for m in metrics:
            print(json.dumps(m))
        print(
            json.dumps(
                {
                    "cores": cores,
                    "wall_sec": round(wall, 3),
                    "events_per_sec": round(n_events / wall, 1),
                }
            )
        )
        spark.stop()
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
