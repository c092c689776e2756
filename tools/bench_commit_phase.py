"""Commit-phase flatness microbench: metadata cost vs bucket count.

The round-2 verdict flagged one remaining O(n_buckets) driver loop on the
ingest hot path: ``collect_staged`` opening every staged parquet footer
serially on the driver. Round 3 fans footer reads out to the executors; this
tool isolates and measures exactly that phase — staging one delta file per
bucket (pyarrow direct writes, no Spark write job, so the measurement is the
metadata phase alone) and timing

* ``collect_staged(stage)``            — driver-serial footer reads,
* ``collect_staged(stage, spark)``     — executor-fanned footer reads,
* ``commit(...)``                      — snapshot build + CAS manifest link,

at 64 → 2^14 buckets. Run alone (no concurrent Spark jobs); lake lives in
/dev/shm. Prints one JSON line per bucket count and a summary last line.

Usage: python tools/bench_commit_phase.py [counts ...]  (default 64 1024 4096 16384)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cnpj_data_pipeline_spark.lake.format import LakeTable  # noqa: E402
from cnpj_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA  # noqa: E402

ROOT = "/dev/shm/bench_commit_phase"


def _stage_one_file_per_bucket(t: LakeTable, n: int) -> str:
    stage = t.new_staging_dir()
    tbl = pa.table(
        {
            "conv_id": ["c0", "c1"],
            "turn_idx": pa.array([0, 1], pa.int32()),
            "role": ["user", "assistant"],
            "text": ["a", "b"],
            "tool": [None, None],
            "ts": pa.array([0, 0], pa.timestamp("us")),
            "__lsn": pa.array([1, 2], pa.int64()),
            "__op": ["I", "I"],
        }
    )
    for b in range(n):
        d = os.path.join(stage, f"__bucket={b}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(tbl, os.path.join(d, "part-0.parquet"))
    return stage


def run(counts: list[int]) -> list[dict]:
    from cnpj_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="bench-commit-phase", master="local[8]", shuffle_partitions=8
    )
    # spin up executor python/JIT before timing
    spark.sparkContext.parallelize(range(64), 8).map(lambda x: x).count()
    out = []
    for n in counts:
        root = f"{ROOT}/n{n}"
        shutil.rmtree(root, ignore_errors=True)
        t = LakeTable.create(root, TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"), n)
        stage = _stage_one_file_per_bucket(t, n)

        t0 = time.monotonic()
        updates_serial = t.collect_staged(stage)
        t_serial = time.monotonic() - t0

        t0 = time.monotonic()
        updates = t.collect_staged(stage, spark)
        t_dist = time.monotonic() - t0
        assert updates == updates_serial

        t0 = time.monotonic()
        t.commit(op="append", epoch=0, bucket_updates=updates, mode="append",
                 merged=False)
        t_commit = time.monotonic() - t0

        row = {
            "n_buckets": n,
            "staged_files": n,
            "collect_staged_serial_sec": round(t_serial, 3),
            "collect_staged_distributed_sec": round(t_dist, 3),
            "commit_sec": round(t_commit, 3),
        }
        print(json.dumps(row), flush=True)
        out.append(row)
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return out


if __name__ == "__main__":
    counts = [int(a) for a in sys.argv[1:]] or [64, 1024, 4096, 16384]
    rows = run(counts)
    lo, hi = rows[0], rows[-1]
    print(json.dumps({
        "metric": "commit_phase_scaling",
        "buckets": f"{lo['n_buckets']}->{hi['n_buckets']}",
        "distributed_ratio": round(
            hi["collect_staged_distributed_sec"]
            / max(lo["collect_staged_distributed_sec"], 1e-9), 2),
        "serial_ratio": round(
            hi["collect_staged_serial_sec"]
            / max(lo["collect_staged_serial_sec"], 1e-9), 2),
        "commit_ratio": round(hi["commit_sec"] / max(lo["commit_sec"], 1e-9), 2),
    }))
