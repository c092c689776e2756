"""Benchmark harness.

Two parts, one JSON line on stdout at the end:

1. **Headline queries** at ``$SPARK_GRAFT_SF_DIR`` (default
   ``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` — per-query
   seconds in ``queries``.
2. **Scaling evidence** for the north rule (≥0.8 efficiency from N→4N): the
   SAME seeded ingest job (deterministic generated WAL → full CDC merge into a
   fresh lake table) run in two subprocesses at ``local[8]`` and ``local[32]``,
   reporting events/sec at both and efficiency
   ``(eps_4N / eps_N) / 4``. Subprocesses because one JVM cannot change master.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_EVENTS
(default 2,000,000), SPARK_GRAFT_SKIP_SCALING=1 to skip part 2.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_cdc_replay",
    "q_lww_dedup",
    "q_final_state_sql",
    "q_insert_if_absent",
    "q_pricing_summary",
    "q_top_customers",
    "q_region_sales",
    "q_sessionize",
    "q_dedup_exact",
    "q_ngram_jaccard_pairs",
    "q_minhash_lsh_pairs",
    "q_simhash",
    "q_ann_topk",
    "q_embedding_neardup",
]

SCALING_MASTERS = (8, 32)  # N and 4N cores


def _materialize(df) -> int:
    # noop sink: full materialization without driver transfer
    df.write.mode("overwrite").format("noop").save()
    return 0


def run_headline(sf_dir: str, cpus: int) -> dict:
    from cnpj_data_pipeline_spark.queries import QUERIES
    from cnpj_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 16)
    )
    out = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.monotonic()
        _materialize(fn(spark, sf_dir))
        out[name] = round(time.monotonic() - t0, 3)
    spark.stop()
    return out


def ingest_worker(master_cores: int, wal: str, lake: str) -> None:
    """Subprocess body: tail the WAL into a fresh lake table, print stats."""
    from cnpj_data_pipeline_spark import EngineConfig, IngestJob
    from cnpj_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-ingest-{master_cores}",
        master=f"local[{master_cores}]",
        shuffle_partitions=max(master_cores, 16),
    )
    cfg = EngineConfig(n_buckets=64, salt_factor=4)
    job = IngestJob(lake, cfg)
    t0 = time.monotonic()
    metrics = job.run_stream(spark, wal)
    wall = time.monotonic() - t0
    n_events = spark.read.parquet(wal).count()
    spark.stop()
    print(
        json.dumps(
            {
                "cores": master_cores,
                "wall_sec": round(wall, 3),
                "events": n_events,
                "events_per_sec": round(n_events / wall, 1),
                "epochs": len(metrics),
            }
        )
    )


def gen_wal(wal: str, n_events: int, cpus: int) -> None:
    from cnpj_data_pipeline_spark.gen import epoch_batches, gen_changes
    from cnpj_data_pipeline_spark.session import get_spark
    from cnpj_data_pipeline_spark.sources.change_stream import write_epoch

    spark = get_spark(app_name="bench-gen", master=f"local[{cpus}]")
    n_epochs = 4
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
        write_epoch(b.repartition(cpus), wal, e)
    spark.stop()


def run_scaling(n_events: int, cpus: int) -> dict:
    base = tempfile.mkdtemp(prefix="bench_scaling_")
    wal = os.path.join(base, "wal")
    try:
        gen_wal(wal, n_events, cpus)
        results = {}
        for cores in SCALING_MASTERS:
            lake = os.path.join(base, f"lake_{cores}")
            proc = subprocess.run(
                [sys.executable, __file__, "--ingest-worker", str(cores), wal, lake],
                capture_output=True,
                text=True,
                timeout=3600,
            )
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
            if proc.returncode != 0 or not line.startswith("{"):
                raise RuntimeError(
                    f"ingest worker cores={cores} failed: {proc.stderr[-2000:]}"
                )
            results[cores] = json.loads(line)
        n, n4 = SCALING_MASTERS
        eff = (
            results[n4]["events_per_sec"] / results[n]["events_per_sec"]
        ) / (n4 / n)
        return {
            f"local{n}": results[n],
            f"local{n4}": results[n4],
            "scaling_efficiency": round(eff, 3),
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--ingest-worker":
        ingest_worker(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_events = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "2000000"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    queries = run_headline(sf_dir, cpus)

    scaling = None
    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        scaling = run_scaling(n_events, cpus)

    total = round(sum(queries.values()), 3)
    result = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
    }
    if scaling:
        result["ingest_scaling"] = scaling
        result["change_events_per_sec"] = scaling[f"local{SCALING_MASTERS[1]}"][
            "events_per_sec"
        ]
        result["scaling_efficiency"] = scaling["scaling_efficiency"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
