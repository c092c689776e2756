"""Multi-executor evidence: the engine's full ingest→crash→resume→copart→
map-only-compact flow on ``local-cluster[2,2,1536]`` — REAL separate
executor JVMs (own heaps, real serialization boundaries, python workers
spawned per executor), not local[K] threads inside the driver. This is the
closest a single box gets to a genuine cluster: it catches
driver-memory-sharing assumptions, unserializable closures, and
executor-side import failures that local mode structurally cannot.

Runs as a SUBPROCESS driver because a JVM allows one SparkContext and the
suite's session fixture owns it.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = textwrap.dedent(
    """
    import sys, os
    sys.path.insert(0, {repo!r})
    base = sys.argv[1]
    from cnpj_data_pipeline_spark import IngestJob, EngineConfig, LakeTable
    from cnpj_data_pipeline_spark.session import get_spark
    from cnpj_data_pipeline_spark.gen import gen_changes, epoch_batches
    from cnpj_data_pipeline_spark.sources import change_stream as cs
    from cnpj_data_pipeline_spark.oracle import final_state
    import pandas as pd

    spark = get_spark(
        master="local-cluster[2,2,1536]",
        extra_conf={{"spark.executorEnv.PYTHONPATH": {repo!r}}},
    )
    ch = gen_changes(spark, n_events=6000, n_convs=150, n_epochs=3,
                     skew=1.5, dup_ratio=0.1)
    chp = ch.toPandas()
    for e, b in epoch_batches(ch, 3):
        cs.write_epoch_bucketed(b, f"{{base}}/wal", e,
                                ["conv_id", "turn_idx"], 8)
    job = IngestJob(f"{{base}}/lake",
                    EngineConfig(n_buckets=8, compact_threshold=2))
    try:
        job.run_stream(spark, f"{{base}}/wal", fail_after=1)
        raise SystemExit("expected injected crash")
    except RuntimeError:
        pass
    m = job.run_stream(spark, f"{{base}}/wal")
    assert all(x.get("copartitioned") for x in m), m
    t = LakeTable.load(f"{{base}}/lake")
    t.compact(spark)
    got = (t.read(spark).orderBy("conv_id", "turn_idx")
             .toPandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(got, final_state(chp), check_dtype=False)
    # z-order rewrite across real executor JVMs (numpy kernel + closure
    # serialization + executor-side module import)
    t.set_sort_order(["ts", "turn_idx"], kind="zorder")
    t.compact(spark, buckets=range(8))
    got2 = (t.read(spark).orderBy("conv_id", "turn_idx")
              .toPandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(got2, got, check_dtype=False)
    print(f"LOCAL-CLUSTER-OK rows={{len(got)}}")
    """
).format(repo=REPO)


def test_engine_on_local_cluster_multi_jvm(tmp_path):
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    env = {**os.environ, "SPARK_GRAFT_DRIVER_MEM": "2g"}
    proc = subprocess.run(
        [sys.executable, str(driver), str(tmp_path / "work")],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert "LOCAL-CLUSTER-OK" in proc.stdout, (
        proc.stdout[-2000:] + "\n--- stderr ---\n" + proc.stderr[-3000:]
    )
