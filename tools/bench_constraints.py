"""Measure the per-epoch cost of the declarative quality gates.

Replays the SAME seeded change stream three times through the general
apply path — no gate, a fail-mode CHECK constraint (one map-only verdict
aggregate per epoch), and a fail-mode FOREIGN KEY (verdict aggregate plus
the bucket-pruned parent anti-join) — and reports wall seconds and the
overhead ratio of each gated run vs the ungated baseline. All three runs
use fresh tables and identical batches; the constraints are satisfied by
construction, so the numbers isolate pure verification cost (the
violation paths add a batch filter, not a different algorithm).

Usage::

    python tools/bench_constraints.py [--events 2000000] [--convs 20000] \
        [--epochs 4] [--buckets 16] [--reps 3] [--master local[8]]

Prints one JSON line: per-mode seconds (min over reps, interleaved) and
overhead ratios.
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

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from cnpj_data_pipeline_spark.config import EngineConfig  # noqa: E402
from cnpj_data_pipeline_spark.gen import (  # noqa: E402
    epoch_batches,
    gen_changes,
)
from cnpj_data_pipeline_spark.lake.format import LakeTable  # noqa: E402
from cnpj_data_pipeline_spark.operators.merge import apply_changes  # noqa: E402
from cnpj_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA  # noqa: E402
from cnpj_data_pipeline_spark.session import get_spark  # noqa: E402

PARENT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
    ]
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--convs", type=int, default=20_000)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()

    spark = get_spark(master=args.master, app_name="bench-constraints")
    work = tempfile.mkdtemp(prefix="bench_cons_")
    try:
        ch = gen_changes(
            spark, n_events=args.events, n_convs=args.convs,
            n_epochs=args.epochs,
        ).cache()
        batches = [(e, b) for e, b in epoch_batches(ch, args.epochs)]
        for _, b in batches:
            b.cache().count()  # stage the input once, outside the timings

        parent_root = os.path.join(work, "convs")
        parent = LakeTable.create(parent_root, PARENT_SCHEMA, ["conv_id"], 8)
        convs = ch.select("conv_id").distinct().withColumn(
            "title", F.col("conv_id")
        )
        apply_changes(
            spark,
            parent,
            convs.select(
                "conv_id", "title",
                F.lit("I").alias("op"),
                F.monotonically_increasing_id().alias("lsn"),
                F.lit(0).alias("epoch"),
            ),
            epoch=0,
            cfg=EngineConfig(n_buckets=8),
        )

        def declare_none(t):
            pass

        def declare_check(t):
            t.add_constraint(
                spark, "nonneg",
                "turn_idx >= 0 AND (text IS NULL OR length(text) < 100000)",
                on_violation="fail",
            )

        def declare_fk(t):
            t.add_fk_constraint(
                spark, "fk_conv", ["conv_id"], parent, on_violation="fail"
            )

        modes = [
            ("baseline", declare_none),
            ("check_fail", declare_check),
            ("fk_fail", declare_fk),
        ]
        secs: dict[str, list[float]] = {m: [] for m, _ in modes}
        for rep in range(args.reps):  # interleaved: noise hits all modes
            for mode, declare in modes:
                root = os.path.join(work, f"{mode}_{rep}")
                t = LakeTable.create(
                    root, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
                    args.buckets,
                )
                declare(t)
                t0 = time.monotonic()
                for e, b in batches:
                    m = apply_changes(
                        spark, t, b, epoch=e,
                        cfg=EngineConfig(n_buckets=args.buckets),
                    )
                    cv = m.get("constraint_violations")
                    if cv and any(cv.values()):
                        raise RuntimeError(f"unexpected violations: {cv}")
                secs[mode].append(round(time.monotonic() - t0, 3))
                shutil.rmtree(root, ignore_errors=True)
        best = {m: min(v) for m, v in secs.items()}
        print(
            json.dumps(
                {
                    "events": args.events,
                    "epochs": args.epochs,
                    "reps": args.reps,
                    "seconds": best,
                    "all_reps": secs,
                    "overhead_check": round(
                        best["check_fail"] / best["baseline"] - 1, 4
                    ),
                    "overhead_fk": round(
                        best["fk_fail"] / best["baseline"] - 1, 4
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
