"""Measure the declared sort-order property's range-scan payoff.

Builds one lake table from a seeded change stream, compacts it twice — key
clustering (default) vs ``sort_order=["ts"]`` — and times the same narrow
event-time window read (``read_range``) on both layouts. The win is parquet
ROW-GROUP pruning inside each bucket's compacted file: with hash-random keys,
key clustering scatters ``ts`` across the whole file (every row group spans
the full time range — nothing skippable), while ts clustering makes row-group
min/max disjoint so a 5%% window touches ~5%% of the groups.

Usage::

    python tools/bench_sort_order.py [--events 16000000] [--buckets 8] \
        [--window-frac 0.05] [--reps 3] [--master local[8]]

Prints one JSON line with both timings and the speedup.
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
    ap.add_argument("--events", type=int, default=16_000_000)
    ap.add_argument("--convs", type=int, default=1_000_000)
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--window-frac", type=float, default=0.05)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--zorder", action="store_true",
                    help="compare lexical vs z-order clustering on "
                         "(ts, turn_idx): a lexical sort serves only the ts "
                         "window; the Morton interleave serves BOTH")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cnpj_data_pipeline_spark import EngineConfig, IngestJob, LakeTable
    from cnpj_data_pipeline_spark.gen import epoch_batches, gen_changes
    from cnpj_data_pipeline_spark.session import get_spark
    from cnpj_data_pipeline_spark.sources import change_stream as cs

    work = args.workdir or tempfile.mkdtemp(prefix="sort-order-bench-")
    wal, lake = os.path.join(work, "wal"), os.path.join(work, "lake")
    shutil.rmtree(wal, ignore_errors=True)
    shutil.rmtree(lake, ignore_errors=True)

    spark = get_spark(app_name="bench-sort-order", master=args.master)
    ch = gen_changes(
        spark, n_events=args.events, n_convs=args.convs, n_epochs=4
    )
    for e, b in epoch_batches(ch, 4):
        cs.write_epoch_bucketed(
            b, wal, e, ["conv_id", "turn_idx"], args.buckets
        )
    job = IngestJob(
        lake, EngineConfig(n_buckets=args.buckets, compact_threshold=None)
    )
    job.run_stream(spark, wal)
    t = LakeTable.load(lake)

    lo_hi = t.read(spark).agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    span = (lo_hi["hi"] - lo_hi["lo"]).total_seconds()
    import datetime as dt

    w_lo = lo_hi["lo"] + dt.timedelta(seconds=span * 0.5)
    w_hi = lo_hi["lo"] + dt.timedelta(
        seconds=span * (0.5 + args.window_frac)
    )

    def time_window(col="ts", lo=None, hi=None) -> tuple[float, float, int]:
        """(count_sec, agg_sec, rows): the window row count, then a payload
        aggregation over the window (sum of text lengths — forces decode of
        the wide column, where row-group pruning pays most)."""
        lo = w_lo if lo is None else lo
        hi = w_hi if hi is None else hi
        best_c = best_a = None
        n = 0
        for _ in range(args.reps):
            t0 = time.perf_counter()
            n = t.read_range(spark, col, lo, hi).count()
            el = time.perf_counter() - t0
            best_c = el if best_c is None else min(best_c, el)
            t0 = time.perf_counter()
            t.read_range(spark, col, lo, hi).agg(
                F.sum(F.length("text"))
            ).collect()
            el = time.perf_counter() - t0
            best_a = el if best_a is None else min(best_a, el)
        return best_c, best_a, n

    if args.zorder:
        # windows: 5%-of-time on ts, and turns {0,1} (~20% of rows) on the
        # independent second dimension — the dimension a lexical (ts, ...)
        # sort cannot cluster
        t.set_sort_order(["ts", "turn_idx"])
        t.compact(spark, buckets=range(args.buckets))
        lex_ts = time_window()
        lex_turn = time_window("turn_idx", 0, 1)
        t.set_sort_order(["ts", "turn_idx"], kind="zorder")
        t.compact(spark, buckets=range(args.buckets))
        z_ts = time_window()
        z_turn = time_window("turn_idx", 0, 1)
        assert lex_ts[2] == z_ts[2] and lex_turn[2] == z_turn[2]
        print(
            json.dumps(
                {
                    "metric": "zorder vs lexical range-scan",
                    "events": args.events,
                    "live_rows": t.read(spark).count(),
                    "buckets": args.buckets,
                    "ts_window": {
                        "rows": lex_ts[2],
                        "lexical_sec": round(lex_ts[1], 3),
                        "zorder_sec": round(z_ts[1], 3),
                    },
                    "turn_window": {
                        "rows": lex_turn[2],
                        "lexical_sec": round(lex_turn[1], 3),
                        "zorder_sec": round(z_turn[1], 3),
                        "speedup": (
                            round(lex_turn[1] / z_turn[1], 2)
                            if z_turn[1]
                            else None
                        ),
                    },
                }
            )
        )
        return

    t.compact(spark)  # key clustering (default)
    key_cnt, key_agg, n_key = time_window()

    t.set_sort_order(["ts"])
    t.compact(spark, buckets=range(args.buckets))  # rewrite ts-clustered
    ts_cnt, ts_agg, n_ts = time_window()
    assert n_key == n_ts, (n_key, n_ts)

    rows = t.read(spark).count()
    print(
        json.dumps(
            {
                "metric": "sort_order range-scan speedup",
                "events": args.events,
                "live_rows": rows,
                "buckets": args.buckets,
                "window_frac": args.window_frac,
                "window_rows": n_key,
                "count": {
                    "key_clustered_sec": round(key_cnt, 3),
                    "ts_clustered_sec": round(ts_cnt, 3),
                    "speedup": round(key_cnt / ts_cnt, 2) if ts_cnt else None,
                },
                "payload_agg": {
                    "key_clustered_sec": round(key_agg, 3),
                    "ts_clustered_sec": round(ts_agg, 3),
                    "speedup": round(key_agg / ts_agg, 2) if ts_agg else None,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
