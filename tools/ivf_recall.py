"""Recall curve of the IVF ANN index vs brute force, per Lloyd iteration.

Measures recall@TOP_K of the probe-limited IVF search (queries probe their
N_PROBE nearest cells) against q_ann_topk's exact brute-force cosine top-k,
for the seed codebook (iters=0) and 1..--iters trained codebooks — the
quality/cost trade the coarse quantizer buys at scale. Results are recorded
in BENCH.md §"IVF recall".

Usage: python tools/ivf_recall.py [sf_dir] [--iters N] [--master local[8]]
Prints one JSON line: {"sf_dir": ..., "k": ..., "n_probe": ...,
"recall": {"0": r0, "1": r1, ...}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()

    from cnpj_data_pipeline_spark.session import get_spark
    from cnpj_data_pipeline_spark.queries import vector as V

    spark = get_spark(app_name="ivf_recall", master=args.master)

    truth = {
        (r["query_id"], r["cand_id"])
        for r in V.q_ann_topk(spark, args.sf_dir).collect()
    }
    e = V._emb(spark, args.sf_dir)

    def recall_of(df) -> float:
        got = {(r["query_id"], r["cand_id"]) for r in df.collect()}
        return round(len(got & truth) / len(truth), 4)

    recall = {"0": recall_of(V.q_ivf_ann_topk(spark, args.sf_dir))}
    for it in range(1, args.iters + 1):
        recall[str(it)] = recall_of(
            V._ivf_topk(e, V._trained_cents(e, iters=it))
        )
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "k": V.TOP_K,
                "n_probe": V.N_PROBE,
                "n_cells": getattr(V, "N_CELLS", None),
                "n_queries": V.N_QUERIES,
                "recall": recall,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
