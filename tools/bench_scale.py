#!/usr/bin/env python
"""Two-point scale curve (VERDICT r3 item 6): time the heaviest
workload queries at sf0.1 and sf1 (tools/make_scale.py output) and
write SCALE_CURVE.json, which bench.py folds into BENCH_DETAIL.json.

Protocol matches bench.py: noop sink (full plan executes, nothing
collected), sf0.001 codegen warmup per query, best-of-N timing,
cache.unpersist_all() between reps. With 10x rows on the same 32
cores, linear behavior is ratio <= ~10 (sub-10 when a fixed cost —
streaming machinery, session setup, codegen — dominates the small
point); a ratio well above 10 means super-linear work (a pair
explosion, an unbounded window, a driver collect) and fails the audit.

Usage: python tools/bench_scale.py [--big /root/repo/var/sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the 10 heaviest queries from BENCH_r03 plus two core relational
# representatives (scan-bound agg, 3-way broadcast join)
QUERIES_TO_RUN = [
    "stream_running_totals", "pipeline_stats", "pipeline_curate",
    "decontaminate_fuzzy", "dedup_minhash_lsh", "stream_dedup",
    "window_ntile", "kmeans_cluster_sizes", "embedding_neardup_lsh",
    "stream_interval_join",
    "agg_q1", "join_three", "ann_lsh_topk",
]


def time_query(spark, fn, sf_dir: str, warm_dir: str, reps: int,
               cache) -> float:
    try:
        fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    cache.unpersist_all()
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        cache.unpersist_all()
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/root/repo/var/sf1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    if not os.path.isdir(args.big):
        print(f"missing {args.big}; run tools/make_scale.py first",
              file=sys.stderr)
        sys.exit(1)

    from rivulus_spark import cache, get_spark
    from rivulus_spark.workload import QUERIES

    spark = get_spark("rivulus-scale-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.001"

    curve: dict[str, dict] = {}
    for name in QUERIES_TO_RUN:
        fn = QUERIES[name]
        t_small = time_query(spark, fn, args.small, warm_dir, args.reps,
                             cache)
        t_big = time_query(spark, fn, args.big, warm_dir, args.reps,
                           cache)
        ratio = round(t_big / t_small, 2) if t_small > 0 else None
        curve[name] = {"sf0.1_sec": round(t_small, 3),
                       "sf1_sec": round(t_big, 3), "ratio": ratio}
        print(f"{name}: {t_small:.2f}s -> {t_big:.2f}s  ({ratio}x)",
              file=sys.stderr)

    out = {
        "data_ratio": 10,
        "note": ("best-of-%d noop-sink timings; ratio <= ~10 is linear "
                 "on fixed cores, << 10 means fixed costs dominate the "
                 "small point" % args.reps),
        "queries": curve,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_CURVE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"scale_curve": path}))
    spark.stop()


if __name__ == "__main__":
    main()
