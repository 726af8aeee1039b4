#!/usr/bin/env python
"""Exercise the ABOVE-gate distributed connected-components path
(VERDICT r11 #3): every tested SF's pair graph falls under the 1M-edge
driver union-find gate, so the pointer-jumping path — the one that
matters at 100 TB — had no measured row. This probe builds a
deterministic synthetic chain graph big enough to clear the gate,
measures the distributed path (wall, jobs, rounds), and proves label
parity against the driver union-find on an at-gate graph.

Graph model: N nodes split into chains of length L (node i links to
i+1 when both are in the same chain) — edge count N - ceil(N/L),
diameter L-1, pointer-jumping rounds ~= log2(L). Chains isolate the
per-round cost (the thing being measured) from candidate-generation
noise, and the expected labels are closed-form: cluster(i) = i - i % L
(the chain's minimum id), so correctness is checked WITHOUT trusting
either implementation.

Usage:
  python tools/probe_cc_scale.py --nodes 1500000 --chain 32   # above gate
  python tools/probe_cc_scale.py --parity                      # at gate
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def chain_edges(spark, n_nodes: int, chain: int):
    ids = spark.range(n_nodes)
    return (ids.filter((F.col("id") + 1) % chain != 0)
            .filter(F.col("id") + 1 < n_nodes)
            .select(F.col("id").alias("doc_a"),
                    (F.col("id") + 1).alias("doc_b")))


def n_jobs(spark) -> int:
    # one py4j call: the driver's AppStatusStore summary
    try:
        return (spark.sparkContext._jsc.sc().statusStore()
                .appSummary().numCompletedJobs())
    except Exception:
        return -1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_500_000)
    ap.add_argument("--chain", type=int, default=32)
    ap.add_argument("--parity", action="store_true",
                    help="at-gate graph: distributed vs union-find labels")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from rivulus_spark import get_spark
    from rivulus_spark.operators import dedup

    spark = get_spark("cc-scale-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if args.parity:
        # at-gate graph: small enough for the driver path, big enough
        # to be a real graph (971,847 edges at the defaults below)
        n, chain = 1_000_000, 32
        edges = chain_edges(spark, n, chain)
        exp_rows = n - (n + chain - 1) // chain
        assert edges.count() == exp_rows, "edge construction drifted"
        t0 = time.perf_counter()
        uf = dedup.connected_components(edges)  # under gate: union-find
        uf_bad = (uf.filter(F.col("cluster")
                            != F.col("node") - F.col("node") % chain)
                  .count())
        t_uf = time.perf_counter() - t0
        t0 = time.perf_counter()
        dist = dedup.connected_components(edges, driver_edge_gate=0)
        d_bad = (dist.filter(F.col("cluster")
                             != F.col("node") - F.col("node") % chain)
                 .count())
        t_dist = time.perf_counter() - t0
        # full set equality, not just the closed form: anti-joins empty
        diff = (uf.exceptAll(dist).count()
                + dist.exceptAll(uf).count())
        print(json.dumps({
            "mode": "parity", "nodes": n, "chain": chain,
            "edges": exp_rows, "gate": 1_000_000,
            "union_find_wrong_labels": uf_bad,
            "distributed_wrong_labels": d_bad,
            "label_set_diff_rows": diff,
            "union_find_sec": round(t_uf, 2),
            "distributed_sec": round(t_dist, 2)}))
        spark.stop()
        return

    edges = chain_edges(spark, args.nodes, args.chain)
    n_edges = edges.count()
    assert n_edges > 1_000_000, (
        f"graph too small to clear the gate: {n_edges}")
    walls, jobs = [], []
    for _ in range(args.reps):
        j0 = n_jobs(spark)
        t0 = time.perf_counter()
        out = dedup.connected_components(edges, driver_edge_gate=0)
        bad = (out.filter(F.col("cluster")
                          != F.col("node") - F.col("node") % args.chain)
               .count())
        walls.append(round(time.perf_counter() - t0, 2))
        jobs.append(n_jobs(spark) - j0)
        assert bad == 0, f"{bad} wrong labels"
    print(json.dumps({
        "mode": "distributed", "nodes": args.nodes, "chain": args.chain,
        "edges": n_edges, "wall_sec_reps": walls,
        "best_sec": min(walls), "jobs_per_run": jobs,
        "expected_rounds": "~log2(chain)+1"}))
    spark.stop()


if __name__ == "__main__":
    main()
