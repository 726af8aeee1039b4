#!/usr/bin/env python
"""Round-8 design probe: MinHash LSH candidate volume vs banding
schedule at sf1/sf10. Measures raw candidate-pair counts (pre-verify)
and verified pairs for (a) the fixed 32x4 layout, (b) uniform wider
rows, (c) blended layouts — the data behind adaptive_minhash_bands'
design constants. Not part of the workload; run ad hoc."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rivulus_spark import cache, get_spark
from rivulus_spark.operators import dedup


def band_hashes_var(sigs, widths):
    """(id, bh) with per-band row counts `widths` (consecutive slots)."""
    exprs, off = [], 0
    for b, w in enumerate(widths):
        slots = ", ".join(f"element_at(`sig`, {off + i + 1})"
                          for i in range(w))
        exprs.append(f"xxhash64({b}, {slots})")
        off += w
    bands = F.expr("array(" + ", ".join(exprs) + ")")
    return sigs.select(F.col("id"), F.explode(bands).alias("bh"))


def cand_count(sigs, widths):
    ex = band_hashes_var(sigs, widths)
    l, r = ex.alias("l"), ex.alias("r")
    return (l.join(r, (F.col("l.bh") == F.col("r.bh"))
                   & (F.col("l.id") < F.col("r.id")))
            .select("l.id", "r.id").distinct().count())


def main():
    spark = get_spark("probe-minhash")
    out = {}
    for sf in sys.argv[1:] or ["sf1"]:
        docs = spark.read.parquet(f"/root/repo/var/{sf}/documents.parquet")
        sigs = cache.persist(dedup.minhash_signatures_arrow(docs))
        sigs.count()
        layouts = {
            "32x4": [4] * 32,
            "25x5": [5] * 25,
            "21x6": [6] * 21,
            "blend_5x17_4x10": [5] * 17 + [4] * 10,  # ~halfway 4->5
            "blend_6x11_5x12": [6] * 11 + [5] * 12,  # ~halfway 5->6
        }
        out[sf] = {}
        for name, widths in layouts.items():
            t0 = time.perf_counter()
            n = cand_count(sigs, widths)
            out[sf][name] = {"cands": n,
                             "sec": round(time.perf_counter() - t0, 2),
                             "slots": sum(widths), "bands": len(widths)}
            print(sf, name, out[sf][name], flush=True)
        cache.unpersist_all()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
