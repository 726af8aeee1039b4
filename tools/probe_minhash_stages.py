#!/usr/bin/env python
"""Round-8 stage decomposition of dedup_minhash_lsh at scale: times
signatures / banding-join / candidate-restricted shingle explode /
verify joins separately, so the adaptive-banding work targets the
stage that actually grows. Ad hoc; not part of the workload."""
from __future__ import annotations

import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rivulus_spark import cache, get_spark
from rivulus_spark.operators import dedup


def main():
    spark = get_spark("probe-minhash-stages")
    for sf in sys.argv[1:] or ["sf1"]:
        docs = spark.read.parquet(f"/root/repo/var/{sf}/documents.parquet")
        # the PRODUCTION banding (r9): decompose the same adaptive
        # blended widths the workload queries run, not the fixed
        # default — otherwise the band/verify split doesn't describe
        # the chain the curve measures
        widths = dedup.adaptive_minhash_bands(docs.count())

        t0 = time.perf_counter()
        sigs = cache.persist(dedup.minhash_signatures_arrow(docs))
        n_sigs = sigs.count()
        t_sig = time.perf_counter() - t0

        t0 = time.perf_counter()
        cands = cache.persist(dedup.lsh_candidate_pairs(
            sigs, band_widths=widths))
        n_cands = cands.count()
        t_band = time.perf_counter() - t0

        t0 = time.perf_counter()
        cand_ids = (cands.select(F.col("doc_a").alias("doc_id"))
                    .union(cands.select(F.col("doc_b").alias("doc_id")))
                    .distinct())
        rows = cache.persist(dedup.shingle_rows(
            docs.join(cand_ids, "doc_id", "semi"), "text", "doc_id", 3))
        n_rows = rows.count()
        t_shingle = time.perf_counter() - t0

        t0 = time.perf_counter()
        sizes = rows.groupBy("id").agg(F.count("*").alias("n"))
        inter = (cands
                 .join(rows.alias("ra"), cands.doc_a == F.col("ra.id"))
                 .join(rows.alias("rb"), (cands.doc_b == F.col("rb.id"))
                       & (F.col("ra.s") == F.col("rb.s")))
                 .groupBy("doc_a", "doc_b")
                 .agg(F.count("*").alias("n_inter")))
        withn = (cands.join(inter, ["doc_a", "doc_b"], "left")
                 .na.fill({"n_inter": 0})
                 .join(sizes.alias("na"), cands.doc_a == F.col("na.id"))
                 .join(sizes.alias("nb"), cands.doc_b == F.col("nb.id")))
        union = F.col("na.n") + F.col("nb.n") - F.col("n_inter")
        jacc = F.when(union > 0, F.col("n_inter").cast("double") / union
                      ).otherwise(F.lit(0.0))
        n_pairs = (withn.select("doc_a", "doc_b",
                                F.round(jacc, 3).alias("jacc"))
                   .filter(F.col("jacc") >= 0.8).count())
        t_verify = time.perf_counter() - t0

        print(f"{sf}: sig={t_sig:.2f}s ({n_sigs} sigs)  "
              f"band={t_band:.2f}s ({n_cands} cands)  "
              f"shingle={t_shingle:.2f}s ({n_rows} rows)  "
              f"verify={t_verify:.2f}s ({n_pairs} pairs)", flush=True)
        cache.unpersist_all()


if __name__ == "__main__":
    main()
