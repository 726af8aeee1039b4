#!/usr/bin/env python
"""Round-8 decomposition of the streaming first-decade ratios
(VERDICT r7 item 5): for stream_dedup and stream_running_totals at
sf0.1 vs sf1 (one session — host timing is bimodal across sessions),
split wall time into
  scan_batch      — the same computation as a plain batch job over the
                    staged files (scan + shuffle agg, no streaming)
  drain_nostate   — AvailableNow drain of a STATELESS projection with
                    the same file plan (micro-batch machinery: WAL,
                    per-batch planning, memory-sink append; no state
                    store)
  drain_stateful  — the actual applyInPandasWithState drain
so "fixed micro-batch machinery dominates the small points" becomes a
measured claim: state cost = stateful - nostate, machinery = nostate -
scan. Each component is best-of-2. Ad hoc; not part of the workload."""
from __future__ import annotations

import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rivulus_spark import get_spark
from rivulus_spark.streaming import stateful
from rivulus_spark.streaming import windows as sw
from rivulus_spark.workload import (_staged_stream_parquet,
                                    _stream_file_plan,
                                    _stream_state_partitions)


def best2(fn):
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def drain(spark, staging, per_trigger, build, mode):
    schema = spark.read.parquet(staging).schema

    def go():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", per_trigger)
                  .parquet(staging))
        name = f"probe_{uuid.uuid4().hex[:12]}"
        sw.run_available_now(
            build(stream), query_name=name,
            checkpoint_dir=tempfile.mkdtemp(prefix=f"rivulus_ckpt_{name}_"),
            output_mode=mode).write.format("noop").mode("overwrite").save()
        spark.catalog.dropTempView(name)

    return best2(go)


def main():
    spark = get_spark("probe-stream")
    for sf in sys.argv[1:] or ["sf0.1", "sf1"]:
        base = ("/root/testdata/" + sf if os.path.isdir("/root/testdata/" + sf)
                else "/root/repo/var/" + sf)

        # ---- stream_dedup over documents ----
        src = f"{base}/documents.parquet"
        docs = (spark.read.parquet(src)
                .select("doc_id", F.md5("text").alias("fp")))
        n_files, per_trigger = _stream_file_plan(src)
        staging = _staged_stream_parquet(docs, src, "docs", n_files=n_files)
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions",
                       _stream_state_partitions(src, 8))
        scan = best2(lambda: spark.read.parquet(staging).select("fp")
                     .distinct().write.format("noop")
                     .mode("overwrite").save())
        nostate = drain(spark, staging, per_trigger,
                        lambda s: s.select("fp"), "append")
        stateful_t = drain(spark, staging, per_trigger,
                           stateful.streaming_dedup, "append")
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        print(f"{sf} stream_dedup: scan={scan:.2f} nostate={nostate:.2f} "
              f"stateful={stateful_t:.2f} "
              f"(machinery={nostate-scan:.2f} state={stateful_t-nostate:.2f})"
              f" parts={_stream_state_partitions(src, 8)} files={n_files}",
              flush=True)

        # ---- stream_running_totals over events ----
        src = f"{base}/events.parquet"
        ev = spark.read.parquet(src).select("user_id", "value")
        n_files, per_trigger = _stream_file_plan(src)
        staging = _staged_stream_parquet(ev, src, "ev", n_files=n_files)
        spark.conf.set("spark.sql.shuffle.partitions",
                       _stream_state_partitions(src, 4))
        scan = best2(lambda: spark.read.parquet(staging)
                     .groupBy("user_id")
                     .agg(F.count("*").alias("n"), F.sum("value"))
                     .write.format("noop").mode("overwrite").save())
        nostate = drain(spark, staging, per_trigger,
                        lambda s: s.select("user_id", "value"), "append")
        stateful_t = drain(
            spark, staging, per_trigger,
            lambda s: stateful.running_totals(s, "user_id", "value"),
            "update")
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        print(f"{sf} stream_running_totals: scan={scan:.2f} "
              f"nostate={nostate:.2f} stateful={stateful_t:.2f} "
              f"(machinery={nostate-scan:.2f} state={stateful_t-nostate:.2f})"
              f" parts={_stream_state_partitions(src, 4)} files={n_files}",
              flush=True)


if __name__ == "__main__":
    main()
