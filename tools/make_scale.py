#!/usr/bin/env python
"""Deterministically inflate the driver's sf0.1 testdata to sf1 for the
two-point scale-curve bench (VERDICT r3 item 6).

Model: k=10 replicas of every fact/dim table with per-replica key-domain
shifts, so referential integrity holds within and across replicas and
every group-by key domain grows linearly (more customers / users /
documents — NOT 10x-hotter keys, which is the realistic way a corpus
grows and the shape the skew operators are separately tested on).

Two tables need content decorrelation, not just key shifts, or the
replicas would manufacture cross-replica duplicate clusters and the
dedup/ANN queries would measure harness artifacts (10 exact copies of
every doc => pair counts grow ~k^2, nothing like a real 10x corpus):

- documents: every 3rd whitespace token gets a per-replica suffix, so
  any 3+-token shingle differs across replicas (cross-replica Jaccard
  ~= 0) while the INTRA-replica duplicate structure the generator
  planted is preserved exactly (the substitution is injective).
- embeddings: each replica's vectors are circularly rotated by i*7 of
  the 64 dims — an orthogonal transform, so intra-replica cosine
  geometry (planted near-dup pairs, label clusters) is exactly
  preserved while cross-replica cosine decays to background.

nation/region are fixed-cardinality dimensions in the TPC-H model and
are copied unchanged.

Usage: python tools/make_scale.py [--out /root/repo/var/sf1] [--k 10]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# key column -> per-replica shift stride (next decade above the sf0.1
# max, so replica domains never collide)
STRIDES = {
    "o_orderkey": 1_000_000, "l_orderkey": 1_000_000,
    "o_custkey": 100_000, "c_custkey": 100_000,
    "l_partkey": 100_000, "p_partkey": 100_000,
    "l_suppkey": 10_000, "s_suppkey": 10_000,
    "doc_id": 10_000, "vec_id": 10_000,
    "event_id": 1_000_000, "user_id": 10_000,
}


def _tag_text(text: str, rep: int) -> str:
    if rep == 0 or not isinstance(text, str):
        return text
    toks = text.split(" ")
    tag = f"x{rep}"
    if len(toks) < 3:
        # a doc too short to hit the every-3rd-token rewrite would be
        # byte-identical across replicas — exactly the cross-replica
        # duplicate cluster this function exists to prevent
        return text + " " + tag
    for j in range(2, len(toks), 3):
        toks[j] = toks[j] + tag
    return " ".join(toks)


def _replicate(name: str, df: pd.DataFrame, rep: int) -> pd.DataFrame:
    out = df.copy()
    for col, stride in STRIDES.items():
        if col in out.columns:
            out[col] = out[col] + rep * stride
    if name == "documents":
        out["text"] = [_tag_text(t, rep) for t in out["text"]]
        out["n_chars"] = [len(t) if isinstance(t, str) else 0
                          for t in out["text"]]
    if name == "embeddings" and rep > 0:
        mat = np.array([np.asarray(v, dtype=np.float32)
                        for v in out["embedding"]])
        mat = np.roll(mat, (rep * 7) % mat.shape[1], axis=1)
        out["embedding"] = [row for row in mat]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/var/sf1")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents",
                 "embeddings"]:
        src_path = f"{SRC}/{name}.parquet"
        arrow_schema = pq.read_schema(src_path)
        df = pd.read_parquet(src_path)
        if name in ("region", "nation"):
            reps = [df]
        else:
            reps = [_replicate(name, df, i) for i in range(args.k)]
        big = pd.concat(reps, ignore_index=True)
        table = pa.Table.from_pandas(big, schema=arrow_schema,
                                     preserve_index=False)
        pq.write_table(table, f"{args.out}/{name}.parquet")
        print(f"{name}: {len(df)} -> {len(big)} rows")


if __name__ == "__main__":
    main()
