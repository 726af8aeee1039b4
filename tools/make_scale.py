#!/usr/bin/env python
"""Deterministically inflate the driver's sf0.1 testdata to sf1 (k=10)
or sf10 (k=100) for the multi-point scale-curve bench (VERDICT r3
item 6, third decade r5).

Model: k replicas of every fact/dim table with per-replica key-domain
shifts, so referential integrity holds within and across replicas and
every group-by key domain grows linearly (more customers / users /
documents — NOT k-times-hotter keys, which is the realistic way a
corpus grows and the shape the skew operators are separately tested on).

Two tables need content decorrelation, not just key shifts, or the
replicas would manufacture cross-replica duplicate clusters and the
dedup/ANN queries would measure harness artifacts (k exact copies of
every doc => pair counts grow ~k^2, nothing like a real k-times corpus):

- documents: every 3rd whitespace token gets a per-replica suffix, so
  any 3+-token shingle differs across replicas (cross-replica Jaccard
  ~= 0) while the INTRA-replica duplicate structure the generator
  planted is preserved exactly (the substitution is injective).
- embeddings: each replica's vectors get an orthogonal transform —
  circular rotation by rep*7 dims for reps 0-9 (the historical sf1
  transform, so sf1 is a byte-stable prefix of sf10), PLUS a
  deterministic per-replica sign-flip mask for reps >= 10: with only
  64 distinct rotations, 100 rotation-only replicas would collide
  mod 64 and plant exact cross-replica duplicates; a sign mask keeps
  every replica pair decorrelated while exactly preserving
  intra-replica cosine geometry (orthogonal transform).

nation/region are fixed-cardinality dimensions in the TPC-H model and
are copied unchanged.

Replicas are written INCREMENTALLY (one pandas replica in memory at a
time, appended as parquet row groups), so k=100 over the ~600k-row
sf0.1 lineitem peaks at one-replica memory, not 60M concatenated rows.

Usage: python tools/make_scale.py [--out /root/repo/var/sf1] [--k 10]
       python tools/make_scale.py --out /root/repo/var/sf10 --k 100
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
# max at k=10; still collision-free at k=100 — max rep shift 99*stride
# stays inside int64 and below the next key family's domain)
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
        if rep >= 10:
            # orthogonal sign flip: seeded per replica, never all-+1,
            # keeps intra-replica cosines exact and makes every
            # replica pair decorrelated even when rotations collide
            rng = np.random.RandomState(1_000 + rep)
            mask = rng.choice([-1.0, 1.0],
                              size=mat.shape[1]).astype(np.float32)
            if (mask > 0).all():
                mask[0] = -1.0
            mat = mat * mask
        out["embedding"] = [row for row in mat]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/var/sf1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tables", nargs="*", default=None,
                    help="subset of tables to build (default: all)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    names = args.tables or ["region", "nation", "customer", "supplier",
                            "part", "orders", "lineitem", "events",
                            "documents", "embeddings"]
    for name in names:
        src_path = f"{SRC}/{name}.parquet"
        arrow_schema = pq.read_schema(src_path)
        df = pd.read_parquet(src_path)
        n_reps = 1 if name in ("region", "nation") else args.k
        total = 0
        with pq.ParquetWriter(f"{args.out}/{name}.parquet",
                              arrow_schema) as w:
            for i in range(n_reps):
                rep = df if n_reps == 1 else _replicate(name, df, i)
                w.write_table(pa.Table.from_pandas(
                    rep, schema=arrow_schema, preserve_index=False))
                total += len(rep)
        print(f"{name}: {len(df)} -> {total} rows")


if __name__ == "__main__":
    main()
