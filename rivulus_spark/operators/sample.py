"""Deterministic sampling for training-data mixture construction.

``Dataset.sample`` / ``sampleBy`` draw from a per-partition RNG: the
result changes with partitioning, retries, and cluster layout — useless
for reproducible corpus mixes or for an independent oracle. These
operators sample on a CONTENT-derived hash instead: a row is kept iff
its key's MD5 bucket falls under the stratum's rate, so the same row
set survives on any cluster, any partitioning, any engine (the bucket
expression is replicable in SQL: ``('0x' || substring(md5(k),1,15))
::BIGINT % 1_000_000``).

Scale shape: the predicate is a pure projection over each row — no
shuffle, no state, pushes through column pruning, and composes with
any downstream plan. Changing ``seed`` re-draws an independent sample
(the seed is concatenated into the hashed key).

Reference: no sampling surface exists in the reference engine; this is
a north-star training-pipeline operator (mixture weighting is how a
100 TB corpus becomes a token-budgeted training mix).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import word_hash

#: bucket space; rates are resolved to integer thresholds out of this
N_BUCKETS = 1_000_000


def hash_bucket(key: Column, seed: str = "") -> Column:
    """Deterministic bucket in [0, N_BUCKETS) from the MD5 of the
    stringified key (prefixed with ``seed``)."""
    return word_hash(F.concat(F.lit(seed), key.cast("string"))) % N_BUCKETS


def _threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"sampling rate must be in [0, 1], got {rate}")
    return int(rate * N_BUCKETS)


def hash_sample(df: DataFrame, rate: float, key_col: str,
                seed: str = "") -> DataFrame:
    """Keep ~``rate`` of rows, chosen deterministically by key hash."""
    return df.filter(hash_bucket(F.col(key_col), seed) < _threshold(rate))


def stratified_hash_sample(df: DataFrame, strata_col: str,
                           rates: dict[str, float], key_col: str,
                           default_rate: float = 0.0,
                           seed: str = "") -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value gets its
    own rate (unlisted strata fall back to ``default_rate``). The rate
    lookup compiles to a CASE chain — still a pure projection."""
    thr: Column = F.lit(_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == value,
                     F.lit(_threshold(rate))).otherwise(thr)
    return df.filter(hash_bucket(F.col(key_col), seed) < thr)
