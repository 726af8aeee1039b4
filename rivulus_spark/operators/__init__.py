from . import (asof, cluster, contamination, dedup, multimodal, pack,
               pipeline, quantize, rank, retrieval, sample, similarity,
               sketch, skew, stats, text)

__all__ = ["asof", "cluster", "contamination", "dedup", "multimodal",
           "pack", "pipeline", "quantize", "rank", "retrieval",
           "sample", "similarity", "sketch", "skew", "stats", "text"]
