from . import (asof, cluster, contamination, dedup, multimodal, pack,
               pipeline, quantize, sample, similarity, sketch, skew, text)

__all__ = ["asof", "cluster", "contamination", "dedup", "multimodal",
           "pack", "pipeline", "quantize", "sample", "similarity",
           "sketch", "skew", "text"]
