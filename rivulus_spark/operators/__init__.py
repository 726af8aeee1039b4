from . import asof, dedup, multimodal, pipeline, similarity, sketch, skew, text

__all__ = ["asof", "dedup", "multimodal", "pipeline", "similarity",
           "sketch", "skew", "text"]
