from . import asof, dedup, multimodal, pipeline, similarity, skew, text

__all__ = ["asof", "dedup", "multimodal", "pipeline", "similarity", "skew", "text"]
