from . import dedup, multimodal, pipeline, similarity, skew, text

__all__ = ["dedup", "multimodal", "pipeline", "similarity", "skew", "text"]
