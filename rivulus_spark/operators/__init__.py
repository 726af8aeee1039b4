from . import dedup, multimodal, similarity, skew, text

__all__ = ["dedup", "multimodal", "similarity", "skew", "text"]
