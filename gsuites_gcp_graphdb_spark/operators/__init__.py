from . import dedup, joins, multimodal, similarity, text

__all__ = ["dedup", "joins", "multimodal", "similarity", "text"]
