from .textfns import shingles, tokens
from .vectors import cosine_similarity, dot, l2_norm

__all__ = ["shingles", "tokens", "cosine_similarity", "dot", "l2_norm"]
