from . import dedup, multimodal, similarity

__all__ = ["dedup", "multimodal", "similarity"]
