from . import dedup, multimodal, similarity, textstats

__all__ = ["dedup", "multimodal", "similarity", "textstats"]
