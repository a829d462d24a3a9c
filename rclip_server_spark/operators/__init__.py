from . import ann, dedup, multimodal, similarity, stats

__all__ = ["similarity", "stats", "dedup", "ann", "multimodal"]
