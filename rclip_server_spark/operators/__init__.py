from . import ann, dedup, multimodal, similarity, stats, text_analysis

__all__ = ["similarity", "stats", "dedup", "ann", "multimodal", "text_analysis"]
