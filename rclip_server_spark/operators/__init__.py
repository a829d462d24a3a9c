from . import ann, dedup, similarity, stats

__all__ = ["similarity", "stats", "dedup", "ann"]
