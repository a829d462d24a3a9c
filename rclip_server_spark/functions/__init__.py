from . import hashing, text, vector

__all__ = ["vector", "text", "hashing"]
