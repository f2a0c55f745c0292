__all__ = ["similarity", "hashing"]
