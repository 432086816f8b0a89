from .bloom import BloomFilter  # noqa: F401
