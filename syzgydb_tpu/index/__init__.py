from .hamming import SignHashIndex  # noqa: F401
