"""syzgydb_tpu — a TPU-native embeddable vector database.

A from-scratch rebuild of the capabilities of smhanov/syzgydb (reference at
/root/reference) designed for the TPU execution model: quantized vectors live
as packed integer arrays in HBM, distance + top-k runs as fused MXU
matmul/kernel scans, the ANN index is a batched sign-projection Hamming
sketch, and multi-chip scaling shards the vector axis over a jax.sharding
Mesh with collective top-k merges.
"""

from .core.collection import (
    COSINE,
    EUCLIDEAN,
    Collection,
    CollectionOptions,
    CollectionStats,
    Document,
    FilterFn,
    SearchArgs,
    SearchResult,
    SearchResults,
)
from .utils.rng import MyRandom, my_random

__version__ = "0.1.0"

__all__ = [
    "Collection", "CollectionOptions", "CollectionStats", "Document",
    "SearchArgs", "SearchResult", "SearchResults", "FilterFn",
    "EUCLIDEAN", "COSINE", "MyRandom", "my_random", "build_filter",
]


def build_filter(query_str: str) -> FilterFn:
    """Compile a metadata query string into a FilterFn (collection.go:204-218).

    Records whose filter evaluation errors are rejected (logged once per
    search via the query engine).
    """
    from .query import filter_function_from_query
    import logging
    fn = filter_function_from_query(query_str)

    def filt(doc_id: int, metadata: bytes) -> bool:
        try:
            return fn(metadata)
        except Exception as exc:  # reference logs & rejects (collection.go:209-214)
            logging.getLogger("syzgydb.query").warning(
                "Error applying filter to document %d: %s", doc_id, exc)
            return False

    return filt
