"""Persistent XLA compile-cache setup, shared by every entry point.

On this class of deployment (TPU behind a tunnel) a single fresh program
shape costs seconds to tens of seconds to compile — measured 15 s for an
escalated selection margin and 47 s for the 512-rung shape at 1M x 768 —
so every process that might dispatch device programs (server, bench,
benchmark configs, tools) should share one on-disk executable cache:
first process pays the compile, every later process loads it.

Reference analog: none (the Go reference has no compiled programs); this
is the TPU-native equivalent of shipping a warmed binary.
"""

import os


def enable(cache_dir: str | None = None) -> None:
    """Point jax at a persistent compile cache; never raises (the cache
    is an optimization, not a startup requirement).  SYZGY_XLA_CACHE
    overrides the default ~/.cache/syzgy_tpu_xla location."""
    try:
        import jax

        cache_dir = cache_dir or os.environ.get(
            "SYZGY_XLA_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "syzgy_tpu_xla"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        pass
