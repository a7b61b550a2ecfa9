"""Shared helpers for the BASELINE.json benchmark configs.

Each config script prints one JSON line. Sizes scale via env vars so every
config smoke-runs on CPU (SYZGY_BENCH_SCALE=small) and runs full-size on TPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

try:
    from syzgydb_tpu.utils.hostmem import tune_host_allocator
    tune_host_allocator()
except ImportError:
    pass

try:
    # persistent compile cache: a fresh shape (e.g. an escalated selection
    # margin) costs 15-47s to compile through the tunnel; cache it across
    # benchmark processes so timed windows measure dispatches, not compiles
    from syzgydb_tpu.utils import xla_cache
    xla_cache.enable()
except ImportError:
    pass


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def scale() -> float:
    return {"small": 0.01, "medium": 0.1, "full": 1.0}[
        os.environ.get("SYZGY_BENCH_SCALE", "full")]


def emit(payload: dict) -> None:
    print(json.dumps(payload))


def make_vectors(rng: np.random.Generator, n: int, d: int,
                 normalize: bool = True) -> np.ndarray:
    out = rng.standard_normal((n, d), dtype=np.float32)
    if normalize:
        out /= np.linalg.norm(out, axis=1, keepdims=True)
    return out


def recall_at_k(truth: np.ndarray, got: np.ndarray, k: int) -> float:
    return float(np.mean([
        len(set(truth[i][:k].tolist()) & set(got[i][:k].tolist())) / k
        for i in range(truth.shape[0])]))


class Timer:
    def __init__(self):
        self.t0 = time.perf_counter()

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - self.t0
        self.t0 = now
        return dt
