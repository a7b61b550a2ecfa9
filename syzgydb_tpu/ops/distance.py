"""Distance functions.

Semantics match the reference exactly (collection.go:812-832):

* euclidean(a, b) = sqrt(sum((a-b)^2))
* "cosine" is angular distance: acos(cos_sim) / pi in [0, 1], and 1.0 if either
  vector is a zero vector.  (The cosine argument is clamped to [-1, 1] before
  acos; the Go version can produce NaN when f64 rounding pushes the ratio
  epsilon above 1 — we deliberately clamp instead, documented deviation.)

TPU design: the hot contraction is expressed as a single (Q, D) x (D, N)
matmul on the MXU over the *centered integer codes* (see ops/quantize.py).
With dequant(c) = s * c + o:

    dot(q, v)   = s * (q @ c^T) + o * sum(q)
    ||v||^2     = precomputed at ingest (f32, per row)
    euclid^2    = ||q||^2 - 2 dot + ||v||^2
    cos_sim     = dot / (||q|| * ||v||)

so per-query work is one matmul over the quantized codes plus O(N) epilogue —
no dequantized copy of the database ever materializes in HBM.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from . import quantize as qz

Metric = Literal["euclidean", "cosine"]
VALID_METRICS = ("euclidean", "cosine")


# ---------------------------------------------------------------------------
# Host (numpy, float64) — exactness oracle, mirrors the Go scalar loops
# ---------------------------------------------------------------------------

def euclidean_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise euclidean distance. a: (..., D), b: (..., D) broadcastable."""
    diff = np.asarray(a, np.float64) - np.asarray(b, np.float64)
    return np.sqrt(np.sum(diff * diff, axis=-1))


def angular_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise angular distance (reference 'cosine'), collection.go:821-832."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    dot = np.sum(a * b, axis=-1)
    m1 = np.sum(a * a, axis=-1)
    m2 = np.sum(b * b, axis=-1)
    with np.errstate(invalid="ignore", divide="ignore"):
        cos = dot / (np.sqrt(m1) * np.sqrt(m2))
    dist = np.arccos(np.clip(cos, -1.0, 1.0)) / np.pi
    return np.where((m1 == 0) | (m2 == 0), 1.0, dist)


def distance_np(a: np.ndarray, b: np.ndarray, metric: Metric) -> np.ndarray:
    if metric == "euclidean":
        return euclidean_np(a, b)
    if metric == "cosine":
        return angular_np(a, b)
    raise ValueError(f"unknown metric {metric!r}")


# ---------------------------------------------------------------------------
# Device (jnp) — batched scoring over the packed representation
# ---------------------------------------------------------------------------

def db_row_stats(device_codes: np.ndarray, bits: int) -> np.ndarray:
    """Per-row squared norm of the *dequantized* vectors, f32 (N,).

    Computed host-side once per ingested batch; uploaded alongside the codes.
    Chunked to keep the working set small (see quantize._CHUNK_ROWS).
    """
    device_codes = np.atleast_2d(device_codes)
    n = device_codes.shape[0]
    out = np.empty((n,), dtype=np.float32)
    step = qz._CHUNK_ROWS
    for s in range(0, n, step):
        v = qz.device_repr_to_float(device_codes[s:s + step], bits)
        out[s:s + step] = np.sum(v * v, axis=-1)
    return out


def _code_matmul(queries: jnp.ndarray, codes: jnp.ndarray, bits: int,
                 precision) -> jnp.ndarray:
    """(Q, D) f32 x (N, D) codes -> (Q, N) f32 dot(q, dequant(v))."""
    if bits in (32, 64):
        return jax.lax.dot_general(
            queries, codes,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
    scale, offset = qz.affine_constants(bits)
    if precision is None and bits in (4, 8):
        # int8-range codes are exact in bf16 (|c| <= 128); ride the fast MXU path
        lhs, rhs = queries.astype(jnp.bfloat16), codes.astype(jnp.bfloat16)
    else:
        # 16-bit codes (|c| up to 32768) do not fit bf16's 8-bit mantissa
        lhs, rhs = queries, codes.astype(jnp.float32)
    raw = jax.lax.dot_general(
        lhs, rhs,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    qsum = jnp.sum(queries, axis=-1, keepdims=True)  # (Q, 1)
    return scale * raw + offset * qsum


@functools.partial(jax.jit, static_argnames=("bits", "metric", "exact"))
def score_block(queries: jnp.ndarray, codes: jnp.ndarray, row_norms: jnp.ndarray,
                valid: jnp.ndarray, bits: int, metric: Metric,
                exact: bool = False) -> jnp.ndarray:
    """Distances (Q, N) f32; invalid rows get +inf.

    queries: (Q, D) f32 — the RAW query values, intentionally NOT quantized:
             the reference compares the raw query against dequantized stored
             vectors (collection.go:583-596), and so do we.
    codes:   (N, D) device representation (int8/int16/f32).
    row_norms: (N,) f32 squared norms of dequantized rows.
    valid:   (N,) bool — live (non-tombstoned, non-padding, filter-passing).
    """
    precision = jax.lax.Precision.HIGHEST if exact else None
    dots = _code_matmul(queries, codes, bits, precision)  # (Q, N)
    if metric == "euclidean":
        qn = jnp.sum(queries * queries, axis=-1, keepdims=True)  # (Q, 1)
        d2 = qn - 2.0 * dots + row_norms[None, :]
        dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    else:
        qn = jnp.sqrt(jnp.sum(queries * queries, axis=-1, keepdims=True))
        vn = jnp.sqrt(row_norms)[None, :]
        denom = qn * vn
        cos = jnp.where(denom > 0.0, dots / jnp.where(denom > 0.0, denom, 1.0), 1.0)
        dist = jnp.arccos(jnp.clip(cos, -1.0, 1.0)) / jnp.pi
        # zero query or zero row -> max distance 1.0 (collection.go:828-829)
        dist = jnp.where((qn == 0.0) | (vn == 0.0), 1.0, dist)
    return jnp.where(valid[None, :], dist, jnp.inf)


@functools.partial(jax.jit, static_argnames=("k",))
def top_k_smallest(dist: jnp.ndarray, k: int):
    """Exact top-k smallest along last axis -> (values, indices)."""
    neg, idx = jax.lax.top_k(-dist, k)
    return -neg, idx
