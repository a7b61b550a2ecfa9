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

_SQ_TABLES: dict[int, np.ndarray] = {}


def _sq_table(bits: int) -> np.ndarray:
    """dequantize(code)^2 for every code value — f64, computed with the
    exact reference dequant chain so a table gather + sum is bit-identical
    to the dequant + square + sum it replaces."""
    tab = _SQ_TABLES.get(bits)
    if tab is None:
        codes = np.arange(1 << bits, dtype=np.uint64)
        v = qz.dequantize_np(codes, bits)
        tab = _SQ_TABLES[bits] = v * v
    return tab


def db_row_stats(device_codes: np.ndarray, bits: int,
                 dims: int | None = None) -> np.ndarray:
    """Per-row squared norm of the *dequantized* vectors, f32 (N,).

    Computed host-side once per ingested batch; uploaded alongside the codes.
    Chunked to keep the working set small (see quantize._CHUNK_ROWS).
    `dims` is required for 4-bit (packed device codes).

    8/16-bit ride a squared-value lookup table (one gather + one sum
    instead of the ~6-temporary dequant chain; same f64 values and
    summation order, so the output is bit-identical — the reopen/ingest
    hot path at config5 scale)."""
    device_codes = np.atleast_2d(device_codes)
    n = device_codes.shape[0]
    out = np.empty((n,), dtype=np.float32)
    step = qz._CHUNK_ROWS
    if bits == 8:
        tab, raw, flip = _sq_table(8), device_codes.view(np.uint8), 0x80
    elif bits == 16:
        tab, raw, flip = _sq_table(16), device_codes.view(np.uint16), 0x8000
    else:
        tab = raw = flip = None
    for s in range(0, n, step):
        if tab is not None:
            # XOR per chunk: a whole-matrix index temporary would defeat
            # the chunking (review finding)
            out[s:s + step] = np.sum(tab[raw[s:s + step] ^ flip], axis=-1)
        else:
            v = qz.device_repr_to_float(device_codes[s:s + step], bits, dims)
            out[s:s + step] = np.sum(v * v, axis=-1)
    return out


def ingest_reprs(vectors: np.ndarray, bits: int
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One quantize pass -> (storage bytes, host column codes, row stats).

    Fuses pack_vectors + codes_to_host_repr + db_row_stats for the bulk
    ingest path: all three derive from the same quantized codes, and the
    duplicate quantize/dequant passes were ~55% of the host-side ingest
    cost at config5 scale (50k x 384 x 8-bit: 1081 -> ~420 ms).  Every
    output is bit-identical to the unfused calls (the centered device code
    is the unsigned storage code with its sign bit flipped, and the norm
    uses the reference f64 dequant formula on the SAME codes) — pinned by
    tests/test_quantize.py.  Chunked like the unfused paths (first-touch
    page faults dominate on single-core hosts, quantize._CHUNK_ROWS)."""
    qz._check_bits(bits)
    vectors = np.atleast_2d(np.asarray(vectors, dtype=np.float64))
    n, dims = vectors.shape
    packed = np.empty((n, qz.vector_byte_size(bits, dims)), np.uint8)
    host = np.array(vectors, dtype=np.float64) if bits == 64 else \
        np.empty((n, qz.device_width(bits, dims)), qz.host_dtype(bits))
    norms = np.empty(n, np.float32)
    step = qz._CHUNK_ROWS
    for s in range(0, n, step):
        chunk = vectors[s:s + step]
        m = chunk.shape[0]
        if bits == 64:
            packed[s:s + step] = chunk.view(np.uint64).astype(
                ">u8").view(np.uint8).reshape(m, -1)
            v = chunk
        elif bits == 32:
            f32 = np.asarray(chunk, dtype=np.float32)
            packed[s:s + step] = f32.view(np.uint32).astype(
                ">u4").view(np.uint8).reshape(m, -1)
            host[s:s + step] = f32
            v = f32.astype(np.float64)
        else:  # 4 / 8 / 16: integer codes
            # quantize_np without the uint64 round-trip: f64 holds the
            # integral codes exactly, and each op below rounds identically
            # to the (clamped+1)/2*maxint, floor(x+.5), codes/maxint*2-1
            # reference chain — see test_ingest_reprs_parity
            maxint = float(qz._MAXINT[bits])
            q = np.clip(chunk, -1.0, 1.0)
            q += 1.0
            q *= maxint / 2.0
            q += 0.5
            np.floor(q, out=q)
            if bits == 4:
                padded = np.zeros((m, dims + (dims % 2)), np.uint8)
                padded[:, :dims] = q.astype(np.uint8)
                pk = (padded[:, 0::2] << 4) | (padded[:, 1::2] & 0x0F)
                packed[s:s + step] = pk
                host[s:s + step] = pk  # packed nibbles ARE the device repr
            elif bits == 8:
                pk = q.astype(np.uint8)
                packed[s:s + step] = pk
                # (code-128) over [0,255] == flip the top bit, reread signed
                host[s:s + step] = (pk ^ 0x80).view(np.int8)
            else:  # 16
                pk = q.astype(np.uint16)
                packed[s:s + step] = pk.astype(
                    ">u2").view(np.uint8).reshape(m, -1)
                host[s:s + step] = (pk ^ 0x8000).view(np.int16)
            q /= maxint
            q *= 2.0
            q -= 1.0
            v = q
        norms[s:s + step] = np.sum(v * v, axis=-1)
    return packed, host, norms


def fast_dot_dtype():
    """bf16 on TPU (int8-range codes are exact in its 8-bit mantissa and ride
    the fast MXU path); f32 elsewhere — the CPU backend's DotThunk cannot
    execute a bf16 x bf16 -> f32 dot_general."""
    try:
        if jax.default_backend() in ("tpu", "axon"):
            return jnp.bfloat16
    except Exception:
        pass
    return jnp.float32


def split_nibbles(packed: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Packed 4-bit codes (..., P) uint8 -> centered (high, low) int8 in
    [-8, 7].  High nibble = even dims, low = odd dims (disk nibble order,
    collection.go:727-731)."""
    h = (packed >> 4).astype(jnp.int8) - jnp.int8(8)
    l = (packed & 0xF).astype(jnp.int8) - jnp.int8(8)
    return h, l


def deinterleave_queries(queries: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(Q, D) -> even-dim and odd-dim halves matching split_nibbles."""
    return queries[..., 0::2], queries[..., 1::2]


def packed4_dots(queries: jnp.ndarray, codes: jnp.ndarray,
                 precision) -> jnp.ndarray:
    """(Q, D) f32 x (N, P) packed uint8 -> (Q, N) f32 dot(q, dequant(v)).

    Two half-width matmuls on the nibble planes — the unpacked (N, D) code
    matrix never materializes, so HBM traffic stays at the packed D/2
    bytes/row (VERDICT r1 item 6).
    """
    scale, offset = qz.affine_constants(4)
    qe, qo = deinterleave_queries(queries)
    h, l = split_nibbles(codes)
    l = l[..., : qo.shape[-1]]  # odd D: drop the pad nibble column
    cast = fast_dot_dtype() if precision is None else jnp.float32
    dn = (((1,), (1,)), ((), ()))
    raw = jax.lax.dot_general(
        qe.astype(cast), h.astype(cast), dimension_numbers=dn,
        preferred_element_type=jnp.float32, precision=precision)
    raw = raw + jax.lax.dot_general(
        qo.astype(cast), l.astype(cast), dimension_numbers=dn,
        preferred_element_type=jnp.float32, precision=precision)
    qsum = jnp.sum(queries, axis=-1, keepdims=True)
    return scale * raw + offset * qsum


def packed4_dots_batched(queries: jnp.ndarray, ccodes: jnp.ndarray,
                         precision=None) -> jnp.ndarray:
    """(Q, D) f32 x (Q, C, P) packed uint8 -> (Q, C) f32 per-candidate dots."""
    scale, offset = qz.affine_constants(4)
    qe, qo = deinterleave_queries(queries)
    h, l = split_nibbles(ccodes)
    l = l[..., : qo.shape[-1]]
    cast = fast_dot_dtype() if precision is None else jnp.float32
    raw = jnp.einsum("qd,qcd->qc", qe.astype(cast), h.astype(cast),
                     preferred_element_type=jnp.float32, precision=precision)
    raw = raw + jnp.einsum("qd,qcd->qc", qo.astype(cast), l.astype(cast),
                           preferred_element_type=jnp.float32,
                           precision=precision)
    qsum = jnp.sum(queries, axis=-1, keepdims=True)
    return scale * raw + offset * qsum


def split_bf16x2(queries: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f32 (Q, D) -> (hi, lo) bf16 pair with hi + lo ~= q to ~16 mantissa
    bits.  dot(q, c) = dot(hi, c) + dot(lo, c) runs as two fast bf16 MXU
    passes yet carries ~2^-16 relative query error instead of bf16's 2^-8 —
    the trick that makes the segment-min surface's error bound tight enough
    for the provably-exact selection threshold (fused_scan_topk)."""
    hi = queries.astype(jnp.bfloat16)
    lo = (queries - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def code_dots_accurate(queries: jnp.ndarray, codes: jnp.ndarray,
                       bits: int) -> jnp.ndarray:
    """(Q, D) f32 x (N, D|P) codes -> (Q, N) dots with a PROVABLE error
    bound of ~1e-5 relative (vs bf16's 2^-8) while keeping the code stream
    at its narrow dtype:

    * 4/8-bit: codes are exact in bf16; the query rides split_bf16x2, so
      the only residual error is the f32 accumulation (~D * 2^-24).
    * 16/32/64-bit: HIGHEST-precision f32 dots (codes don't fit bf16's
      mantissa; these widths are not the traffic-bound headline path).
    """
    dn = (((1,), (1,)), ((), ()))
    if bits in (32, 64):
        return jax.lax.dot_general(
            queries, codes, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    use_bf16 = fast_dot_dtype() == jnp.bfloat16  # CPU backend can't dot bf16
    scale, offset = qz.affine_constants(bits)
    if bits == 4:
        qe, qo = deinterleave_queries(queries)
        h, l = split_nibbles(codes)
        l = l[..., : qo.shape[-1]]
        raw = jnp.zeros((queries.shape[0], codes.shape[0]), jnp.float32)
        for qpart, cpart in ((qe, h), (qo, l)):
            if use_bf16:
                for qhalf in split_bf16x2(qpart):
                    raw = raw + jax.lax.dot_general(
                        qhalf, cpart.astype(jnp.bfloat16),
                        dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
            else:
                raw = raw + jax.lax.dot_general(
                    qpart, cpart.astype(jnp.float32), dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    elif bits == 8 and use_bf16:
        chalf = codes.astype(jnp.bfloat16)
        raw = jnp.zeros((queries.shape[0], codes.shape[0]), jnp.float32)
        for qhalf in split_bf16x2(queries):
            raw = raw + jax.lax.dot_general(
                qhalf, chalf, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
    else:  # 16-bit anywhere; 8-bit off-TPU
        raw = jax.lax.dot_general(
            queries, codes.astype(jnp.float32), dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    qsum = jnp.sum(queries, axis=-1, keepdims=True)
    return scale * raw + offset * qsum


def _code_matmul(queries: jnp.ndarray, codes: jnp.ndarray, bits: int,
                 precision) -> jnp.ndarray:
    """(Q, D) f32 x (N, D|P) codes -> (Q, N) f32 dot(q, dequant(v))."""
    if precision is None and bits > 8:
        # wide codes must never ride the default matmul — on TPU it is ONE
        # bf16 pass on BOTH operands (~2^-9 rel err on the codes, unbounded
        # by any flag delta).  This is the shared primitive under
        # score_block's non-fused fallback, which used to miss the guard
        # segment_min_scan_xla / rerank_topk apply (CLAUDE.md invariant;
        # review finding r5).  4/8-bit integer codes are bf16-exact.
        precision = jax.lax.Precision.HIGH
    if bits in (32, 64):
        return jax.lax.dot_general(
            queries, codes,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
    if bits == 4:
        return packed4_dots(queries, codes, precision)
    scale, offset = qz.affine_constants(bits)
    if precision is None and bits == 8:
        # int8-range codes are exact in bf16 (|c| <= 128); ride the fast MXU path
        cast = fast_dot_dtype()
        lhs, rhs = queries.astype(cast), codes.astype(cast)
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
