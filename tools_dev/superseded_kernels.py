"""Superseded segment-min kernel formulations — archived from
ops/pallas_scan.py in round 4 (VERDICT r3 item 8).

All three variants are numerically identical to the production surfaces
and were measured SLOWER on v5e than either segment_min_scan_xla or the
r3.7 segment_min_scan_ilv kernel (see BASELINE.md / CLAUDE.md):

* segment_min_scan (transposed roll-tree): per-segment min as sublane
  roll+minimum folds in (B, Q) layout — Mosaic moved data at ~5 GB/s.
* segment_min_scan_nat (+ the fori_loop and unrolled kernels): natural
  (Q, B) layout with in-register reshape-min — dynamic lane-dim writes
  rejected / VMEM-blew at Q=1024, the rotate-accumulator carry kept the
  whole per-step surface live.

Kept runnable (interpret mode) for history: probes that referenced them
(tools_dev/r2_sweep.py, bench_fused.py) can import from here.  NOT a
production path — Collection never dispatches these.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from syzgydb_tpu.ops import quantize as qz
from syzgydb_tpu.ops.pallas_scan import DEFAULT_BLOCK_N, DEFAULT_SEG, _SUBTILE


def _segmin_kernel(q_ref, codes_ref, norms_ref, valid_ref, out_ref,
                   *, bits, metric, seg, exact):
    """Distance surrogate in TRANSPOSED (B, Q) layout: rows ride the sublane
    axis, so the per-segment min is a native sublane reduction."""
    queries = q_ref[:]                                       # (Q, D)
    if bits in (4, 8, 16):
        scale, offset = qz.affine_constants(bits)
        qsum = jnp.sum(queries, axis=-1)                     # (Q,)
    qn2 = jnp.sum(queries * queries, axis=-1)[None, :]       # (1, Q)
    fast = bits in (4, 8) and not exact
    cast = jnp.bfloat16 if fast else jnp.float32
    if bits == 4:
        qeT = queries[:, 0::2].astype(cast).T                # (P, Q)
        qoT = queries[:, 1::2].astype(cast).T                # (floor(D/2), Q)
    else:
        qT = queries.astype(jnp.bfloat16).T if fast else queries.T

    b = codes_ref.shape[0]
    q = queries.shape[0]
    sub = min(_SUBTILE, b)
    for t in range(b // sub):
        lo = t * sub
        codes = codes_ref[lo:lo + sub, :]                    # (sub, D|P)
        prec = jax.lax.Precision.HIGHEST if exact else None
        if bits == 4:
            h = (codes >> 4).astype(jnp.int32) - 8           # (sub, P)
            low = (codes & 0xF).astype(jnp.int32) - 8
            raw = jnp.dot(h.astype(cast), qeT,
                          preferred_element_type=jnp.float32, precision=prec)
            raw = raw + jnp.dot(low[:, : qoT.shape[0]].astype(cast), qoT,
                                preferred_element_type=jnp.float32,
                                precision=prec)
        elif fast:
            raw = jnp.dot(codes.astype(jnp.bfloat16), qT,
                          preferred_element_type=jnp.float32)  # (sub, Q)
        else:
            raw = jnp.dot(codes.astype(jnp.float32), qT,
                          preferred_element_type=jnp.float32,
                          precision=prec)
        if bits in (4, 8, 16):
            dots = scale * raw + offset * qsum[None, :]
        else:
            dots = raw
        norms = norms_ref[lo:lo + sub, :]                    # (sub, 1)
        if metric == "euclidean":
            dist = jnp.maximum(qn2 - 2.0 * dots + norms, 0.0)
        else:
            denom2 = qn2 * norms
            inv = jax.lax.rsqrt(jnp.where(denom2 > 0.0, denom2, 1.0))
            cos = jnp.where(denom2 > 0.0, dots * inv, -1.0)
            dist = (1.0 - jnp.clip(cos, -1.0, 1.0)) * 0.5
        dist = jnp.where(valid_ref[lo:lo + sub, :] > 0, dist, jnp.inf)
        x = dist
        s = seg // 2
        while s >= 1:
            x = jnp.minimum(x, pltpu.roll(x, shift=sub - s, axis=0))
            s //= 2
        out_ref[lo // seg:(lo + sub) // seg, :] = \
            x.reshape(sub // seg, seg, q)[:, 0, :]


@functools.partial(jax.jit, static_argnames=("bits", "metric", "block_n",
                                             "seg", "exact", "interpret"))
def segment_min_scan(queries, codes, norms, valid, *, bits: int, metric: str,
                     block_n: int = DEFAULT_BLOCK_N, seg: int = DEFAULT_SEG,
                     exact: bool = False, interpret: bool = False):
    """(Q, D) x (N, D|P) -> (Q, N/seg) f32 surrogate segment minima."""
    n, w = codes.shape  # w = packed width for 4-bit, else D
    q, d = queries.shape
    assert n % block_n == 0, (n, block_n)
    assert block_n % seg == 0, (block_n, seg)
    nblocks = n // block_n

    grid_spec = pl.GridSpec(
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n // seg, q), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_segmin_kernel, bits=bits, metric=metric,
                               seg=seg, exact=exact)
    segmins_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n // seg, q), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * d * n, transcendentals=0,
            bytes_accessed=n * w * codes.dtype.itemsize + 4 * n
            + 4 * q * (n // seg)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(queries.astype(jnp.float32), codes, norms[:, None],
      valid.astype(jnp.float32)[:, None])
    return segmins_t.T                                       # (Q, N/seg)


def _segmin_nat_loop_kernel(q_ref, codes_ref, norms_ref, valid_ref, out_ref,
                            *, bits, metric, exact, seg):
    """fori_loop variant: dynamic lane-dim ref writes are rejected by
    Mosaic, hence the rotate-accumulator; that exceeds the 128MB VMEM
    budget at Q=1024 (the whole per-step surface stays live in the
    carry)."""
    queries = q_ref[:]                                       # (Q, D)
    if bits in (4, 8, 16):
        scale, offset = qz.affine_constants(bits)
        qsum = jnp.sum(queries, axis=-1)[:, None]            # (Q, 1)
    qn2 = jnp.sum(queries * queries, axis=-1)[:, None]       # (Q, 1)
    fast = bits in (4, 8) and not exact
    cast = jnp.bfloat16 if fast else jnp.float32
    prec = jax.lax.Precision.HIGHEST if exact else None
    dn = (((1,), (1,)), ((), ()))
    if bits == 4:
        qe = queries[:, 0::2].astype(cast)
        qo = queries[:, 1::2].astype(cast)
    else:
        qc = queries.astype(cast)

    b = codes_ref.shape[0]
    nq = queries.shape[0]
    sub = min(_SUBTILE, b)

    nout = b // seg
    step_cols = sub // seg

    def body(t, acc):
        lo = t * sub
        codes = codes_ref[pl.ds(lo, sub), :]                 # (sub, D|P)
        if bits == 4:
            h = ((codes >> 4).astype(jnp.int32) - 8).astype(cast)
            low = ((codes & 0xF).astype(jnp.int32) - 8).astype(cast)
            raw = jax.lax.dot_general(
                qe, h, dimension_numbers=dn,
                preferred_element_type=jnp.float32, precision=prec)
            raw = raw + jax.lax.dot_general(
                qo, low[:, : qo.shape[1]], dimension_numbers=dn,
                preferred_element_type=jnp.float32, precision=prec)
        else:
            raw = jax.lax.dot_general(
                qc, codes.astype(cast), dimension_numbers=dn,
                preferred_element_type=jnp.float32, precision=prec)
        if bits in (4, 8, 16):
            dots = scale * raw + offset * qsum
        else:
            dots = raw
        norms = norms_ref[pl.ds(lo, sub), :][:, 0][None, :]
        if metric == "euclidean":
            dist = jnp.maximum(qn2 - 2.0 * dots + norms, 0.0)
        else:
            denom2 = qn2 * norms
            inv = jax.lax.rsqrt(jnp.where(denom2 > 0.0, denom2, 1.0))
            cos = jnp.where(denom2 > 0.0, dots * inv, -1.0)
            dist = (1.0 - jnp.clip(cos, -1.0, 1.0)) * 0.5
        validf = valid_ref[pl.ds(lo, sub), :][:, 0][None, :]
        dist = jnp.where(validf > 0, dist, jnp.inf)
        mins = jnp.min(dist.reshape(nq, step_cols, seg), axis=-1)
        padded = jnp.pad(mins, ((0, 0), (0, nout - step_cols)),
                         constant_values=jnp.inf)
        rolled = pltpu.roll(padded, shift=t * step_cols, axis=1)
        return jnp.minimum(acc, rolled)

    acc = jnp.full((nq, nout), jnp.inf, jnp.float32)
    out_ref[:] = jax.lax.fori_loop(0, b // sub, body, acc)


@functools.partial(jax.jit, static_argnames=("bits", "metric", "block_n",
                                             "seg", "exact", "interpret"))
def segment_min_scan_nat(queries, codes, norms, valid, *, bits: int,
                         metric: str, block_n: int = DEFAULT_BLOCK_N,
                         seg: int = DEFAULT_SEG, exact: bool = False,
                         interpret: bool = False):
    """(Q, D) x (N, D|P) -> (Q, N/seg) f32 segment minima, natural layout."""
    n, w = codes.shape
    q, d = queries.shape
    assert n % block_n == 0 and block_n % seg == 0, (n, block_n, seg)
    grid_spec = pl.GridSpec(
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, block_n // seg), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_segmin_nat_loop_kernel, bits=bits, metric=metric,
                          exact=exact, seg=seg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q, n // seg), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * d * n, transcendentals=0,
            bytes_accessed=n * w * codes.dtype.itemsize + 4 * n
            + 4 * q * (n // seg)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(queries.astype(jnp.float32), codes, norms[:, None],
      valid.astype(jnp.float32)[:, None])
