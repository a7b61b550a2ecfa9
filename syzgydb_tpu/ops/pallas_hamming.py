"""Fused Hamming sketch-scan Pallas kernel.

The XLA path in index/hamming.hamming_candidates accumulates per-word
XOR+popcount over separate (Q, N) int32 passes — ~W x 2 full HBM sweeps of
the accumulator on top of the 20MB sketch read.  This kernel tiles the sketch
table over row blocks and does the whole reduction in VMEM, writing a single
(Q, N) uint8 distance surface (total bits <= 255) in one pass:

    HBM traffic = N*W*4 (sketches) + Q*N (uint8 out)  ~= 84MB at 1M x 5 words

Candidate selection stays in XLA (approx_min_k PartialReduce over the uint8
surface) — that part is already near bandwidth-limited.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_N = 4096


def _hamming_kernel(qcodes_ref, hashes_ref, out_ref, *, words):
    qc = qcodes_ref[:]                       # (Q, W) uint32
    h = hashes_ref[:]                        # (block_n, W) uint32
    q = qc.shape[0]
    block_n = h.shape[0]
    acc = jnp.zeros((q, block_n), dtype=jnp.int32)
    for w in range(words):                   # static unroll, W small
        x = jnp.bitwise_xor(qc[:, w][:, None], h[:, w][None, :])
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:] = acc.astype(jnp.uint8)


_BF16_SUBTILE = 1024


def _hamming_bf16_kernel(qcodes_ref, hashes_ref, valid_ref, out_ref,
                         *, words):
    """Hamming distances as a bf16 surface with invalid rows pushed to 16384.

    bf16 represents integers 0..256 exactly (total sketch bits <= 254), and
    lax.approx_min_k can consume the surface DIRECTLY — the uint8 variant
    forces an (Q, N) f32 conversion that materializes 4 bytes/entry in HBM
    before selection (measured 7.5 ms at 1M x 64q vs ~1.5 ms read-bound).

    The block is processed in row subtiles: the W-way unrolled XOR+popcount
    keeps ~W (Q, rows) i32 values live in vector registers, and a whole
    4096-row block at Q=64 blows the 16MB scoped-VMEM stack limit (seen on
    v5e); per-subtile slices bound the live set while DMA still moves whole
    blocks."""
    qc = qcodes_ref[:]                       # (Q, W) uint32
    q = qc.shape[0]
    b = hashes_ref.shape[0]
    sub = min(_BF16_SUBTILE, b)
    for t in range(b // sub):
        lo = t * sub
        h = hashes_ref[lo:lo + sub, :]       # (sub, W) uint32
        acc = jnp.zeros((q, sub), dtype=jnp.int32)
        for w in range(words):               # static unroll, W small
            x = jnp.bitwise_xor(qc[:, w][:, None], h[:, w][None, :])
            acc = acc + jax.lax.population_count(x).astype(jnp.int32)
        validf = valid_ref[lo:lo + sub, :][:, 0][None, :]   # (1, sub)
        out_ref[:, lo:lo + sub] = jnp.where(
            validf > 0, acc.astype(out_ref.dtype),
            jnp.asarray(16384.0, out_ref.dtype))


@functools.partial(jax.jit, static_argnames=("words", "block_n", "interpret"))
def hamming_scores(qcodes, hashes, *, words: int,
                   block_n: int = DEFAULT_BLOCK_N, interpret: bool = False):
    """(Q, W) x (N, W) packed sketches -> (Q, N) uint8 Hamming distances."""
    n = hashes.shape[0]
    q = qcodes.shape[0]
    assert n % block_n == 0, (n, block_n)
    nblocks = n // block_n
    grid_spec = pl.GridSpec(
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((q, words), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, words), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, block_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_hamming_kernel, words=words),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q, n), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * words, transcendentals=0,
            bytes_accessed=n * words * 4 + q * n),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qcodes, hashes)


@functools.partial(jax.jit, static_argnames=("words", "block_n", "interpret",
                                             "out_dtype"))
def hamming_scores_bf16(qcodes, hashes, valid, *, words: int,
                        block_n: int = DEFAULT_BLOCK_N,
                        interpret: bool = False, out_dtype=jnp.bfloat16):
    """(Q, W) x (N, W) sketches + (N,) valid -> (Q, N) float distances
    (invalid rows = 16384), ready for lax.approx_min_k with no conversion.
    out_dtype: bf16 halves surface bytes; f32 keeps approx_min_k on its
    fastest PartialReduce path (measure per backend)."""
    n = hashes.shape[0]
    q = qcodes.shape[0]
    assert n % block_n == 0, (n, block_n)
    nblocks = n // block_n
    grid_spec = pl.GridSpec(
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((q, words), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, words), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, block_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_hamming_bf16_kernel, words=words),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * words, transcendentals=0,
            bytes_accessed=n * words * 4
            + q * n * jnp.dtype(out_dtype).itemsize),
        # the compiler charges the whole (Q, N) result against the kernel's
        # scoped-VMEM stack at large N; raise the 16MB default like
        # pallas_scan does or 1M-row surfaces refuse to compile
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qcodes, hashes, valid.astype(jnp.float32)[:, None])
