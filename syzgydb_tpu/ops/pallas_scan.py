"""Fused segment-min distance scan — the TPU exhaustive-search kernel.

The XLA path (ops/distance.score_block + top_k) materializes the (Q, N)
score matrix in HBM — an extra write+read of Q*N*4 bytes on top of the
mandatory codes read — and then pays a full lax.top_k pass over N.  Profiled
on v5e at 1M x 384 x 64q (tools_dev/profile_scan.py, round 2): 3.2 ms
surface + 4.3 ms top_k, ~5.4 ms pipelined, ~5x off the codes-stream roofline.

In-kernel streaming top-k was tried and measured worse: any merge needs
either k serialized min-passes (Mosaic unrolls them and stack-OOMs VMEM at
Q=64) or data-dependent control flow (a scalar-predicate pipeline stall per
block: 60 ms).  The design that actually fits the hardware is two-phase:

  1. **Pallas kernel** (this file): stream the codes once, MXU contraction,
     distance surrogate on the VPU, and reduce each SEG consecutive rows to
     their minimum.  Output is a tiny (Q, N/SEG) f32 surface — 2 MB at 1M
     rows instead of 256 MB.  No control flow, perfect DMA pipelining; HBM
     traffic = the codes read, which is the speed-of-light floor.
  2. **Wrapper**: top-k over the segment minima picks the S = k + margin
     best segments (exactness: every true top-k row lives in a segment
     whose min is <= the k-th best value, and at most k-1 segments can have
     a strictly smaller min — so the top-k segments by min contain the full
     answer up to value ties).  Those segments are gathered CONTIGUOUSLY
     (SEG*D-byte slabs, DMA-friendly, unlike the per-row gathers that cost
     6.5 ms in the ANN rerank) and reranked exactly.

Ranking uses a MONOTONIC SURROGATE of the metric (squared euclidean;
(1-cos)/2 for angular — acos has no TPU lowering); the exact transform is
applied after the rerank.  Replaces the reference's per-candidate
fetch+decode+distance loop (collection.go:583-596, 812-832).

Supported on TPU; call sites fall back to the XLA path elsewhere (and use
interpret mode in CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import quantize as qz

DEFAULT_BLOCK_N = 4096
# segment width: selection top_k width (N/seg) trades against rerank
# gather bytes (sv*seg*W per query).  r8c re-swept on the subtile-1024
# stack: seg 32 beats 64 by ~0.3 ms at the headline (12.36 vs 12.67 ms,
# margin 6) — halving the gather now wins since the lane slab made
# gathers cheap relative to the wider selection.  (r7g measured a wash at
# subtile 256 + margin 8; the balance moved with the faster surface.)
DEFAULT_SEG = 32
MAX_FUSED_K = 128
# large-k dispatches (radius escalation asks for up to 1024) may still
# ride the fused path when the candidate-gather working set stays small.
# The real gather is Q*(k+margin+1)*seg rows (seg = DEFAULT_SEG = 32, and
# margin rides on top of k), so the budget below is the Q*k TERM only —
# a deliberate underestimate tolerated because the shapes that pass it
# (per-query radius, Q<=8) leave ~10x headroom even at margin 64, while
# big batched k stays on the two-dispatch path.  2^16 Q*k slots * seg(32)
# * D(384) ~= 0.8 GB of int8 gather at the headline dims.
_FUSED_K_BUDGET = 1 << 16


def fused_k_ok(k: int, n_queries: int) -> bool:
    """Whether (k, Q) fits the fused scan: the standard serving bound, or
    a small-batch large-k dispatch within the gather budget (the radius
    path's shape — collection._radius_search)."""
    return k <= MAX_FUSED_K or \
        (k <= 1024 and max(1, n_queries) * k <= _FUSED_K_BUDGET)
# default extra segments gathered beyond k: must cover the typical tie
# count under the provable threshold.  With the tightened 1*delta bridge
# (see _select_and_rerank) the flag held for 4096/4096 fresh clustered
# headline-corpus queries at margin 24 (16 failed 1-in-4096, the old
# 3.1*delta bridge needed 32); escalation re-dispatches on the rare
# overflow, and Collection's hint gate keeps one-off overflows from
# poisoning future searches (tools_dev/r5_margin_sweep.py).
_TIE_MARGIN = 24
# f32 surfaces (the ilv fused kernel, exact mode) have no bf16 storage
# collisions AND drop the half-ulp factors from the flag bridge: the tie
# window shrinks to the query-rounding delta alone.  Margin 6 held
# 4096/4096 fresh headline queries at BOTH seg 64 and 32 (margin 4
# failed 13/4096 — not worth the escalation re-dispatches); 8 was the
# r3.7 default, re-swept down in r8b/r8c (tools_dev/r8*_stage2_probe).
# A failure escalates to the 64 rung.
_TIE_MARGIN_F32 = 6


def default_tie_margin(surf_f32: bool) -> int:
    return _TIE_MARGIN_F32 if surf_f32 else _TIE_MARGIN


_SUBTILE = 512


def _affine_dots(queries, raw, bits):
    """Raw code contraction -> true dot products (affine dequantization)."""
    if bits in (32, 64):
        return raw
    scale, offset = qz.affine_constants(bits)
    return scale * raw + offset * jnp.sum(queries, axis=-1, keepdims=True)


def _dots_to_dist_surr(queries, dots, cnorms, cvalid, metric):
    """Metric epilogue shared by the gather and lane rerank paths:
    (Q, C) dots -> (dist, surrogate), invalid rows +inf, zero vectors at
    the reference distance (cosine: 1.0)."""
    if metric == "euclidean":
        qn = jnp.sum(queries * queries, axis=-1, keepdims=True)
        surr = jnp.maximum(qn - 2.0 * dots + cnorms, 0.0)
        dist = jnp.sqrt(surr)
    else:
        qn = jnp.sqrt(jnp.sum(queries * queries, axis=-1, keepdims=True))
        vn = jnp.sqrt(cnorms)
        denom = qn * vn
        cos = jnp.where(denom > 0.0, dots / jnp.where(denom > 0.0, denom, 1.0),
                        1.0)
        cos = jnp.clip(cos, -1.0, 1.0)
        dist = jnp.arccos(cos) / jnp.pi
        zero = (qn == 0.0) | (vn == 0.0)
        dist = jnp.where(zero, 1.0, dist)
        surr = jnp.where(zero, 1.0, (1.0 - cos) * 0.5)
    return (jnp.where(cvalid, dist, jnp.inf),
            jnp.where(cvalid, surr, jnp.inf))


def _candidate_distances(queries, ccodes, cnorms, cvalid, bits, metric,
                         exact, with_surrogate: bool = False):
    """Exact distances for gathered candidates (Q, C, D|P) -> (Q, C) f32.

    Always HIGHEST precision: the candidate set is tiny (S*seg rows per
    query vs N scanned), so true-f32 math costs nothing measurable here,
    and it is what makes precision="high" PROVABLY return the exact f32
    top-k once the tie-aware segment selection guarantees coverage.

    with_surrogate=True also returns the surrogate-space values (squared
    distance / (1-cos)/2, invalid rows +inf) — the completeness flag
    compares exact per-segment minima against surface values in surrogate
    units (_select_and_rerank)."""
    from . import distance as dist_ops
    precision = jax.lax.Precision.HIGHEST
    if bits == 4:
        dots = dist_ops.packed4_dots_batched(queries, ccodes, precision)
    else:
        raw = jnp.einsum("qd,qcd->qc", queries, ccodes.astype(jnp.float32),
                         preferred_element_type=jnp.float32,
                         precision=precision)
        dots = _affine_dots(queries, raw, bits)
    dist, surr = _dots_to_dist_surr(queries, dots, cnorms, cvalid, metric)
    if with_surrogate:
        return dist, surr
    return dist


def gather_segments(arr, seg_idx, seg: int):
    """Contiguous segment gather: (N, ...) x (Q, S) -> (Q, S*seg, ...).

    Gathers SEG*row-size byte slabs (DMA-friendly) instead of per-row."""
    n = arr.shape[0]
    tail = arr.shape[1:]
    flat = arr.reshape(n // seg, -1)
    g = jnp.take(flat, seg_idx, axis=0)           # (Q, S, seg*prod(tail))
    qn, s = seg_idx.shape
    return g.reshape((qn, s * seg) + tail)


# ---------------------------------------------------------------------------
# Tile-aligned lane slabs: the fast rerank gather path.
#
# A 2-D (N//seg, seg*D) code view tiles its LAST TWO dims ((32,128) for
# int8), interleaving 32 consecutive segments inside every tile — a
# single-slab gather then reads sub-tile strides at ~37 GB/s (measured,
# tools_dev/r6d_tile_gather_probe.py).  Reshaped 3-D as
# (N//seg, seg*D/128, 128) the leading dim is UNTILED: each slab is whole
# (8,128) tiles and jnp.take DMAs at ~99 GB/s — 2.7x.  The rerank then
# contracts DIRECTLY on that layout (no relayout back to (Q, C, D), which
# measured +3.7 ms and de-fused the consumer):
#
#   slab element (t, l) = element (t % Lr)*128 + l of row t // Lr,
#   Lr = D/128, so with the query repeated as (Lr, 128) blocks a
#   lane-reduce + Lr-term strided sum yields the row dots — pure VPU,
#   f32 products/accumulation (same rounding class as the HIGHEST einsum
#   on the gather path; agreement pinned in tests/test_lane_rerank.py).
# ---------------------------------------------------------------------------

_LANE = 128


def lane_slab_supported(bits: int, dims: int) -> bool:
    """Lane rerank needs whole 128-element lanes per row; packed 4-bit
    nibbles address half-elements and are served by the gather path."""
    return bits != 4 and dims % _LANE == 0


def make_lane_slab(codes, seg: int = DEFAULT_SEG):
    """Tile-aligned slab view of the device codes: (N, D) ->
    (N//seg, seg*D/128, 128), same dtype.  A device-side relayout (one
    HBM pass) — NOT free like the host numpy view, so Collection keeps it
    as derived device state alongside the matmul-layout codes."""
    n, d = codes.shape
    return codes.reshape(n // seg, (seg * d) // _LANE, _LANE)


def codes_from_slab(slab, seg: int = DEFAULT_SEG):
    """Matmul-layout (N, D|P) view of the lane slab — the slab is a pure
    reshape of the codes (same linear order), so this logical view costs
    nothing until a consumer forces a physical relayout (one HBM pass).
    Lean placements (Collection, >2 GB codes) drop the resident matmul
    buffer and reconstruct it per dispatch for the RARE paths that need it
    (exact-mode XLA surface, Q > _ILV_MAX_Q, non-fused large-k)."""
    nseg, m, lanes = slab.shape
    return slab.reshape(nseg * seg, (m * lanes) // seg)


@functools.partial(jax.jit, static_argnames=("bits", "metric", "k", "seg",
                                             "with_counts"))
def lane_rerank_topk(queries, slab, norms, valid, cand, *, bits: int,
                     metric: str, k: int, seg: int = DEFAULT_SEG,
                     with_counts: bool = False):
    """ANN candidate rerank served from the lane slab (no matmul-layout
    codes buffer — the lean-placement analog of hamming.rerank_topk).

    Per-row gathers from a 2-D code layout are inherently sub-tile
    (~37 GB/s, index/hamming.py layout note); the slab's whole-tile
    SEGMENT gathers run ~2.7x faster, so each candidate fetches its whole
    seg-row segment (duplicates included) and selects its own row from the
    lane dots — 32x the bytes at full bandwidth, a fine trade at the small
    serving batches where the ANN path wins.  Returns the same
    (dist, rows[, nscored]) contract as rerank_topk."""
    nq, c = cand.shape
    seg_idx = cand // seg
    within = (cand % seg).astype(jnp.int32)
    raw = _lane_dots(queries, slab, seg_idx, seg)      # (Q, C*seg)
    raw = jnp.take_along_axis(raw.reshape(nq, c, seg),
                              within[..., None], axis=2)[..., 0]
    dots = _affine_dots(queries, raw, bits)
    cnorms = jnp.take(norms, cand, axis=0)
    cvalid = jnp.take(valid, cand, axis=0)
    dist, _ = _dots_to_dist_surr(queries, dots, cnorms, cvalid, metric)
    kk = min(k, dist.shape[1])
    if kk > 128:
        vals, pos = jax.lax.approx_min_k(dist, kk, recall_target=0.95)
        rows = jnp.take_along_axis(cand, pos, axis=1)
    else:
        neg, pos = jax.lax.top_k(-dist, kk)
        vals, rows = -neg, jnp.take_along_axis(cand, pos, axis=1)
    if with_counts:
        return vals, rows, jnp.sum(cvalid, axis=1).astype(jnp.int32)
    return vals, rows


def _lane_dots(queries, slab, seg_idx, seg: int):
    """Raw contraction dot(q, row) for every row of the selected segments,
    computed on the tile-aligned slab layout: (Q, D) x (nseg, seg*Lr, 128)
    x (Q, SV) -> (Q, SV*seg) f32."""
    nq, d = queries.shape
    sv = seg_idx.shape[1]
    lr = d // _LANE
    g = jnp.take(slab, seg_idx, axis=0)             # (Q, SV, seg*Lr, 128)
    qx = queries.reshape(nq, lr, _LANE)
    qrep = jnp.tile(qx, (1, seg, 1))                # (Q, seg*Lr, 128)
    partial = jnp.sum(g.astype(jnp.float32) * qrep[:, None, :, :],
                      axis=-1)                      # (Q, SV, seg*Lr)
    raw = partial[:, :, 0::lr]
    for j in range(1, lr):
        raw = raw + partial[:, :, j::lr]            # (Q, SV, seg)
    return raw.reshape(nq, sv * seg)


def _surface_kernel(q_ref, codes_ref, norms_ref, valid_ref, out_ref,
                    *, bits, metric, exact):
    """Distance surrogate surface in NATURAL (Q, block) layout.

    The whole point vs letting XLA do it: the int8/packed codes convert to
    bf16 INSIDE VMEM — XLA's dot materializes a bf16 copy of the full code
    matrix in HBM first (768MB at 1M x 384), which is where the measured
    3.2ms surface time went.  HBM traffic here = codes read + bf16 surface
    write.  Row subtiles bound live vector registers (same lesson as the
    bf16 hamming kernel)."""
    queries = q_ref[:]                                       # (Q, D) f32
    if bits in (4, 8, 16):
        scale, offset = qz.affine_constants(bits)
        qsum = jnp.sum(queries, axis=-1)[:, None]            # (Q, 1)
    qn2 = jnp.sum(queries * queries, axis=-1)[:, None]       # (Q, 1)
    fast = bits in (4, 8) and not exact
    cast = jnp.bfloat16 if fast else jnp.float32
    prec = jax.lax.Precision.HIGHEST if exact else None
    dn = (((1,), (1,)), ((), ()))
    if bits == 4:
        qe = queries[:, 0::2].astype(cast)                   # (Q, P)
        qo = queries[:, 1::2].astype(cast)
    else:
        qc = queries.astype(cast)

    b = codes_ref.shape[0]
    sub = min(_SUBTILE, b)
    for t in range(b // sub):
        lo = t * sub
        codes = codes_ref[lo:lo + sub, :]                    # (sub, D|P)
        if bits == 4:
            # widen BEFORE shifting: sub-word (uint8) shift ops crash the
            # remote Mosaic compile helper with a detail-free HTTP 500
            # (CLAUDE.md r7j; same pattern as the ilv kernel's unpack —
            # review finding r5)
            c32 = codes.astype(jnp.int32)
            h = ((c32 >> 4) - 8).astype(cast)
            low = ((c32 & 0xF) - 8).astype(cast)
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
            dots = scale * raw + offset * qsum               # (Q, sub)
        else:
            dots = raw
        norms = norms_ref[lo:lo + sub, :][:, 0][None, :]     # (1, sub)
        if metric == "euclidean":
            dist = jnp.maximum(qn2 - 2.0 * dots + norms, 0.0)
        else:
            denom2 = qn2 * norms
            inv = jax.lax.rsqrt(jnp.where(denom2 > 0.0, denom2, 1.0))
            cos = jnp.where(denom2 > 0.0, dots * inv, -1.0)
            dist = (1.0 - jnp.clip(cos, -1.0, 1.0)) * 0.5
        validf = valid_ref[lo:lo + sub, :][:, 0][None, :]
        out_ref[:, lo:lo + sub] = jnp.where(
            validf > 0, dist.astype(out_ref.dtype),
            jnp.asarray(jnp.inf, out_ref.dtype))


# ---------------------------------------------------------------------------
# Segment-interleaved fused matmul+min: the (Q, N) surface never exists.
#
# The XLA surface path (segment_min_scan_xla, the r2/r3 production default)
# materializes a bf16 (Q, N) transient between the matmul and the reshape-min
# — measured ~5.7 ms of the 25.8 ms headline batch (write+read of 2x2 GB at
# ~700 GB/s; BASELINE.md stage table).  Fusing the min into the matmul
# epilogue is a Pallas job, but the three natural formulations all sank in
# Mosaic on this toolchain (r2 notes): transposed-layout sublane roll-trees
# ran at ~5 GB/s, natural-layout lane reshapes + dynamic lane writes were
# rejected or VMEM-blew, and unrolled multi-subtile bodies compiled >30 min.
#
# This variant dodges all three with a LAYOUT trick: the matmul operand is
# row-PERMUTED (one-time, make_ilv_codes) so that within every 128*seg-row
# block, permuted row m*128 + s is member m of segment s.  The per-subtile
# distance slice (Q, sub) then holds each segment's members in the SAME lane
# of consecutive 128-lane tiles, and the per-segment min is a fold of
# jnp.minimum over whole-tile static slices into a (Q, 128) accumulator —
# no rolls, no lane reshapes, no dynamic writes, fori_loop body compiled
# once.  Output column order equals the ORIGINAL segment index, so
# selection, the provable-completeness flag, and the lane-slab rerank are
# unchanged.  Minima stay f32 end-to-end (no bf16 surface rounding —
# strictly less error than the XLA surface, so the flag bridge's half-ulp
# factors become pure slack).
# ---------------------------------------------------------------------------

_ILV_LANES = 128
# subtile = the grid-step dot's N extent.  Bigger subtiles feed the MXU
# longer dots: r8b/r8c measured the 1M x 384 x 1024q surface at
# 9.17 / 8.84 / 8.02 / 7.18 / 7.06 ms for 256 / 512 / 1024 / 2048 / 4096
# (the r3.7 choice of 256 was forced by a VMEM register spill in the OLD
# fori-loop formulation; the grid reduction has no loop carry).  The live
# (Q, sub) distance slice still rides VMEM, so _ilv_subtile scales the
# subtile down for big query blocks to keep it ~16 MB.
_ILV_SUBTILE = 4096


def _ilv_subtile(q: int, blk: int) -> int:
    """Largest power-of-two subtile <= _ILV_SUBTILE that divides blk and
    keeps the (Q, sub) f32 distance slice within ~16 MB (only Q=1024 is
    TPU-probed; 2048 extrapolates the same live-set budget)."""
    cap = max(256, 4 * 1024 * 1024 // max(q, 1))
    sub = 256
    while sub * 2 <= min(_ILV_SUBTILE, cap) and blk % (sub * 2) == 0:
        sub *= 2
    return min(sub, blk)
# the whole query block rides VMEM each step; larger batches fall back to
# the XLA surface (fused_scan_topk)
_ILV_MAX_Q = 2048


def ilv_supported(n: int, seg: int = DEFAULT_SEG) -> bool:
    """Single-device layout gate (capacity alignment); the mesh analog is
    parallel/search.ilv_ok_mesh.  CPU tests that fake supported() patch
    BOTH of these off (the real kernel is interpret-only off-TPU)."""
    return n % (_ILV_LANES * seg) == 0


def _ilv_perm(a, seg: int = DEFAULT_SEG):
    """Row permutation (N, ...) -> (N, ...): block b, member m of segment s
    (original row b*128*seg + s*seg + m) moves to permuted row
    b*128*seg + m*128 + s.  Works on numpy or jax arrays."""
    n = a.shape[0]
    blk = _ILV_LANES * seg
    return a.reshape((n // blk, _ILV_LANES, seg) + a.shape[1:]) \
            .swapaxes(1, 2).reshape(a.shape)


def make_ilv_codes(codes, seg: int = DEFAULT_SEG):
    """Segment-interleaved TRANSPOSED matmul operand (D|P, N) for
    segment_min_scan_ilv: the kernel's dot contracts (Q, D) x (D, sub) in
    the natural MXU form — a (N, D) operand would make Mosaic transpose
    every RHS subtile in-kernel (the first formulation ran 650 ms vs the
    XLA surface's 18, r7_ilv_probe).  A device-side relayout (one HBM
    pass), kept as derived device state like the lane slab."""
    return _ilv_perm(codes, seg).T


def _segmin_ilv_kernel(q_ref, codesT_ref, norms_ref, valid_ref, out_ref,
                       *, bits, metric, exact, steps_per_blk,
                       interpret=False):
    """Fused code-matmul + surrogate epilogue + segment-min over the
    interleaved layout (see the section comment above).

    Canonical Mosaic reduction grid: one subtile per grid step — a single
    natural-form dot, the epilogue, sub/128 whole-tile lane minimum folds,
    and a min-accumulate into the output block, which is revisited
    contiguously for the steps_per_blk steps spanning one 128-segment
    block.  No loop carry, no dynamic slicing, no in-kernel transposes."""
    queries = q_ref[:]                                       # (Q, D)
    if bits in (4, 8, 16):
        scale, offset = qz.affine_constants(bits)
        qsum = jnp.sum(queries, axis=-1)[:, None]            # (Q, 1)
    qn2 = jnp.sum(queries * queries, axis=-1)[:, None]       # (Q, 1)
    fast = bits in (4, 8) and not exact
    # interpret mode runs on the CPU backend, whose bf16 x bf16 -> f32
    # DotThunk is unimplemented at this dot's shape — emulate the MXU's
    # input rounding (cast through bf16) and contract in f32 instead
    cast = jnp.bfloat16 if fast and not interpret else jnp.float32
    rnd = (lambda x: x.astype(jnp.bfloat16).astype(jnp.float32)) \
        if fast and interpret else (lambda x: x)
    prec = jax.lax.Precision.HIGHEST if exact else None
    dn = (((1,), (0,)), ((), ()))                            # natural form
    codes = codesT_ref[:]                                    # (D|P, sub)
    if bits == 4:
        # queries arrive PRE-DEINTERLEAVED (even dims then odd dims — the
        # wrapper reorders them): a strided queries[:, 0::2] in-kernel
        # lowers to a gather Mosaic rejects ("Shape mismatch in input,
        # indices and output" — the r7d 4-bit failure); contiguous slices
        # lower fine, and every sum the epilogue uses is order-invariant
        w4 = codes.shape[0]
        qe = rnd(queries[:, :w4]).astype(cast)
        qo = rnd(queries[:, w4:]).astype(cast)
        ci = codes.astype(jnp.int32)  # widen BEFORE shifting: sub-word
        h = ((ci >> 4) - 8).astype(cast)      # shift ops crash the Mosaic
        low = ((ci & 0xF) - 8).astype(cast)   # compile helper (probed)
        raw = jax.lax.dot_general(
            qe, h, dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=prec)
        raw = raw + jax.lax.dot_general(
            qo, low[: qo.shape[1], :], dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=prec)
    elif bits == 16 and not exact:
        # int16 codes don't fit bf16's 8-bit mantissa; an EXACT hi/lo byte
        # split (c = 256*(c >> 8) + (c & 255) under arithmetic shift, both
        # halves bf16-exact) keeps the fast MXU path with only query
        # rounding — the error class the completeness flag's delta bounds
        fcast = jnp.bfloat16 if not interpret else jnp.float32
        qc = (queries.astype(jnp.bfloat16).astype(jnp.float32)
              if interpret else queries).astype(fcast)
        ci = codes.astype(jnp.int32)
        hi = (ci >> 8).astype(fcast)                         # [-128, 127]
        lo = (ci & 255).astype(fcast)                        # [0, 255]
        raw = 256.0 * jax.lax.dot_general(
            qc, hi, dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        raw = raw + jax.lax.dot_general(
            qc, lo, dimension_numbers=dn,
            preferred_element_type=jnp.float32)
    elif bits in (32, 64) and not exact:
        # f32 codes: bf16x2 CODE split (hi = bf16(c), lo = bf16(c - hi));
        # the residual |c - hi - lo| <= 2^-18 |c| lands under the
        # surface_accum_eps cushion, so only query rounding remains —
        # the flag's delta class.  Two bf16 passes vs the sound XLA-HIGH
        # fallback's three (plus its (Q, N) transient).
        fcast = jnp.bfloat16 if not interpret else jnp.float32
        qc = (queries.astype(jnp.bfloat16).astype(jnp.float32)
              if interpret else queries).astype(fcast)
        c32 = codes.astype(jnp.float32)
        chi32 = c32.astype(jnp.bfloat16).astype(jnp.float32)
        hi = chi32.astype(fcast)
        lo = (c32 - chi32).astype(jnp.bfloat16).astype(fcast)
        raw = jax.lax.dot_general(
            qc, hi, dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        raw = raw + jax.lax.dot_general(
            qc, lo, dimension_numbers=dn,
            preferred_element_type=jnp.float32)
    else:
        qc = rnd(queries).astype(cast)
        raw = jax.lax.dot_general(
            qc, codes.astype(cast), dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=prec)
    if bits in (4, 8, 16):
        dots = scale * raw + offset * qsum                   # (Q, sub)
    else:
        dots = raw
    norms = norms_ref[:]                                     # (1, sub)
    if metric == "euclidean":
        dist = jnp.maximum(qn2 - 2.0 * dots + norms, 0.0)
    else:
        denom2 = qn2 * norms
        inv = jax.lax.rsqrt(jnp.where(denom2 > 0.0, denom2, 1.0))
        cos = jnp.where(denom2 > 0.0, dots * inv, -1.0)
        dist = (1.0 - jnp.clip(cos, -1.0, 1.0)) * 0.5
    dist = jnp.where(valid_ref[:] > 0, dist, jnp.inf)
    # whole-tile lane slices: lane s of every slice is segment s
    m = dist[:, :_ILV_LANES]
    for j in range(1, dist.shape[1] // _ILV_LANES):
        m = jnp.minimum(m, dist[:, j * _ILV_LANES:(j + 1) * _ILV_LANES])
    t = pl.program_id(0)
    first = (t % steps_per_blk) == 0

    @pl.when(first)
    def _init():
        out_ref[:] = m

    @pl.when(jnp.logical_not(first))
    def _accum():
        out_ref[:] = jnp.minimum(out_ref[:], m)


@functools.partial(jax.jit, static_argnames=("bits", "metric", "seg",
                                             "exact", "interpret"))
def segment_min_scan_ilv(queries, codes_ilv, norms, valid, *, bits: int,
                         metric: str, seg: int = DEFAULT_SEG,
                         exact: bool = False, interpret: bool = False):
    """(Q, D) x interleaved-transposed codes (make_ilv_codes) ->
    (Q, N/seg) f32 segment minima in ORIGINAL segment order.  norms/valid
    arrive in original row order and are permuted in-graph ((N,)
    transposes, ~1 MB of traffic at 1M rows — so filter masks need no
    interleaved copy)."""
    w, n = codes_ilv.shape
    q, d = queries.shape
    blk = _ILV_LANES * seg
    assert n % blk == 0, (n, blk)
    sub = _ilv_subtile(q, blk)
    # a non-dividing subtile would floor steps_per_blk and silently write
    # minima into the wrong output blocks
    assert blk % sub == 0, (blk, sub)
    steps_per_blk = blk // sub
    norms_i = _ilv_perm(norms, seg)[None, :]
    valid_i = _ilv_perm(valid.astype(jnp.float32), seg)[None, :]
    queries = queries.astype(jnp.float32)
    if bits == 4:
        # deinterleave OUTSIDE the kernel (see the kernel's 4-bit note);
        # qsum/qn2 are order-invariant so the epilogue math is unchanged
        queries = jnp.concatenate([queries[:, 0::2], queries[:, 1::2]],
                                  axis=1)
    grid_spec = pl.GridSpec(
        grid=(n // sub,),
        in_specs=[
            pl.BlockSpec((q, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, sub), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        # each (q, 128) output block is revisited contiguously by the
        # steps_per_blk subtile steps of its 128-segment block
        out_specs=pl.BlockSpec(
            (q, _ILV_LANES),
            lambda t, _s=steps_per_blk: (0, t // _s),
            memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_segmin_ilv_kernel, bits=bits, metric=metric,
                          exact=exact, steps_per_blk=steps_per_blk,
                          interpret=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q, n // seg), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * d * n, transcendentals=0,
            bytes_accessed=n * w * codes_ilv.dtype.itemsize + 8 * n
            + 4 * q * (n // seg)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(queries.astype(jnp.float32), codes_ilv, norms_i, valid_i)


@functools.partial(jax.jit, static_argnames=("bits", "metric", "block_n",
                                             "exact", "interpret"))
def score_surface(queries, codes, norms, valid, *, bits: int, metric: str,
                  block_n: int = DEFAULT_BLOCK_N, exact: bool = False,
                  interpret: bool = False):
    """(Q, D) x (N, D|P) -> (Q, N) surrogate-distance surface.

    bf16 out (f32 in exact mode); invalid rows = +inf.  Queries must be
    pre-padded to a multiple of 8 rows."""
    n, w = codes.shape
    q, d = queries.shape
    assert n % block_n == 0, (n, block_n)
    # the kernel iterates whole _SUBTILE steps: a block_n > _SUBTILE that
    # is not a multiple of it would silently leave the trailing rows'
    # output columns as uninitialized VMEM (review finding r5)
    assert block_n <= _SUBTILE or block_n % _SUBTILE == 0, \
        (block_n, _SUBTILE)
    out_t = jnp.float32 if exact else jnp.bfloat16
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
        out_specs=pl.BlockSpec((q, block_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_surface_kernel, bits=bits, metric=metric,
                          exact=exact),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q, n), out_t),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * d * n, transcendentals=0,
            bytes_accessed=n * w * codes.dtype.itemsize + 4 * n
            + q * n * jnp.dtype(out_t).itemsize),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(queries.astype(jnp.float32), codes, norms[:, None],
      valid.astype(jnp.float32)[:, None])


@functools.partial(jax.jit, static_argnames=("bits", "metric", "seg",
                                             "exact"))
def segment_min_scan_xla(queries, codes, norms, valid, *, bits: int,
                         metric: str, seg: int = DEFAULT_SEG,
                         exact: bool = False):
    """XLA variant of the segment-min surface: one code matmul, surrogate
    epilogue, reshape + min over each SEG-row group.  XLA fuses the
    epilogue/min into the matmul consumer chain, so the (Q, N) surface is
    at worst one bf16-sized transient instead of the f32 (Q, N) + full
    lax.top_k pass the old pipeline paid.  Measured faster than the Pallas
    kernel on v5e (Mosaic's transposed-layout segmin ran at ~5 GB/s)."""
    from . import distance as dist_ops
    n = codes.shape[0]
    q = queries.shape[0]
    # non-exact 4/8-bit: ONE fast bf16 matmul pass (measured 12.3 ms vs
    # 25.5 for a bf16x2 query split at the 1M x 384 x 1024q headline — the
    # split was tried and rolled back).  Exactness is preserved anyway:
    # the tie threshold uses a PER-QUERY exactly-computed error bound
    # ||q - bf16(q)||/||q|| (fused_scan_topk), so bf16 query rounding
    # widens the escalation threshold instead of requiring accurate dots.
    # That argument needs the CODES side exact in bf16 — true for 4/8-bit
    # integer codes, FALSE for 16/32/64 (the default f32 dot on this chip
    # is a single bf16 pass on BOTH operands, measured rel err ~2^-9 —
    # unbounded by the flag's delta).  Wide codes therefore ride
    # Precision.HIGH (bf16_3x, input error ~2^-21, far under the
    # surface_accum_eps cushion) — same reasoning as the mesh path's
    # accurate local dots (parallel/search._local_dots).
    if exact:
        precision = jax.lax.Precision.HIGHEST
    elif bits in (16, 32, 64):
        precision = jax.lax.Precision.HIGH
    else:
        precision = None
    dots = dist_ops._code_matmul(queries, codes, bits, precision)  # (Q, N)
    if metric == "euclidean":
        qn2 = jnp.sum(queries * queries, axis=-1, keepdims=True)
        dist = jnp.maximum(qn2 - 2.0 * dots + norms[None, :], 0.0)
    else:
        qn2 = jnp.sum(queries * queries, axis=-1, keepdims=True)
        denom2 = qn2 * norms[None, :]
        inv = jax.lax.rsqrt(jnp.where(denom2 > 0.0, denom2, 1.0))
        cos = jnp.where(denom2 > 0.0, dots * inv, -1.0)
        dist = (1.0 - jnp.clip(cos, -1.0, 1.0)) * 0.5
    # Surface dtype: bf16 halves the materialized (Q, N) transient (25.7ms
    # vs 40.4ms at 1M x 384 x 1024q on v5e).  Rounding segment minima to 8
    # mantissa bits is SAFE because selection is tie-aware: fused_scan_topk
    # counts every segment under a provable threshold and escalates the
    # margin when bf16 collisions could hide a winner (exactness note
    # there).  exact=True keeps an f32 surface.
    surf_t = jnp.float32 if exact else jnp.bfloat16
    dist = jnp.where(valid[None, :], dist.astype(surf_t),
                     jnp.asarray(jnp.inf, surf_t))
    return jnp.min(dist.reshape(q, n // seg, seg), axis=-1).astype(
        jnp.float32)


# Cushion for the f32 accumulation error of the surface dots and of the
# rerank's "exact" surrogates; the dominant bf16 query-rounding term is
# computed EXACTLY per query in _select_and_rerank, so this only covers
# the residue.


def surface_accum_eps(dims: int) -> float:
    """Accumulation cushion scaled with the feature dimension (r3 review
    finding): the lane rerank (_lane_dots, plain f32 multiply-accumulate)
    supplies the exact surrogates the completeness flag bridges through,
    and its WORST-CASE error is ~D*2^-24 relative (4.6e-5 at D=768 — above
    the old fixed 3e-5 cushion).  The surface dot's f32 accumulate
    contributes the same class, hence the factor 2; the 2e-5 floor keeps
    small-D corpora at the old cushion."""
    return 2e-5 + 2.0 * dims * 2.0 ** -24
# bf16x2 code-split residual for 32/64-bit non-exact surfaces: hi=bf16(c)
# errs <= 2^-8|c| (8 significand bits), lo=bf16(c-hi) leaves <= 2^-16|c|.
# Bounded EXPLICITLY rather than leaning on the accumulation cushion
# (which must also absorb ~D*2^-24 of f32 summation) — r3 review finding.
_CODE_SPLIT_REL = 2.0 ** -16


def will_use_ilv(has_ilv: bool, n_queries: int, exact: bool,
                 interpret: bool = False) -> bool:
    """THE ilv-surface predicate — fused_scan_topk, Collection's margin
    choice, and sharded_exact_topk must all agree on when the kernel runs
    (a margin picked for the f32 surface fails structurally on the bf16
    fallback, escalating every dispatch and poisoning the margin hint).
    Conditions: operand present; batch fits the kernel's whole-Q VMEM
    block; exact mode stays on the XLA surface (its HIGHEST-precision
    Mosaic lowering is unprobed) except under interpret, where tests
    exercise the exact kernel path directly."""
    return has_ilv and n_queries <= _ILV_MAX_Q \
        and not (exact and not interpret)


def surface_delta(dq_rel, qn2, norms, valid, *, bits: int, metric: str,
                  dims: int, eps: float, dc_rel: float = 0.0):
    """Provable per-query surface-error bound (surrogate units), shared by
    the single-chip (_select_and_rerank) and mesh (_local_segmin_topk)
    completeness flags so the two bounds can never silently diverge.

    Error sources: dq_rel = EXACTLY-computed relative query rounding
    (||q - bf16(q)||/||q||, or 0 for accurate/exact dots); dc_rel = code
    representation residual (0 for 4/8-bit integer codes and the 16-bit
    hi/lo split, both bf16-exact; _CODE_SPLIT_REL for the 32/64-bit
    bf16x2 split); the affine offset reach (the surface computes
    scale*dot(q_hat, c') + offset*sum(q) with qsum unrounded, so query
    rounding couples to v - offset*1: |err| <= dq (||v|| +
    |offset|*sqrt(d))); eps = f32 accumulation cushion."""
    off = abs(qz.affine_constants(bits)[1]) if bits in (4, 8, 16) else 0.0
    offd = off * float(dims) ** 0.5
    rel = dq_rel + dc_rel
    if metric == "euclidean":
        # surrogate = squared distance;
        # |2 dot(q - q_hat, v - off*1)| <= 2 dq (|v| + offd), plus the
        # code term |2 dot(q, dc)| <= 2 dc_rel |q||v| folded into rel
        vmax = jnp.max(jnp.where(valid, norms, 0.0))
        return 2.0 * rel * jnp.sqrt(qn2) * (jnp.sqrt(vmax) + offd) + \
            eps * (qn2 + vmax)
    # angular surrogate in [0, 1];
    # |cos err| <= (dq + dc)(||v|| + offd) / (||q|| ||v||) — the offset
    # term is divided by the smallest positive row norm (zero-norm rows
    # are pinned to the exact zero-vector distance on both surfaces)
    live = valid & (norms > 0.0)
    vmin = jnp.min(jnp.where(live, norms, jnp.inf))
    return 0.5 * rel * (1.0 + offd * jax.lax.rsqrt(
        jnp.maximum(vmin, 1e-30))) + eps


@functools.partial(jax.jit, static_argnames=("bits", "metric", "k", "seg",
                                             "exact", "tie_margin",
                                             "with_ties", "surf_f32"))
def _select_and_rerank(queries, segmins, codes, norms, valid, slab=None, *,
                       bits: int, metric: str, k: int, seg: int, exact: bool,
                       tie_margin: int, with_ties: bool,
                       surf_f32: bool = False):
    """Stage 2 of fused_scan_topk: top segments -> slab gather -> HIGHEST
    rerank -> top-k (+ the provable-completeness flag).

    With `slab` (the tile-aligned view from make_lane_slab) the gather
    runs at full tile bandwidth and the rerank contracts in place
    (_lane_dots); otherwise the (Q, C, D) gather + HIGHEST einsum path.

    The selection top_k runs INDICES-ONLY: touching its values output in
    any way — slice, matmul, even raw program output — makes the TPU
    lowering abandon its fast form (+30 ms at the headline shape,
    measured across six formulations).  The flag therefore derives
    everything from the RERANK's exact distances, which flow through the
    index-gather path: the (S+1)-th-by-surface segment is gathered along
    with the rest, exact per-segment surrogate minima come from a
    reshape-min over the candidate distances, and conservative +/- delta
    bounds bridge between exact and surface values (see the EXACTNESS
    note on fused_scan_topk for why the resulting test is sound)."""
    n = norms.shape[0]
    nseg = n // seg
    s = min(k + tie_margin, nseg)
    full = s >= nseg  # every segment gathered: complete by construction
    sv = s if (full or not with_ties) else s + 1
    _, seg_idx = jax.lax.top_k(-segmins, sv)                  # (Qp, SV)

    rows = (seg_idx[:, :, None] * seg +
            jnp.arange(seg, dtype=jnp.int32)[None, None, :]
            ).reshape(seg_idx.shape[0], sv * seg)
    if slab is not None:
        nq_ = queries.shape[0]
        raw = _lane_dots(queries, slab, seg_idx, seg)         # (Qp, SV*seg)
        dots = _affine_dots(queries, raw, bits)
        cnorms = jnp.take(norms.reshape(nseg, seg), seg_idx,
                          axis=0).reshape(nq_, sv * seg)
        cvalid = jnp.take(valid.reshape(nseg, seg), seg_idx,
                          axis=0).reshape(nq_, sv * seg)
        dist, surr = _dots_to_dist_surr(queries, dots, cnorms, cvalid,
                                        metric)
    else:
        ccodes = gather_segments(codes, seg_idx, seg)         # (Qp, SV*seg, D)
        cnorms = gather_segments(norms, seg_idx, seg)         # (Qp, SV*seg)
        cvalid = gather_segments(valid, seg_idx, seg)
        dist, surr = _candidate_distances(queries, ccodes, cnorms, cvalid,
                                          bits, metric, exact,
                                          with_surrogate=True)
    kk = min(k, dist.shape[1])
    neg, pos = jax.lax.top_k(-dist, kk)
    out_rows = jnp.take_along_axis(rows, pos, axis=1)
    if not with_ties:
        return -neg, out_rows
    if full:
        ok = jnp.ones((queries.shape[0],), jnp.int32)
        return -neg, out_rows, ok

    nq = queries.shape[0]
    # exact surrogate minima of every gathered segment (invalid rows inf)
    segsurr = jnp.min(surr.reshape(nq, sv, seg), axis=-1)     # (Qp, SV)
    # k-th smallest exact min among the top-S selected (small top_k —
    # values of SMALL top_k calls are fine, only the big fused one is not)
    negk, _ = jax.lax.top_k(-segsurr[:, :s], min(k, s))
    kth_exact = -negk[:, -1]
    m_next = segsurr[:, s]  # exact min of the (S+1)-th-by-surface segment

    qn2 = jnp.sum(queries * queries, axis=-1)                 # (Qp,)
    if exact:
        # exact surfaces run f32-HIGHEST dots: only accumulation residue
        dq_rel = jnp.zeros_like(qn2)
    else:
        qhat = queries.astype(jnp.bfloat16).astype(jnp.float32)
        dq = jnp.sqrt(jnp.sum((queries - qhat) ** 2, axis=-1))
        dq_rel = jnp.where(qn2 > 0.0, dq * jax.lax.rsqrt(
            jnp.maximum(qn2, 1e-30)), 1.0)
    # full error bound (offset reach was missing pre-r3.7 — masked on the
    # bf16 surface by the half-ulp slack, exposed by the tightened f32
    # bridge; the 32/64-bit code-split residual likewise, both round-3
    # review findings): see surface_delta
    dc = _CODE_SPLIT_REL if bits in (32, 64) and not exact else 0.0
    delta = surface_delta(dq_rel, qn2, norms, valid, bits=bits,
                          metric=metric, dims=queries.shape[1],
                          eps=surface_accum_eps(queries.shape[1]), dc_rel=dc)
    # bridge exact -> surface values DIRECTLY through kth_exact (r3.5
    # tightening: the old chain went winner -> surface k-th -> kth_exact
    # and paid 3*delta; this one pays 1*delta, halving the provable tie
    # window and with it the margin the flag needs on real corpora).
    # The k selected segments' argmins are k distinct rows with exact
    # surrogate <= kth_exact, so the global k-th best row is too; a true
    # top-k row w then has surr(w) <= kth_exact, its segment's surface
    # min <= surr(w) + delta, and the bf16-stored value is at most
    # T = (kth_exact + delta)(1 + 2^-8).  The (S+1)-th stored value
    # v_next >= (m_next - delta)(1 - 2^-8).  v_lo > t_up therefore
    # implies v_next > T, i.e. every segment that could hold a winner was
    # selected (EXACTNESS note).  2^-8 is the exact bf16 round-to-nearest
    # half-ulp bound (8 significand bits); the 1.1 on delta absorbs f32
    # arithmetic residue in computing the bounds themselves.  surf_f32
    # surfaces (the ilv fused kernel, and exact mode) store minima in f32
    # — no bf16 rounding ever happens, so the half-ulp factors drop and
    # the provable tie window shrinks by ~2*kth/256 (comparable to delta
    # itself on unit-norm corpora).
    ulp = 0.0 if surf_f32 else 1.0 / 256.0
    t_up = (kth_exact + 1.1 * delta) * (1.0 + ulp)
    v_lo = (m_next - delta) * (1.0 - ulp)
    ok = (v_lo > t_up).astype(jnp.int32)
    if metric != "euclidean":
        # a zero cosine query scores EVERY row at exactly the zero-vector
        # distance (1.0, reference semantics): any k rows are the true
        # top-k, so selection is trivially complete — without this gate
        # its degenerate error bound (dq_rel := 1) fails the flag and
        # escalates the dispatch to a pointless full gather.  Euclidean
        # zero queries rank rows by ||v|| — a genuine ranking whose flag
        # must be evaluated normally.
        ok = jnp.where(qn2 > 0.0, ok, jnp.int32(1))
    return -neg, out_rows, ok


@functools.partial(jax.jit, static_argnames=("bits", "metric", "k", "block_n",
                                             "seg", "exact", "interpret",
                                             "surface", "tie_margin",
                                             "with_ties"))
def fused_scan_topk(queries, codes, norms, valid, slab=None, codes_ilv=None,
                    *, bits: int,
                    metric: str, k: int, block_n: int = DEFAULT_BLOCK_N,
                    seg: int = DEFAULT_SEG, exact: bool = False,
                    interpret: bool = False, surface: str = "xla",
                    tie_margin=None, with_ties: bool = False):
    """Exhaustive fused scan -> (dist (Q, k) ascending, rows (Q, k)).

    N must be a multiple of block_n (the column store pads capacity;
    padding rows carry valid=False).  (k, Q) must satisfy fused_k_ok —
    the serving bound, or small-batch large-k within the gather budget
    (the radius-escalation shape).  `surface` must be "xla" (the fused
    epilogue; the r2 "pallas"/"kernel" producers were superseded by the
    ilv kernel and archived to tools_dev/superseded_kernels.py);
    `codes_ilv` (optional, from make_ilv_codes at the same seg) overrides
    it with the fused matmul+min kernel that never materializes the
    (Q, N) surface.  `slab` (optional, from make_lane_slab
    at the same seg) routes the rerank through the tile-aligned lane path
    — ~2.7x faster candidate gathers on TPU, identical results.

    EXACTNESS (with_ties=True): a third output flags, per query, whether
    the result is PROVABLY the true f32 top-k (1) or the selection margin
    must be escalated (0, rare adversarial data).  Proof sketch (all in
    surrogate space; delta = per-query surface error bound, computed
    EXACTLY from ||q - bf16(q)|| — see _select_and_rerank): let
    kth_exact be the k-th smallest EXACT segment minimum among the S
    selected segments (from the HIGHEST rerank).  The k segments
    achieving those minima contain k distinct rows with exact surrogate
    <= kth_exact, so the global k-th best row value is <= kth_exact.
    Any true top-k row w therefore has surr(w) <= kth_exact; w's
    segment's SURFACE min is <= surr(w) + delta, and its bf16-stored
    value is <= T = (kth_exact + delta)(1 + 2^-8) (half-ulp rounding).
    Selection took the S smallest stored values, so if the (S+1)-th
    stored value exceeds T — certified via its exact min m_next as
    (m_next - delta)(1 - 2^-8) > T — every segment that could hold a
    winner was gathered and the HIGHEST-precision rerank returns the
    exact f32 top-k.  Callers escalate tie_margin geometrically when a
    flag is 0 (Collection._exact_topk_device).

    The flag derives entirely from the rerank's exact distances (the
    selection top_k stays indices-only — ANY use of its values output,
    even raw pass-through, poisons the TPU lowering for +30 ms; CLAUDE.md
    performance facts).
    """
    q0, d = queries.shape  # d = true dims (codes may be nibble-packed)
    assert fused_k_ok(k, q0), (k, q0)
    if slab is not None:
        assert slab.shape == (norms.shape[0] // seg, (seg * d) // _LANE,
                              _LANE), (slab.shape, seg, d)
    queries = queries.astype(jnp.float32)
    qpad = (-q0) % 8
    if qpad:
        queries = jnp.concatenate(
            [queries, jnp.zeros((qpad, d), jnp.float32)])

    # exact surfaces want a HIGHEST-precision dot, whose Mosaic lowering is
    # unprobed on this toolchain — exact mode stays on the XLA surface
    # (interpret-mode tests exercise the exact kernel path directly);
    # Every width has a sound, TPU-probed in-kernel dot: bf16 (4/8-bit
    # integer codes are bf16-exact; the 4-bit nibble unpack widens to
    # int32 before shifting — sub-word shifts crash the Mosaic compile
    # helper), exact hi/lo split (16), bf16x2 code split (32/64)
    use_ilv = will_use_ilv(codes_ilv is not None, queries.shape[0],
                           exact, interpret)
    if surface not in ("xla",):
        # the transposed roll-tree ("pallas") and natural-layout ("kernel")
        # surfaces were superseded by the ilv kernel in r3.7 and archived
        # to tools_dev/superseded_kernels.py in r4 (VERDICT item 8)
        raise ValueError(f"unknown surface {surface!r}")
    if use_ilv:
        segmins = segment_min_scan_ilv(queries, codes_ilv, norms, valid,
                                       bits=bits, metric=metric, seg=seg,
                                       exact=exact, interpret=interpret)
    else:
        segmins = segment_min_scan_xla(queries, codes, norms, valid,
                                       bits=bits, metric=metric, seg=seg,
                                       exact=exact)
    # every surface that can produce bf16-rounded minima is the non-exact
    # XLA/pallas one; the ilv kernel and exact surfaces store f32
    surf_f32 = exact or use_ilv
    if tie_margin is None:
        tie_margin = default_tie_margin(surf_f32)
    out = _select_and_rerank(queries, segmins, codes, norms, valid, slab,
                             bits=bits, metric=metric, k=k, seg=seg,
                             exact=exact, tie_margin=tie_margin,
                             with_ties=with_ties, surf_f32=surf_f32)
    return tuple(o[:q0] for o in out)


def supported() -> bool:
    return jax.default_backend() in ("tpu", "axon") or \
        any(d.platform in ("tpu", "axon") for d in jax.devices())
