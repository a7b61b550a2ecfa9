"""Sharded search kernels: shard_map over the device mesh.

Pattern (SURVEY.md §2.2): vectors are sharded along N over the 'data' mesh
axis and optionally along D over 'feature'.  Each device computes distances
for its rows (feature-partial dots are psum'd over 'feature' — the
tensor-parallel analog), keeps a local top-k, and the tiny (ndev * k)
per-device winners are concatenated and merged by a final top-k — the
vector-DB equivalent of a reduce-scatter'd ensemble.  All collectives ride
ICI; nothing touches the host until the final k rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import quantize as qz
from .mesh import DATA_AXIS, FEATURE_AXIS


def _local_dots(queries, codes, bits, precision, accurate: bool = False):
    """Feature-partial dot(q, dequant(v)) with psum over the feature axis.

    queries: (Q, D_local) f32; codes: (N_local, D_local) — or, for 4-bit,
    (N_local, D_local/2) packed nibbles (each feature shard must hold an
    even, nibble-aligned dimension slice; sharded_* validates).
    Returns (Q, N_local) f32 full-D dots.

    accurate=True rides ops.distance.code_dots_accurate semantics (bf16x2
    query split / HIGHEST) so the segmin surface carries the ~1e-5 error
    bound the provable selection threshold assumes; the scale/offset
    epilogue is applied here after the feature psum either way.
    """
    from ..ops import distance as dist_ops
    dn = (((1,), (1,)), ((), ()))
    if accurate and precision is None:
        precision = jax.lax.Precision.HIGHEST
        use_bf16x2 = bits in (4, 8) and \
            dist_ops.fast_dot_dtype() == jnp.bfloat16
    else:
        use_bf16x2 = False
    if precision is None and bits > 8:
        # wide codes must never ride the default matmul — on TPU it is ONE
        # bf16 pass on BOTH operands (~2^-9 rel err on the CODES, unbounded
        # by any flag delta).  Mirrors segment_min_scan_xla's choice
        # (ops/pallas_scan.py); CLAUDE.md invariant, review finding r5.
        precision = jax.lax.Precision.HIGH
    if bits in (32, 64):
        raw = jax.lax.dot_general(
            queries, codes.astype(jnp.float32), dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=precision)
        return jax.lax.psum(raw, FEATURE_AXIS)
    scale, offset = qz.affine_constants(bits)
    if bits == 4:
        qe, qo = dist_ops.deinterleave_queries(queries)
        h, low = dist_ops.split_nibbles(codes)
        low = low[:, : qo.shape[1]]
        if use_bf16x2:
            raw = jnp.zeros((queries.shape[0], codes.shape[0]), jnp.float32)
            for qpart, cpart in ((qe, h), (qo, low)):
                for qhalf in dist_ops.split_bf16x2(qpart):
                    raw = raw + jax.lax.dot_general(
                        qhalf, cpart.astype(jnp.bfloat16),
                        dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
        else:
            cast = dist_ops.fast_dot_dtype() if precision is None \
                else jnp.float32
            raw = jax.lax.dot_general(
                qe.astype(cast), h.astype(cast), dimension_numbers=dn,
                preferred_element_type=jnp.float32, precision=precision)
            raw = raw + jax.lax.dot_general(
                qo.astype(cast), low.astype(cast), dimension_numbers=dn,
                preferred_element_type=jnp.float32, precision=precision)
    else:
        if use_bf16x2 and bits == 8:
            chalf = codes.astype(jnp.bfloat16)
            raw = jnp.zeros((queries.shape[0], codes.shape[0]), jnp.float32)
            for qhalf in dist_ops.split_bf16x2(queries):
                raw = raw + jax.lax.dot_general(
                    qhalf, chalf, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
        elif precision is None and bits == 8:
            cast = dist_ops.fast_dot_dtype()
            raw = jax.lax.dot_general(
                queries.astype(cast), codes.astype(cast),
                dimension_numbers=dn,
                preferred_element_type=jnp.float32, precision=precision)
        else:
            raw = jax.lax.dot_general(
                queries, codes.astype(jnp.float32), dimension_numbers=dn,
                preferred_element_type=jnp.float32, precision=precision)
    raw = jax.lax.psum(raw, FEATURE_AXIS)
    qsum = jax.lax.psum(jnp.sum(queries, axis=-1, keepdims=True), FEATURE_AXIS)
    return scale * raw + offset * qsum


def _local_distances(queries, codes, norms, valid, bits, metric, exact):
    precision = jax.lax.Precision.HIGHEST if exact else None
    dots = _local_dots(queries, codes, bits, precision)
    qn2 = jax.lax.psum(jnp.sum(queries * queries, axis=-1, keepdims=True),
                       FEATURE_AXIS)
    if metric == "euclidean":
        dist = jnp.sqrt(jnp.maximum(qn2 - 2.0 * dots + norms[None, :], 0.0))
    else:
        qn = jnp.sqrt(qn2)
        vn = jnp.sqrt(norms)[None, :]
        denom = qn * vn
        cos = jnp.where(denom > 0.0, dots / jnp.where(denom > 0.0, denom, 1.0),
                        1.0)
        dist = jnp.arccos(jnp.clip(cos, -1.0, 1.0)) / jnp.pi
        dist = jnp.where((qn == 0.0) | (vn == 0.0), 1.0, dist)
    return jnp.where(valid[None, :], dist, jnp.inf)


def _check_packed4(mesh, queries, bits):
    """Packed 4-bit codes shard on the feature axis only when every shard
    holds an even (nibble-aligned) slice of the dimension axis."""
    if bits != 4:
        return
    f = mesh.shape[FEATURE_AXIS]
    if f > 1 and (queries.shape[1] % (2 * f)) != 0:
        raise ValueError(
            f"4-bit feature sharding needs dim % (2*feature) == 0 "
            f"(dim={queries.shape[1]}, feature={f})")


def _merge_topk(vals, gidx, k):
    """(Q, ndev*k) concatenated per-device winners -> global top-k."""
    neg, pos = jax.lax.top_k(-vals, k)
    return -neg, jnp.take_along_axis(gidx, pos, axis=1)


_SEG = 32          # segment width for the fused local scan
DEFAULT_SEG_MARGIN = 8    # extra segments kept for value ties
_SEG_MARGIN = DEFAULT_SEG_MARGIN  # back-compat alias


def default_mesh_seg_margin(has_ilv: bool, n_queries: int,
                            exact: bool) -> int:
    """Starting tie margin for the mesh path.

    BOTH mesh surfaces (per-shard ilv kernel and the accurate-dots XLA
    scan) store f32 minima, so one f32-class margin covers them — unlike
    the single chip, where the surface choice changes the margin (CLAUDE.md
    r3.7).  Deliberately conservative at 8 (the single-chip f32 default
    was cut to 6 in r4 after a 4096/4096 hardware sweep) because the mesh
    path has never run on real multi-chip hardware; when it does, a
    measured per-surface split belongs here — the has_ilv/n_queries/exact
    arguments are kept so callers already thread the inputs that split
    will need (they are intentionally unused today)."""
    return DEFAULT_SEG_MARGIN
def _local_segmin_topk(q, c, nrm, v, bits, metric, exact, k, seg_margin,
                       slab_l=None, ilv_l=None, kernel_interpret=False,
                       surf_eps=None):
    """Per-device segment-min scan: surrogate surface -> top segments ->
    contiguous gather -> HIGHEST-precision recompute -> local top-k.

    The same traffic cut that makes single-chip precision='high' ~3x the
    plain pipeline (ops/pallas_scan.py design notes), inside shard_map:
    the (Q, N_local) surface reduces to (Q, N_local/SEG) minima before any
    full-width top_k, and only the winning SEG-row slabs are gathered.
    With `slab_l` (this shard's tile-aligned lane view, sharded_lane_slab)
    the gather + rerank ride the r3.6 lane path — whole-tile DMAs plus an
    in-place contraction whose feature-partial raw dots are psum'd like
    the einsum path's.  Returns (vals, local_rows, ok): the
    provable-selection contract of fused_scan_topk applies per shard —
    ok[i]=1 proves the local top-k is exact (the (S+1)-th smallest local
    segmin exceeds the provable threshold), and the caller escalates
    seg_margin otherwise."""
    n_local = c.shape[0]
    nq = q.shape[0]
    nseg = n_local // _SEG
    qn2 = jax.lax.psum(jnp.sum(q * q, axis=-1, keepdims=True), FEATURE_AXIS)
    if ilv_l is not None:
        # r3.7 fused matmul+min kernel: the (Q, N_local) surface never
        # materializes.  Requires the full feature dim on this shard
        # (ilv_ok_mesh); its bf16-dot surface error is bounded per query
        # below (dq_rel), like the single-chip path's.  The caller gates
        # the operand on pallas_scan.will_use_ilv, so exact mode reaches
        # here only under interpret — and then it must actually RUN the
        # exact kernel (review finding r5: the old `and not exact` gate
        # silently rode the XLA surface, false parity coverage)
        from ..ops import pallas_scan
        qpad = (-nq) % 8
        qk = jnp.concatenate([q, jnp.zeros((qpad, q.shape[1]), q.dtype)]) \
            if qpad else q
        segmins = pallas_scan.segment_min_scan_ilv(
            qk, ilv_l, nrm, v.astype(jnp.float32), bits=bits, metric=metric,
            seg=_SEG, exact=exact, interpret=kernel_interpret)[:nq]
        # the exact kernel's minima are f32-exact (in-kernel hi/lo or
        # bf16x2 splits): no query-rounding / code-split delta terms
        ilv_surface = not exact
    else:
        precision = jax.lax.Precision.HIGHEST if exact else None
        dots = _local_dots(q, c, bits, precision, accurate=True)
        if metric == "euclidean":
            surr = jnp.maximum(qn2 - 2.0 * dots + nrm[None, :], 0.0)
        else:
            denom2 = qn2 * nrm[None, :]
            inv = jax.lax.rsqrt(jnp.where(denom2 > 0.0, denom2, 1.0))
            cos = jnp.where(denom2 > 0.0, dots * inv, -1.0)
            surr = (1.0 - jnp.clip(cos, -1.0, 1.0)) * 0.5
        surr = jnp.where(v[None, :], surr, jnp.inf)
        segmins = jnp.min(surr.reshape(nq, nseg, _SEG), axis=-1)
        ilv_surface = False
    s = min(k + seg_margin, nseg)
    full = s >= nseg
    # +1 segment so the flag can bound the best UNSELECTED segment from
    # its exact rerank minima; the selection top_k stays indices-only and
    # segmins has exactly one consumer (the TPU lowering hazards from
    # ops/pallas_scan._select_and_rerank apply here too)
    sv = s if full else s + 1
    _, seg_idx = jax.lax.top_k(-segmins, sv)             # (Q, SV)

    def gather_seg(arr):
        flat = arr.reshape(nseg, -1)
        g = jnp.take(flat, seg_idx, axis=0)              # (Q, SV, _SEG*tail)
        return g.reshape((nq, sv * _SEG) + arr.shape[1:])

    rows = (seg_idx[:, :, None] * _SEG +
            jnp.arange(_SEG, dtype=jnp.int32)[None, None, :]
            ).reshape(nq, sv * _SEG)
    # HIGHEST-precision recompute of the gathered candidates (feature
    # partials psum'd) — the final distances are true f32, independent of
    # the surface's fast-dot construction
    if slab_l is not None:
        from ..ops import pallas_scan
        raw_part = pallas_scan._lane_dots(q, slab_l, seg_idx, _SEG)
        cnorms = jnp.take(nrm.reshape(nseg, _SEG), seg_idx,
                          axis=0).reshape(nq, sv * _SEG)
        cvalid = jnp.take(v.reshape(nseg, _SEG), seg_idx,
                          axis=0).reshape(nq, sv * _SEG)
        cdist, csurr = _candidate_distances_sharded(
            q, None, cnorms, cvalid, bits, metric, qn2,
            raw_partial=raw_part)
    else:
        ccodes = gather_seg(c)                           # (Q, C, D_l|P_l)
        cnorms = gather_seg(nrm)
        cvalid = gather_seg(v)
        cdist, csurr = _candidate_distances_sharded(q, ccodes, cnorms,
                                                    cvalid, bits, metric,
                                                    qn2)
    kk = min(k, cdist.shape[1])
    neg, pos = jax.lax.top_k(-cdist, kk)

    if full:
        ok = jnp.ones((nq,), jnp.int32)
        return -neg, jnp.take_along_axis(rows, pos, axis=1), ok
    # provable-completeness flag from the exact rerank surrogates
    # (ops/pallas_scan._select_and_rerank explains the construction); the
    # local surface here stays f32 (accurate dots, no bf16 storage), so
    # the slack terms are pure cushion
    segsurr = jnp.min(csurr.reshape(nq, sv, _SEG), axis=-1)
    negk, _ = jax.lax.top_k(-segsurr[:, :s], min(k, s))
    kth_exact = -negk[:, -1]
    m_next = segsurr[:, s]
    if ilv_surface:
        # the kernel's bf16 dots round the QUERY (codes are bf16-exact for
        # 8-bit; 16-bit splits exactly into hi/lo bytes): per-query bound,
        # same construction as ops/pallas_scan._select_and_rerank
        qhat = q.astype(jnp.bfloat16).astype(jnp.float32)
        dq = jnp.sqrt(jax.lax.psum(jnp.sum((q - qhat) ** 2, axis=-1),
                                   FEATURE_AXIS))
        dq_rel = jnp.where(qn2[:, 0] > 0.0, dq * jax.lax.rsqrt(
            jnp.maximum(qn2[:, 0], 1e-30)), 1.0)
    else:
        dq_rel = jnp.zeros((nq,), jnp.float32)  # accurate dots: eps only
    # SHARED bound with the single-chip flag (ops/pallas_scan
    # .surface_delta — query rounding, affine offset reach, code-split
    # residual, accumulation cushion); dims is the FULL dimension because
    # the ilv surface requires feature=1 and dq_rel is 0 otherwise
    from ..ops import pallas_scan as _ps
    dc = _ps._CODE_SPLIT_REL if (ilv_surface and bits in (32, 64)) else 0.0
    # eps must scale with the FULL dimension (accumulation + psum run
    # over all feature shards): the old fixed 1e-4 undercut
    # surface_accum_eps(dims) past 671 dims — an unsound flag cushion at
    # the 768-d config (review finding r5).  The caller passes it
    # statically; the q.shape[1] fallback is exact when feature == 1.
    eps = surf_eps if surf_eps is not None \
        else _ps.surface_accum_eps(q.shape[1])
    delta = _ps.surface_delta(dq_rel, qn2[:, 0], nrm, v, bits=bits,
                              metric=metric, dims=q.shape[1],
                              eps=eps, dc_rel=dc)
    # NO half-ulp factors (r4/ADVICE r3): BOTH mesh surfaces store f32
    # minima end-to-end — the accurate-dots XLA surface and the ilv kernel
    # — so bf16 storage rounding never happens here.  On unit-norm corpora
    # the dropped 2*kth/256 term was ~4x delta itself: the provable tie
    # window shrinks accordingly (mirrors the single-chip surf_f32 bridge).
    t_up = kth_exact + 1.1 * delta
    v_lo = m_next - delta
    ok = (v_lo > t_up).astype(jnp.int32)
    if metric != "euclidean":
        # zero cosine query: every row scores exactly 1.0, any selection
        # is complete (ops/pallas_scan._select_and_rerank) — without the
        # gate the zero-width value window fails the flag spuriously
        ok = jnp.where(qn2[:, 0] > 0.0, ok, jnp.int32(1))
    return -neg, jnp.take_along_axis(rows, pos, axis=1), ok


def _candidate_distances_sharded(q, ccodes, cnorms, cvalid, bits, metric,
                                 qn2, raw_partial=None):
    """HIGHEST-precision distances for gathered candidates under feature
    sharding: per-shard partial dots psum'd over FEATURE_AXIS.  Returns
    (dist, surrogate) — the surrogate feeds the completeness flag.

    raw_partial supplies this shard's raw contraction directly (the lane
    rerank path, pallas_scan._lane_dots) instead of the gathered-codes
    einsum; ccodes is unused then."""
    from ..ops import distance as dist_ops
    precision = jax.lax.Precision.HIGHEST
    if raw_partial is not None:
        raw = raw_partial
    elif bits == 4:
        qe, qo = dist_ops.deinterleave_queries(q)
        h, low = dist_ops.split_nibbles(ccodes)
        raw = jnp.einsum("qd,qcd->qc", qe, h.astype(jnp.float32),
                         preferred_element_type=jnp.float32,
                         precision=precision)
        raw = raw + jnp.einsum(
            "qd,qcd->qc", qo, low[..., : qo.shape[1]].astype(jnp.float32),
            preferred_element_type=jnp.float32, precision=precision)
    else:
        raw = jnp.einsum("qd,qcd->qc", q, ccodes.astype(jnp.float32),
                         preferred_element_type=jnp.float32,
                         precision=precision)
    raw = jax.lax.psum(raw, FEATURE_AXIS)
    if bits in (32, 64):
        dots = raw
    else:
        scale, offset = qz.affine_constants(bits)
        qsum = jax.lax.psum(jnp.sum(q, axis=-1, keepdims=True), FEATURE_AXIS)
        dots = scale * raw + offset * qsum
    if metric == "euclidean":
        surr = jnp.maximum(qn2 - 2.0 * dots + cnorms, 0.0)
        dist = jnp.sqrt(surr)
    else:
        qn = jnp.sqrt(qn2)
        vn = jnp.sqrt(cnorms)
        denom = qn * vn
        cos = jnp.where(denom > 0.0,
                        dots / jnp.where(denom > 0.0, denom, 1.0), 1.0)
        cos = jnp.clip(cos, -1.0, 1.0)
        dist = jnp.arccos(cos) / jnp.pi
        zero = (qn == 0.0) | (vn == 0.0)
        dist = jnp.where(zero, 1.0, dist)
        surr = jnp.where(zero, 1.0, (1.0 - cos) * 0.5)
    return (jnp.where(cvalid, dist, jnp.inf),
            jnp.where(cvalid, surr, jnp.inf))


@functools.partial(jax.jit, static_argnames=("mesh",))
def sharded_lane_slab(mesh: Mesh, codes):
    """Tile-aligned lane slab of the sharded codes for the mesh scan's
    rerank gathers (pallas_scan.make_lane_slab at _SEG, per data x feature
    shard).  Globally an opaque (nseg, _SEG*D/128, 128) tensor whose
    middle dim is FEATURE-blocked per segment — produced and consumed only
    inside shard_map programs with matching specs.  Caller must check
    lane_ok_mesh first."""
    from ..ops import pallas_scan

    def local(c):
        return pallas_scan.make_lane_slab(c, seg=_SEG)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=P(DATA_AXIS, FEATURE_AXIS),
        out_specs=P(DATA_AXIS, FEATURE_AXIS, None),
        check_vma=False,
    )(codes)


def lane_ok_mesh(mesh: Mesh, bits: int, dims: int, capacity: int) -> bool:
    """Whether the sharded fused scan can ride the lane rerank: whole
    128-element lanes per row on EVERY feature shard, unpacked codes, and
    _SEG-aligned data shards (the fused-path condition)."""
    from ..ops import pallas_scan
    f = mesh.shape[FEATURE_AXIS]
    return (pallas_scan.lane_slab_supported(bits, dims)
            and (dims // f) % pallas_scan._LANE == 0
            and capacity % (mesh.shape[DATA_AXIS] * _SEG) == 0)


def sharded_ilv_codes(mesh: Mesh, codes):
    """Per-data-shard segment-interleaved transposed matmul operand for the
    mesh fused scan's ilv surface (pallas_scan.make_ilv_codes at _SEG).
    Globally a (D, N) tensor whose columns are locally permuted per shard —
    produced and consumed only inside shard_map programs with matching
    specs.  Caller must check ilv_ok_mesh first."""
    from ..ops import pallas_scan

    def local(c):
        return pallas_scan.make_ilv_codes(c, seg=_SEG)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=P(DATA_AXIS, FEATURE_AXIS),
        out_specs=P(FEATURE_AXIS, DATA_AXIS),
        check_vma=False,
    )(codes)


def ilv_ok_mesh(mesh: Mesh, bits: int, capacity: int) -> bool:
    """Whether the sharded fused scan can ride the ilv fused surface:
    the FULL feature dim on every shard (the kernel's epilogue folds
    norms before any chance to psum feature partials — also what keeps
    4-bit's nibble-aligned splits whole) and 128*_SEG-aligned data
    shards.  Every width's in-kernel dot is TPU-probed (r7 series)."""
    return (mesh.shape[FEATURE_AXIS] == 1
            and capacity % (mesh.shape[DATA_AXIS] * 128 * _SEG) == 0)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "bits", "metric", "k", "exact",
                                    "seg_margin", "with_ties",
                                    "kernel_interpret"))
def sharded_exact_topk(mesh: Mesh, queries, codes, norms, valid, slab=None,
                       ilv=None,
                       *, bits: int, metric: str, k: int, exact: bool = False,
                       seg_margin: int = DEFAULT_SEG_MARGIN,
                       with_ties: bool = False,
                       kernel_interpret: bool = False):
    """Exhaustive sharded scan -> (dist (Q, k), global row ids (Q, k)).

    with_ties=True appends the per-query AND across shards of the local
    provable-completeness flags (fused path) — the escalation signal
    (_local_segmin_topk / ops/pallas_scan.fused_scan_topk); when the
    non-fused full-surface path runs instead (large k, unaligned shapes),
    selection is already exact and the 2-tuple is returned.

    `slab` (from sharded_lane_slab; caller gates on lane_ok_mesh) moves
    the fused path's candidate gathers onto the r3.6 tile-aligned lane
    layout — identical results, ~2.7x the gather bandwidth on TPU.

    `ilv` (from sharded_ilv_codes; caller gates on ilv_ok_mesh) runs each
    shard's surface through the r3.7 fused matmul+min kernel — the local
    (Q, N_local) surface never materializes.  kernel_interpret runs that
    kernel in Pallas interpret mode so CPU-mesh tests can pin parity
    without hardware (the known-deferred multi-chip validation item)."""
    _check_packed4(mesh, queries, bits)
    # exact mode rides the fused path too: candidates are RECOMPUTED at
    # HIGHEST precision through the full metric chain
    # (_candidate_distances_sharded), so fused selection no longer changes
    # the final distance values
    from ..ops import pallas_scan
    fused = k <= 128 and codes.shape[0] % (mesh.shape[DATA_AXIS] * _SEG) == 0
    use_slab = fused and slab is not None
    # the SHARED predicate (whole-Q VMEM block, exact stays off-kernel)
    use_ilv = fused and pallas_scan.will_use_ilv(
        ilv is not None, queries.shape[0], exact, kernel_interpret)

    def local(q, c, nrm, v, *rest):
        if fused:
            vals, idx, ok = _local_segmin_topk(
                q, c, nrm, v, bits, metric, exact, k, seg_margin,
                slab_l=rest[0] if use_slab else None,
                ilv_l=rest[-1] if use_ilv else None,
                kernel_interpret=kernel_interpret,
                surf_eps=pallas_scan.surface_accum_eps(queries.shape[1]))
        else:
            dist = _local_distances(q, c, nrm, v, bits, metric, exact)
            kk = min(k, dist.shape[1])
            neg, idx = jax.lax.top_k(-dist, kk)
            vals = -neg
            ok = jnp.ones((q.shape[0],), jnp.int32)
        shift = jax.lax.axis_index(DATA_AXIS) * c.shape[0]
        return vals, (idx + shift).astype(jnp.int32), ok[:, None]

    in_specs = [P(None, FEATURE_AXIS), P(DATA_AXIS, FEATURE_AXIS),
                P(DATA_AXIS), P(DATA_AXIS)]
    args = [queries, codes, norms, valid]
    if use_slab:
        in_specs.append(P(DATA_AXIS, FEATURE_AXIS, None))
        args.append(slab)
    if use_ilv:
        in_specs.append(P(FEATURE_AXIS, DATA_AXIS))
        args.append(ilv)
    vals, gidx, ok = jax.shard_map(
        local, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(None, DATA_AXIS), P(None, DATA_AXIS),
                   P(None, DATA_AXIS)),
        check_vma=False,
    )(*args)
    dist, rows = _merge_topk(vals, gidx, min(k, vals.shape[1]))
    if with_ties and fused:
        return dist, rows, ok.min(axis=1)  # complete iff EVERY shard is
    return dist, rows


@functools.partial(jax.jit,
                   static_argnames=("mesh", "bits", "metric", "exact"))
def sharded_scores(mesh: Mesh, queries, codes, norms, valid, *,
                   bits: int, metric: str, exact: bool = False):
    """Full (Q, N) distance matrix, N-sharded on device (for radius mode)."""
    _check_packed4(mesh, queries, bits)

    def local(q, c, nrm, v):
        return _local_distances(q, c, nrm, v, bits, metric, exact)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, FEATURE_AXIS), P(DATA_AXIS, FEATURE_AXIS),
                  P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(None, DATA_AXIS),
        check_vma=False,
    )(queries, codes, norms, valid)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "bits", "metric", "k",
                                    "local_budget", "words", "with_counts",
                                    "use_kernel", "kernel_interpret"))
def sharded_ann_topk(mesh: Mesh, qcodes, queries, codes, norms, hashes, valid,
                     *, bits: int, metric: str, k: int, local_budget: int,
                     words: int, with_counts: bool = False,
                     use_kernel: bool = False,
                     kernel_interpret: bool = False):
    """Sharded sketch-prefilter + rerank.

    Each device ranks its rows by Hamming distance of the packed sketches,
    redoes exact distances on its `local_budget` best, and returns its local
    top-k; winners are concatenated and merged.  Total candidate budget =
    local_budget * data_shards.  with_counts=True appends nscored (Q,)
    int32 — valid candidates actually scored across all shards (visited
    points, for PercentSearched parity with collection.go:589).

    use_kernel=True swaps the per-word XLA accumulator loop for the fused
    bf16 Hamming surface kernel (ops/pallas_hamming.py) inside each shard —
    the same kernel the single-chip path keeps available; measured
    tie-or-lose for XLA at the Q values tried on v5e (index/hamming.py
    notes), kept behind this flag for multi-chip profiling.
    kernel_interpret runs it in Pallas interpret mode so CPU-mesh tests can
    pin parity without TPU hardware.
    """
    _check_packed4(mesh, queries, bits)  # same guard as its siblings

    def local(qc, q, c, nrm, h, v):
        n_local = c.shape[0]
        kernel_ok = use_kernel and n_local % 1024 == 0
        if kernel_ok:
            from ..ops import pallas_hamming
            bn = max(b for b in (4096, 2048, 1024) if n_local % b == 0)
            ham = pallas_hamming.hamming_scores_bf16(
                qc.astype(jnp.uint32), h, v, words=words, block_n=bn,
                interpret=kernel_interpret)
        else:
            ham = jnp.zeros((qc.shape[0], n_local), dtype=jnp.int32)
            for w in range(words):
                x = jnp.bitwise_xor(qc[:, w][:, None], h[None, :, w])
                ham = ham + jax.lax.population_count(x).astype(jnp.int32)
            ham = jnp.where(v[None, :], ham, jnp.int32(1 << 30))
        budget = min(local_budget, n_local)
        if budget > 128:
            _, cand = jax.lax.approx_min_k(ham.astype(jnp.float32), budget,
                                           recall_target=0.95)
        else:
            _, cand = jax.lax.top_k(-ham, budget)             # (Q, B)
        ccodes = jnp.take(c, cand, axis=0)                    # (Q, B, D_l|P_l)
        cnorms = jnp.take(nrm, cand, axis=0)
        cvalid = jnp.take(v, cand, axis=0)
        if bits in (32, 64):
            # HIGHEST: wide codes must not ride the default one-bf16-pass
            # matmul on the "exact rerank" surface (CLAUDE.md invariant;
            # review finding r5 — mirrors index/hamming.rerank_topk)
            raw = jnp.einsum("qd,qbd->qb", q, ccodes.astype(jnp.float32),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
            dots = jax.lax.psum(raw, FEATURE_AXIS)
        else:
            from ..ops import distance as dist_ops
            scale, offset = qz.affine_constants(bits)
            if bits == 4:
                qe, qo = dist_ops.deinterleave_queries(q)
                h, low = dist_ops.split_nibbles(ccodes)
                cast4 = dist_ops.fast_dot_dtype()
                raw = jnp.einsum(
                    "qd,qbd->qb", qe.astype(cast4), h.astype(cast4),
                    preferred_element_type=jnp.float32)
                raw = raw + jnp.einsum(
                    "qd,qbd->qb", qo.astype(cast4),
                    low[..., : qo.shape[1]].astype(cast4),
                    preferred_element_type=jnp.float32)
            elif bits == 8:
                cast = dist_ops.fast_dot_dtype()  # int8 codes: bf16-exact
                raw = jnp.einsum("qd,qbd->qb", q.astype(cast),
                                 ccodes.astype(cast),
                                 preferred_element_type=jnp.float32)
            else:
                # 16-bit codes exceed bf16's significand: HIGHEST
                raw = jnp.einsum("qd,qbd->qb", q,
                                 ccodes.astype(jnp.float32),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
            raw = jax.lax.psum(raw, FEATURE_AXIS)
            qsum = jax.lax.psum(jnp.sum(q, axis=-1, keepdims=True),
                                FEATURE_AXIS)
            dots = scale * raw + offset * qsum
        qn2 = jax.lax.psum(jnp.sum(q * q, axis=-1, keepdims=True),
                           FEATURE_AXIS)
        if metric == "euclidean":
            dist = jnp.sqrt(jnp.maximum(qn2 - 2.0 * dots + cnorms, 0.0))
        else:
            qn = jnp.sqrt(qn2)
            vn = jnp.sqrt(cnorms)
            denom = qn * vn
            cos = jnp.where(denom > 0.0,
                            dots / jnp.where(denom > 0.0, denom, 1.0), 1.0)
            dist = jnp.arccos(jnp.clip(cos, -1.0, 1.0)) / jnp.pi
            dist = jnp.where((qn == 0.0) | (vn == 0.0), 1.0, dist)
        dist = jnp.where(cvalid, dist, jnp.inf)
        kk = min(k, dist.shape[1])
        neg, pos = jax.lax.top_k(-dist, kk)
        shift = jax.lax.axis_index(DATA_AXIS) * n_local
        rows = jnp.take_along_axis(cand, pos, axis=1) + shift
        nsc = jnp.sum(cvalid, axis=1, keepdims=True).astype(jnp.int32)
        return -neg, rows.astype(jnp.int32), nsc

    vals, gidx, nsc = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, FEATURE_AXIS), P(DATA_AXIS, FEATURE_AXIS),
                  P(DATA_AXIS), P(DATA_AXIS, None), P(DATA_AXIS)),
        out_specs=(P(None, DATA_AXIS), P(None, DATA_AXIS),
                   P(None, DATA_AXIS)),
        check_vma=False,
    )(qcodes, queries, codes, norms, hashes, valid)
    dist, rows = _merge_topk(vals, gidx, min(k, vals.shape[1]))
    if with_counts:
        # counts replicate over 'feature' (same candidates per feature
        # shard) and concatenate over 'data' -> (Q, ndata); sum the shards
        return dist, rows, nsc.sum(axis=1).astype(jnp.int32)
    return dist, rows
