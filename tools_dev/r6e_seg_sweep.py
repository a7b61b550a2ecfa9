"""Round-3.6 probe E: seg sweep + lane-mapped tile-aligned rerank.

Two candidate fixes for the 14.5 ms stage2 (selection+gather+rerank):

1. Smaller seg on the UNCHANGED production path: the gather reads
   ~881 MB at seg=64; tie margins count SEGMENTS, whose number is
   bounded by tied ROWS (seg-independent), so margin 24 should hold at
   seg=32/16 while the gathered volume halves/quarters.  Cost: nseg
   doubles/quadruples -> selection top_k and the (Q, nseg) surface
   output grow.
2. Lane-mapped rerank on tile-aligned slabs: gather from a 3-D
   (nseg, 3*seg, 128) int8 view (untiled dim0 -> ~99 GB/s, r6d) and
   contract against a (3,128)-repeated query WITHOUT any relayout:
       slab byte (t, l) = dim (t%3)*128 + l of row t//3
       partial[c, t] = sum_l slab[c,t,l] * q[(t%3)*128+l]
       raw[c, r]     = partial[c,3r] + partial[c,3r+1] + partial[c,3r+2]
   Pure VPU (no MXU), f32 products/accumulation (HIGHEST-class).

Measures production fused at seg {64,32,16} (time + flag ok-rate) and
stage2_lane at seg {64,32}, with agreement checks.

Run alone (single-tenant TPU): PYTHONPATH=/root/repo:$PYTHONPATH \
    python tools_dev/r6e_seg_sweep.py [cpu]
"""

import functools
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    on_cpu = len(sys.argv) > 1 and sys.argv[1] == "cpu"
    from syzgydb_tpu.utils.hostmem import tune_host_allocator
    from syzgydb_tpu.utils.platform import (normalize_jax_platforms,
                                            require_accelerator)
    tune_host_allocator()
    import jax
    if on_cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        normalize_jax_platforms()
    import jax.numpy as jnp
    if not on_cpu:
        require_accelerator()
        from syzgydb_tpu.utils import xla_cache
        xla_cache.enable()
    from syzgydb_tpu.ops import distance as dist_ops
    from syzgydb_tpu.ops import pallas_scan
    from syzgydb_tpu.ops import quantize as qz

    if on_cpu:
        n, d, nq = 65536, 384, 64
    else:
        n, d, nq = 1_000_000, 384, 1024
    bits, metric, k = 8, "cosine", 10

    import os
    cache = f"/tmp/syzgydb_bench_{n}x{d}_{bits}b.npz"
    if os.path.exists(cache):
        blob = np.load(cache)
        db, codes_np, norms_np = blob["db"], blob["codes"], blob["norms"]
    else:
        rng = np.random.default_rng(12345)
        centers = rng.standard_normal((256, d), dtype=np.float32)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        assign = rng.integers(0, 256, size=n)
        spread = rng.standard_normal((n, d), dtype=np.float32)
        spread /= np.linalg.norm(spread, axis=1, keepdims=True)
        db = centers[assign] + 0.35 * spread
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        codes_np = qz.codes_to_device_repr(db, bits)
        norms_np = dist_ops.db_row_stats(codes_np, bits)

    qrng = np.random.default_rng(777)
    noise = qrng.standard_normal((nq, d)).astype(np.float32)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    queries = db[qrng.integers(0, n, size=nq)] + 0.2 * noise
    queries = np.float32(queries / np.linalg.norm(queries, axis=1,
                                                  keepdims=True))

    npad = (-n) % 4096
    ntot = n + npad
    codes_full = np.ascontiguousarray(np.concatenate(
        [codes_np, np.zeros((npad, d), codes_np.dtype)]))
    codes = jnp.asarray(codes_full)
    norms_full = np.concatenate([norms_np, np.zeros(npad, norms_np.dtype)])
    norms = jnp.asarray(norms_full)
    valid_np = np.zeros(ntot, dtype=bool)
    valid_np[:n] = True
    valid = jnp.asarray(valid_np)
    qdev = jnp.asarray(queries)

    margin = pallas_scan._TIE_MARGIN
    sv = k + margin + 1
    scale, offset = qz.affine_constants(bits)

    def timeit(fn, reps=10, fetch=lambda o: np.asarray(o)[:1]):
        out = fn()
        fetch(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        fetch(out)
        return (time.perf_counter() - t0) / reps

    # ---- production path, seg sweep ----
    for seg in (64, 32, 16):
        t = timeit(lambda seg=seg: pallas_scan.fused_scan_topk(
            qdev, codes, norms, valid, bits=bits, metric=metric, k=k,
            seg=seg, surface="xla", with_ties=True),
            fetch=lambda o: np.asarray(o[2][:1]))
        out = pallas_scan.fused_scan_topk(
            qdev, codes, norms, valid, bits=bits, metric=metric, k=k,
            seg=seg, surface="xla", with_ties=True)
        okr = float(np.asarray(out[2]).mean())
        log(f"production fused seg={seg:3d}: {t*1e3:8.2f} ms "
            f"({nq/t:6.0f} QPS) flag ok-rate {okr:.4f}")
        if seg == 64:
            ref_rows = np.sort(np.asarray(out[1]), axis=1)

    # ---- lane-mapped tile-aligned stage2 ----
    def make_stage2_lane(seg):
        nseg = ntot // seg
        T = 3 * seg

        @jax.jit
        def stage2_lane(q, sm, slab, nrs, vs):
            nq_ = q.shape[0]
            _, si = jax.lax.top_k(-sm, sv)                 # (Q, SV)
            g = jnp.take(slab, si, axis=0)                 # (Q, SV, T, 128)
            qx = q.reshape(nq_, 3, 128)
            qrep = jnp.tile(qx, (1, seg, 1))               # (Q, T, 128)
            partial = jnp.sum(g.astype(jnp.float32) *
                              qrep[:, None, :, :], axis=-1)  # (Q, SV, T)
            raw = (partial[:, :, 0::3] + partial[:, :, 1::3] +
                   partial[:, :, 2::3])                    # (Q, SV, seg)
            raw = raw.reshape(nq_, sv * seg)
            cn = jnp.take(nrs, si, axis=0).reshape(nq_, sv * seg)
            cv = jnp.take(vs, si, axis=0).reshape(nq_, sv * seg)
            rows = (si[:, :, None] * seg +
                    jnp.arange(seg, dtype=jnp.int32)[None, None, :]
                    ).reshape(nq_, sv * seg)
            qsum = jnp.sum(q, axis=-1, keepdims=True)
            dots = scale * raw + offset * qsum
            qn = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
            vn = jnp.sqrt(cn)
            denom = qn * vn
            cos = jnp.where(denom > 0.0,
                            dots / jnp.where(denom > 0.0, denom, 1.0), 1.0)
            cos = jnp.clip(cos, -1.0, 1.0)
            zero = (qn == 0.0) | (vn == 0.0)
            dist = jnp.where(zero, 1.0, jnp.arccos(cos) / jnp.pi)
            surr = jnp.where(zero, 1.0, (1.0 - cos) * 0.5)
            dist = jnp.where(cv, dist, jnp.inf)
            surr = jnp.where(cv, surr, jnp.inf)
            neg, pos = jax.lax.top_k(-dist, k)
            out_rows = jnp.take_along_axis(rows, pos, axis=1)
            segsurr = jnp.min(surr.reshape(nq_, sv, seg), axis=-1)
            return -neg, out_rows, segsurr
        return stage2_lane

    for seg in (64, 32):
        nseg = ntot // seg
        slab_np = codes_full.reshape(nseg, 3 * seg, 128)
        slab = jnp.asarray(slab_np)
        nrs = jnp.asarray(norms_full.reshape(nseg, seg))
        vs = jnp.asarray(valid_np.reshape(nseg, seg))
        segmins = jax.block_until_ready(pallas_scan.segment_min_scan_xla(
            qdev, codes, norms, valid, bits=bits, metric=metric, seg=seg))
        s2 = make_stage2_lane(seg)
        t = timeit(lambda: s2(qdev, segmins, slab, nrs, vs),
                   fetch=lambda o: np.asarray(o[0][:1, :1]))
        log(f"stage2_lane seg={seg:3d}:      {t*1e3:8.2f} ms")
        # agreement vs production stage2 at same seg
        stage2 = functools.partial(pallas_scan._select_and_rerank,
                                   bits=bits, metric=metric, k=k, seg=seg,
                                   exact=False, tie_margin=margin,
                                   with_ties=True)
        da, ra, _ = stage2(qdev, segmins, codes, norms, valid)
        dl, rl, _ = s2(qdev, segmins, slab, nrs, vs)
        da, ra, dl, rl = (np.asarray(x) for x in (da, ra, dl, rl))
        log(f"  rows equal: {np.array_equal(ra, rl)}  "
            f"max|dist diff|: {np.abs(da - dl).max():.3e}")

    log("done")


if __name__ == "__main__":
    main()
