"""Round-3.6 probe D: tile-aligned slab gather.

r6c ruled out element-rate (int32 view gained only 1.3x).  Remaining
hypothesis: TILE waste.  codes.reshape(nseg, seg*D) tiles the LAST TWO
dims — (32,128) for int8 — so consecutive segments' slabs interleave
inside each tile and a single-row gather reads sub-tile strides.  A 3-D
(nseg, 192, 128) shape leaves dim0 untiled: every slab is whole tiles,
so jnp.take(axis=0) can DMA at full HBM bandwidth.

Timed (batch 1024, sv=35, seg=64, real top-segment indices):
  R1 full fused production (same-process reference)
  R2 surface alone                       -> in-process stage2 = R1 - R2
  A  stage2 alone (production)
  B  take (nseg, 192, 128) int8          [tile-aligned, no reshape]
  C  take (nseg, 48, 128) int32          [tile-aligned wide]
  D  B + reshape to (Q, C, 384)          [relayout cost]
  E  stage2 via tile-aligned gather      [end-to-end alternative]
  F  agreement E vs A

Run alone (single-tenant TPU): PYTHONPATH=/root/repo:$PYTHONPATH \
    python tools_dev/r6d_tile_gather_probe.py [cpu]
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
    norms = jnp.asarray(np.concatenate(
        [norms_np, np.zeros(npad, norms_np.dtype)]))
    valid_np = np.zeros(ntot, dtype=bool)
    valid_np[:n] = True
    valid = jnp.asarray(valid_np)
    qdev = jnp.asarray(queries)

    seg = pallas_scan.DEFAULT_SEG
    margin = pallas_scan._TIE_MARGIN
    sv = k + margin + 1
    nseg = ntot // seg

    # tile-aligned host-side views (same bytes, 3-D so dim0 is untiled)
    slab8_np = codes_full.reshape(nseg, (seg * d) // 128, 128)
    slab32_np = codes_full.view(np.int32).reshape(
        nseg, (seg * d // 4) // 128, 128)
    slab8 = jnp.asarray(slab8_np)
    slab32 = jnp.asarray(slab32_np)

    def timeit(fn, reps=10, fetch=lambda o: np.asarray(o)[:1]):
        out = fn()
        fetch(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()          # only the latest result stays alive
        fetch(out)
        return (time.perf_counter() - t0) / reps

    # R1/R2: same-process production reference
    t_r1 = timeit(lambda: pallas_scan.fused_scan_topk(
        qdev, codes, norms, valid, bits=bits, metric=metric, k=k,
        surface="xla", with_ties=True),
        fetch=lambda o: np.asarray(o[2][:1]))
    log(f"R1 full fused production:        {t_r1*1e3:8.2f} ms "
        f"({nq/t_r1:.0f} QPS)")
    t_r2 = timeit(lambda: pallas_scan.segment_min_scan_xla(
        qdev, codes, norms, valid, bits=bits, metric=metric, seg=seg),
        fetch=lambda o: np.asarray(o[:1, :1]))
    log(f"R2 surface alone:                {t_r2*1e3:8.2f} ms "
        f"(in-process stage2 = {(t_r1-t_r2)*1e3:.2f})")

    segmins = jax.block_until_ready(pallas_scan.segment_min_scan_xla(
        qdev, codes, norms, valid, bits=bits, metric=metric, seg=seg))

    @jax.jit
    def sel(sm):
        _, si = jax.lax.top_k(-sm, sv)
        return si
    seg_idx = jax.block_until_ready(sel(segmins))

    stage2 = functools.partial(pallas_scan._select_and_rerank,
                               bits=bits, metric=metric, k=k, seg=seg,
                               exact=False, tie_margin=margin,
                               with_ties=True)
    t_a = timeit(lambda: stage2(qdev, segmins, codes, norms, valid),
                 fetch=lambda o: np.asarray(o[0][:1, :1]))
    log(f"A stage2 production (isolated):  {t_a*1e3:8.2f} ms")

    mb = nq * sv * seg * d / 1e6

    @jax.jit
    def gt8(s, si):
        return jnp.take(s, si, axis=0)
    t_b = timeit(lambda: gt8(slab8, seg_idx),
                 fetch=lambda o: np.asarray(o[:1, :1, :1, :1]))
    log(f"B tile-aligned int8 take:        {t_b*1e3:8.2f} ms "
        f"({mb/t_b/1e3:6.1f} GB/s of {mb:.0f} MB)")

    @jax.jit
    def gt32(s, si):
        return jnp.take(s, si, axis=0)
    t_c = timeit(lambda: gt32(slab32, seg_idx),
                 fetch=lambda o: np.asarray(o[:1, :1, :1, :1]))
    log(f"C tile-aligned int32 take:       {t_c*1e3:8.2f} ms "
        f"({mb/t_c/1e3:6.1f} GB/s)")

    @jax.jit
    def gt8r(s, si):
        g = jnp.take(s, si, axis=0)            # (Q, SV, 192, 128)
        return g.reshape(si.shape[0], sv * seg, d)
    t_d = timeit(lambda: gt8r(slab8, seg_idx),
                 fetch=lambda o: np.asarray(o[:1, :1, :1]))
    log(f"D B + reshape to (Q,C,D):        {t_d*1e3:8.2f} ms")

    # E: full alternative stage2 on the tile-aligned slabs
    @jax.jit
    def stage2_tile(q, sm, s8, nr, v):
        _, si = jax.lax.top_k(-sm, sv)
        nq_ = q.shape[0]
        cc = jnp.take(s8, si, axis=0).reshape(nq_, sv * seg, d)
        cn = jnp.take(nr.reshape(nseg, -1), si, axis=0).reshape(
            nq_, sv * seg)
        cv = jnp.take(v.reshape(nseg, -1), si, axis=0).reshape(
            nq_, sv * seg)
        rows = (si[:, :, None] * seg +
                jnp.arange(seg, dtype=jnp.int32)[None, None, :]
                ).reshape(nq_, sv * seg)
        dist, surr = pallas_scan._candidate_distances(
            q, cc, cn, cv, bits, metric, False, with_surrogate=True)
        neg, pos = jax.lax.top_k(-dist, k)
        out_rows = jnp.take_along_axis(rows, pos, axis=1)
        segsurr = jnp.min(surr.reshape(nq_, sv, seg), axis=-1)
        return -neg, out_rows, segsurr
    t_e = timeit(lambda: stage2_tile(qdev, segmins, slab8, norms, valid),
                 fetch=lambda o: np.asarray(o[0][:1, :1]))
    log(f"E stage2 tile-aligned:           {t_e*1e3:8.2f} ms")

    da, ra, _ = stage2(qdev, segmins, codes, norms, valid)
    de, re, _ = stage2_tile(qdev, segmins, slab8, norms, valid)
    da, ra, de, re = (np.asarray(x) for x in (da, ra, de, re))
    log(f"F rows equal: {np.array_equal(ra, re)}  "
        f"max|dist diff|: {np.abs(da - de).max():.3e}")

    log("done")


if __name__ == "__main__":
    main()
