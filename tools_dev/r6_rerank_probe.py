"""Round-3.6 probe: where do the ~14.5 ms of non-surface time go?

Headline pipeline (1M x 384, 8-bit cosine, batch 1024, seg 64, margin 24):
    surface (matmul+epilogue+segmin)   ~18 ms
    full fused_scan_topk with_ties     ~32.6 ms
    => selection top_k + slab gather + HIGHEST rerank ~= 14.5 ms

Hypothesis: the rerank einsum's int8 -> f32 convert of the gathered
candidate slabs (1024 x 2240 x 384) materializes a 3.4 GB f32 transient
(write + read ~= 8.6 GB of HBM traffic at ~800 GB/s ~= 11 ms).  If true,
a decomposed-bf16 rerank (int8 codes are EXACT in bf16; split the f32
query into 2-3 bf16 terms — the same trick XLA's own HIGHEST uses) or a
Pallas in-register convert would reclaim most of it.

Stages timed independently, pipelined (10 dispatches, fetch last):
  A  surface alone (segment_min_scan_xla)
  B  surface + indices-only seg top_k
  C  slab gather alone (codes+norms+valid), random precomputed seg_idx
  D  gather + current HIGHEST rerank (_candidate_distances)
  E  rerank alone from PRE-GATHERED int8 slabs (isolates convert+dot)
  F  rerank alone, decomposed: 2x bf16 query splits vs exact-bf16 codes
  G  full fused_scan_topk with_ties (production reference point)

Run alone (single-tenant TPU): python tools_dev/r6_rerank_probe.py
"""

import functools
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from syzgydb_tpu.utils.hostmem import tune_host_allocator
    from syzgydb_tpu.utils.platform import (normalize_jax_platforms,
                                            require_accelerator)
    tune_host_allocator()
    normalize_jax_platforms()
    import jax
    import jax.numpy as jnp
    require_accelerator()
    from syzgydb_tpu.utils import xla_cache
    xla_cache.enable()
    from syzgydb_tpu.ops import distance as dist_ops
    from syzgydb_tpu.ops import pallas_scan
    from syzgydb_tpu.ops import quantize as qz

    n, d, bits, metric, k = 1_000_000, 384, 8, "cosine", 10
    import os
    cache = f"/tmp/syzgydb_bench_{n}x{d}_{bits}b.npz"
    blob = np.load(cache)
    db, codes_np, norms_np = blob["db"], blob["codes"], blob["norms"]

    qrng = np.random.default_rng(777)
    noise = qrng.standard_normal((1024, d)).astype(np.float32)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    queries = db[qrng.integers(0, n, size=1024)] + 0.2 * noise
    queries = np.float32(queries / np.linalg.norm(queries, axis=1,
                                                  keepdims=True))

    npad = (-n) % 4096
    ntot = n + npad
    codes = jnp.asarray(np.concatenate(
        [codes_np, np.zeros((npad, d), codes_np.dtype)]))
    norms = jnp.asarray(np.concatenate(
        [norms_np, np.zeros(npad, norms_np.dtype)]))
    valid_np = np.zeros(ntot, dtype=bool)
    valid_np[:n] = True
    valid = jnp.asarray(valid_np)
    qdev = jnp.asarray(queries)

    seg = pallas_scan.DEFAULT_SEG           # 64
    margin = pallas_scan._TIE_MARGIN        # 24
    sv = k + margin + 1                     # 35 gathered segments/query
    nseg = ntot // seg

    def timeit(fn, reps=10, fetch=lambda o: np.asarray(o)[:1]):
        fetch(fn())
        t0 = time.perf_counter()
        out = [fn() for _ in range(reps)]
        fetch(out[-1])
        return (time.perf_counter() - t0) / reps

    # A: surface alone
    t_a = timeit(lambda: pallas_scan.segment_min_scan_xla(
        qdev, codes, norms, valid, bits=bits, metric=metric, seg=seg),
        fetch=lambda o: np.asarray(o[:1, :1]))
    log(f"A surface alone:                 {t_a*1e3:8.2f} ms")

    # B: surface + indices-only top_k (values dead)
    @jax.jit
    def surf_sel(q, c, nr, v):
        sm = pallas_scan.segment_min_scan_xla(q, c, nr, v, bits=bits,
                                              metric=metric, seg=seg)
        _, idx = jax.lax.top_k(-sm, sv)
        return idx
    t_b = timeit(lambda: surf_sel(qdev, codes, norms, valid),
                 fetch=lambda o: np.asarray(o[:1, :1]))
    log(f"B surface + sel top_k:           {t_b*1e3:8.2f} ms "
        f"(top_k ~= {(t_b-t_a)*1e3:.2f})")

    # fixed random segment selection for the isolated gather/rerank stages
    srng = np.random.default_rng(4)
    seg_idx_np = np.stack([srng.choice(nseg, size=sv, replace=False)
                           for _ in range(1024)]).astype(np.int32)
    seg_idx = jnp.asarray(seg_idx_np)

    # C: slab gather alone
    @jax.jit
    def gath(c, nr, v, si):
        cc = pallas_scan.gather_segments(c, si, seg)
        cn = pallas_scan.gather_segments(nr, si, seg)
        cv = pallas_scan.gather_segments(v, si, seg)
        return cc, cn, cv
    t_c = timeit(lambda: gath(codes, norms, valid, seg_idx),
                 fetch=lambda o: np.asarray(o[0][:1, :1, :1]))
    log(f"C slab gather alone:             {t_c*1e3:8.2f} ms")

    # D: gather + current HIGHEST rerank + flag-side surrogate minima
    @jax.jit
    def gath_rerank(q, c, nr, v, si):
        cc = pallas_scan.gather_segments(c, si, seg)
        cn = pallas_scan.gather_segments(nr, si, seg)
        cv = pallas_scan.gather_segments(v, si, seg)
        dist, surr = pallas_scan._candidate_distances(
            q, cc, cn, cv, bits, metric, False, with_surrogate=True)
        neg, pos = jax.lax.top_k(-dist, k)
        segsurr = jnp.min(surr.reshape(q.shape[0], sv, seg), axis=-1)
        return -neg, pos, segsurr
    t_d = timeit(lambda: gath_rerank(qdev, codes, norms, valid, seg_idx),
                 fetch=lambda o: np.asarray(o[0][:1, :1]))
    log(f"D gather + HIGHEST rerank:       {t_d*1e3:8.2f} ms "
        f"(rerank+topk ~= {(t_d-t_c)*1e3:.2f})")

    # E: rerank alone from pre-gathered slabs
    cc0, cn0, cv0 = gath(codes, norms, valid, seg_idx)
    cc0 = jax.block_until_ready(cc0)

    @jax.jit
    def rerank_only(q, cc, cn, cv):
        dist, surr = pallas_scan._candidate_distances(
            q, cc, cn, cv, bits, metric, False, with_surrogate=True)
        neg, pos = jax.lax.top_k(-dist, k)
        segsurr = jnp.min(surr.reshape(q.shape[0], sv, seg), axis=-1)
        return -neg, pos, segsurr
    t_e = timeit(lambda: rerank_only(qdev, cc0, cn0, cv0),
                 fetch=lambda o: np.asarray(o[0][:1, :1]))
    log(f"E rerank alone (pre-gathered):   {t_e*1e3:8.2f} ms")

    # F: decomposed-bf16 rerank (int8 codes exact in bf16; f32 query split
    # into hi/lo bf16 terms -> two bf16 MXU passes, f32 accumulate)
    scale, offset = qz.affine_constants(bits)

    @jax.jit
    def rerank_bf16x2(q, cc, cn, cv):
        cb = cc.astype(jnp.bfloat16)                      # exact
        qhi = q.astype(jnp.bfloat16)
        qlo = (q - qhi.astype(jnp.float32)).astype(jnp.bfloat16)
        raw = (jnp.einsum("qd,qcd->qc", qhi, cb,
                          preferred_element_type=jnp.float32)
               + jnp.einsum("qd,qcd->qc", qlo, cb,
                            preferred_element_type=jnp.float32))
        qsum = jnp.sum(q, axis=-1, keepdims=True)
        dots = scale * raw + offset * qsum
        qn = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
        vn = jnp.sqrt(cn)
        denom = qn * vn
        cos = jnp.where(denom > 0.0, dots / jnp.where(denom > 0.0,
                                                      denom, 1.0), 1.0)
        cos = jnp.clip(cos, -1.0, 1.0)
        surr = jnp.where((qn == 0.0) | (vn == 0.0), 1.0, (1.0 - cos) * 0.5)
        dist = jnp.where(cv, jnp.arccos(cos) / jnp.pi, jnp.inf)
        surr = jnp.where(cv, surr, jnp.inf)
        neg, pos = jax.lax.top_k(-dist, k)
        segsurr = jnp.min(surr.reshape(q.shape[0], sv, seg), axis=-1)
        return -neg, pos, segsurr
    t_f = timeit(lambda: rerank_bf16x2(qdev, cc0, cn0, cv0),
                 fetch=lambda o: np.asarray(o[0][:1, :1]))
    log(f"F rerank bf16x2 decomposition:   {t_f*1e3:8.2f} ms")

    # numerical agreement E vs F on the top-k distances
    de = np.asarray(rerank_only(qdev, cc0, cn0, cv0)[0], np.float64)
    df = np.asarray(rerank_bf16x2(qdev, cc0, cn0, cv0)[0], np.float64)
    log(f"  max |dist_E - dist_F| = {np.abs(de - df).max():.3e}")

    # G: production reference point
    t_g = timeit(lambda: pallas_scan.fused_scan_topk(
        qdev, codes, norms, valid, bits=bits, metric=metric, k=k,
        surface="xla", with_ties=True),
        fetch=lambda o: np.asarray(o[2][:1]))
    log(f"G full fused with_ties:          {t_g*1e3:8.2f} ms "
        f"({1024/t_g:.0f} QPS)")

    log("done")


if __name__ == "__main__":
    main()
