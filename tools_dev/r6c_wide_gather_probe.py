"""Round-3.6 probe C: wide-word slab gather + byte-plane rerank.

r6b showed the int8 slab gather runs at ~36 GB/s (element-rate-bound) and
an on-device int8->int32 bitcast is unusable (a trailing dim of 4 pads to
128 under TPU (8,128) tiling: 32x memory).  Plan: keep a HOST-prepared
int32 view of the codes (same 384 MB, 4x fewer elements), gather THAT,
and unpack bytes arithmetically in the rerank:

    word w of a row packs dims 4w..4w+3 (little-endian numpy view), so
    dot(q, c) = sum_j dot(q[j::4], signed_byte_j(words))     (j = 0..3)

Four (Q, C, 96) HIGHEST einsums replace one (Q, C, 384) einsum — same
FLOPs, same f32 rounding class.

Timed (batch 1024, sv=35, seg=64):
  A  stage2 alone, production (_select_and_rerank on real segmins)
  B  int8 slab gather, REAL top-segment indices (vs r6b's random)
  C  int32-view slab gather, real indices
  D  stage2 alternative: int32 gather + byte-plane rerank + flag math
  E  numerical agreement D vs A (top-k rows + distances)

Run alone (single-tenant TPU): PYTHONPATH=/root/repo:$PYTHONPATH \
    python tools_dev/r6c_wide_gather_probe.py [cpu]
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
    if on_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        normalize_jax_platforms()
    import jax
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
    codes_full = np.concatenate([codes_np, np.zeros((npad, d),
                                                    codes_np.dtype)])
    codes = jnp.asarray(codes_full)
    # host-side int32 view: same bytes, 4x fewer elements
    words_full = codes_full.view(np.int32)            # (ntot, 96)
    words = jnp.asarray(words_full)
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
    scale, offset = qz.affine_constants(bits)

    def timeit(fn, reps=10, fetch=lambda o: np.asarray(o)[:1]):
        fetch(fn())
        t0 = time.perf_counter()
        out = [fn() for _ in range(reps)]
        fetch(out[-1])
        return (time.perf_counter() - t0) / reps

    # real segmins + the production selection indices
    segmins = jax.block_until_ready(pallas_scan.segment_min_scan_xla(
        qdev, codes, norms, valid, bits=bits, metric=metric, seg=seg))

    @jax.jit
    def sel(sm):
        _, si = jax.lax.top_k(-sm, sv)
        return si
    seg_idx = jax.block_until_ready(sel(segmins))

    # A: production stage2 alone
    stage2 = functools.partial(pallas_scan._select_and_rerank,
                               bits=bits, metric=metric, k=k, seg=seg,
                               exact=False, tie_margin=margin,
                               with_ties=True)
    t_a = timeit(lambda: stage2(qdev, segmins, codes, norms, valid),
                 fetch=lambda o: np.asarray(o[0][:1, :1]))
    log(f"A stage2 production:             {t_a*1e3:8.2f} ms")

    # B: int8 slab gather, real indices
    @jax.jit
    def g8(c, si):
        return jnp.take(c.reshape(nseg, -1), si, axis=0)
    t_b = timeit(lambda: g8(codes, seg_idx),
                 fetch=lambda o: np.asarray(o[:1, :1, :1]))
    mb = nq * sv * seg * d / 1e6
    log(f"B int8 gather (real idx):        {t_b*1e3:8.2f} ms "
        f"({mb/t_b/1e3:6.1f} GB/s of {mb:.0f} MB)")

    # C: int32-view slab gather, real indices
    @jax.jit
    def g32(w, si):
        return jnp.take(w.reshape(nseg, -1), si, axis=0)
    t_c = timeit(lambda: g32(words, seg_idx),
                 fetch=lambda o: np.asarray(o[:1, :1, :1]))
    log(f"C int32 gather (real idx):       {t_c*1e3:8.2f} ms "
        f"({mb/t_c/1e3:6.1f} GB/s)")

    # D: full alternative stage2 — int32 gather + byte-plane rerank
    @jax.jit
    def stage2_wide(q, sm, w, nr, v):
        _, si = jax.lax.top_k(-sm, sv)                    # (Q, SV)
        gw = jnp.take(w.reshape(nseg, -1), si, axis=0)    # (Q, SV, seg*96)
        nq_ = q.shape[0]
        gw = gw.reshape(nq_, sv * seg, d // 4)            # (Q, C, 96)
        cn = jnp.take(nr.reshape(nseg, -1), si, axis=0).reshape(
            nq_, sv * seg)
        cv = jnp.take(v.reshape(nseg, -1), si, axis=0).reshape(
            nq_, sv * seg)
        rows = (si[:, :, None] * seg +
                jnp.arange(seg, dtype=jnp.int32)[None, None, :]
                ).reshape(nq_, sv * seg)
        prec = jax.lax.Precision.HIGHEST
        raw = None
        for j in range(4):
            b = (gw >> (8 * j)) & 0xFF
            cj = (b - ((b & 0x80) << 1)).astype(jnp.float32)  # signed byte
            qj = q[:, j::4]                                    # (Q, 96)
            t = jnp.einsum("qw,qcw->qc", qj, cj,
                           preferred_element_type=jnp.float32,
                           precision=prec)
            raw = t if raw is None else raw + t
        qsum = jnp.sum(q, axis=-1, keepdims=True)
        dots = scale * raw + offset * qsum
        qn = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
        vn = jnp.sqrt(cn)
        denom = qn * vn
        cos = jnp.where(denom > 0.0, dots / jnp.where(denom > 0.0,
                                                      denom, 1.0), 1.0)
        cos = jnp.clip(cos, -1.0, 1.0)
        dist = jnp.where((qn == 0.0) | (vn == 0.0), 1.0,
                         jnp.arccos(cos) / jnp.pi)
        surr = jnp.where((qn == 0.0) | (vn == 0.0), 1.0, (1.0 - cos) * 0.5)
        dist = jnp.where(cv, dist, jnp.inf)
        surr = jnp.where(cv, surr, jnp.inf)
        neg, pos = jax.lax.top_k(-dist, k)
        out_rows = jnp.take_along_axis(rows, pos, axis=1)
        segsurr = jnp.min(surr.reshape(nq_, sv, seg), axis=-1)
        return -neg, out_rows, segsurr
    t_d = timeit(lambda: stage2_wide(qdev, segmins, words, norms, valid),
                 fetch=lambda o: np.asarray(o[0][:1, :1]))
    log(f"D stage2 wide-gather:            {t_d*1e3:8.2f} ms")

    # E: agreement vs production
    da, ra, _ = stage2(qdev, segmins, codes, norms, valid)
    dd, rd, _ = stage2_wide(qdev, segmins, words, norms, valid)
    da, ra, dd, rd = (np.asarray(x) for x in (da, ra, dd, rd))
    log(f"E rows equal: {np.array_equal(ra, rd)}  "
        f"max|dist diff|: {np.abs(da - dd).max():.3e}")

    log("done")


if __name__ == "__main__":
    main()
