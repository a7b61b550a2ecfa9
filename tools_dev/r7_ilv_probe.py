"""r7: segment-interleaved fused matmul+min kernel (segment_min_scan_ilv)
vs the XLA surface at the headline shape (1M x 384, 8-bit cosine, 1024q).

One novel Mosaic program per probe (CLAUDE.md); generous timeout — killing
a remote compile wedges the single-tenant TPU claim for ~30-60 min.
"""

import sys
import time

import numpy as np


def log(m):
    print(m, flush=True)


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

    n, d, bits, metric, k = 1_000_000, 384, 8, "cosine", 10
    blob = np.load(f"/tmp/syzgydb_bench_{n}x{d}_{bits}b.npz")
    db, codes_np, norms_np = blob["db"], blob["codes"], blob["norms"]

    qrng = np.random.default_rng(777)
    q_big = 1024
    noise = qrng.standard_normal((q_big, d)).astype(np.float32)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    queries = db[qrng.integers(0, n, size=q_big)] + 0.2 * noise
    queries = np.float32(queries / np.linalg.norm(queries, axis=1,
                                                  keepdims=True))

    blk = 128 * pallas_scan.DEFAULT_SEG  # 8192
    npad = (-n) % blk
    ntot = n + npad
    valid_np = np.zeros(ntot, dtype=bool)
    valid_np[:n] = True
    log(f"upload: ntot={ntot}")
    codes = jnp.asarray(np.concatenate(
        [codes_np, np.zeros((npad, d), codes_np.dtype)]))
    norms = jnp.asarray(np.concatenate(
        [norms_np, np.zeros(npad, norms_np.dtype)]))
    valid = jnp.asarray(valid_np)
    qdev = jnp.asarray(queries)
    ilv = pallas_scan.make_ilv_codes(codes)
    slab = pallas_scan.make_lane_slab(codes)
    jax.block_until_ready((ilv, slab))

    def timeit(fn, reps=10):
        # end the block with a TINY value fetch (device-side slice first:
        # materializing a whole (Q, nseg) output crosses the ~1MB/s
        # device->host tunnel and inflates every number by ~50 ms)
        tiny = lambda o: float(jax.tree.leaves(o)[0].reshape(-1)[0])
        tiny(fn())
        t0 = time.perf_counter()
        out = [fn() for _ in range(reps)]
        tiny(out[-1])
        return (time.perf_counter() - t0) / reps

    log("xla surface: warm + time")
    xla_fn = lambda: pallas_scan.segment_min_scan_xla(
        qdev, codes, norms, valid, bits=bits, metric=metric)
    t_xla = timeit(xla_fn)
    log(f"xla surface: {t_xla*1000:.2f} ms/1024q")

    log("ilv kernel: compiling (remote Mosaic — may take ~10 min)")
    t0 = time.perf_counter()
    ilv_fn = lambda: pallas_scan.segment_min_scan_ilv(
        qdev, ilv, norms, valid, bits=bits, metric=metric)
    out = ilv_fn()
    jax.block_until_ready(out)
    log(f"ilv kernel: compiled+first-run in {time.perf_counter()-t0:.1f}s")
    t_ilv = timeit(ilv_fn)
    log(f"ilv kernel: {t_ilv*1000:.2f} ms/1024q ({t_xla/t_ilv:.2f}x vs xla)")

    # numeric check: ilv (f32 minima, bf16 dots) vs xla (bf16-stored
    # minima) — agreement within bf16 resolution; reduce on device
    a = ilv_fn()
    b = xla_fn()
    diff = float(jnp.max(jnp.abs(jnp.where(jnp.isinf(a) & jnp.isinf(b),
                                           0.0, a - b))))
    log(f"max |ilv - xla| over finite minima: {diff:.3e} (bf16 ulp ~2e-3)")

    # full pipeline: fused_scan_topk with the ilv surface + lane rerank
    log("full pipeline (ilv surface + lane rerank): warm + time")
    full_fn = lambda: pallas_scan.fused_scan_topk(
        qdev, codes, norms, valid, slab, ilv, bits=bits, metric=metric,
        k=k, with_ties=True)
    t_full = timeit(full_fn)
    _, rows, ok = full_fn()
    ok_rate = float(np.asarray(ok).mean())
    log(f"full ilv pipeline: {t_full*1000:.2f} ms/1024q = "
        f"{q_big/t_full:.0f} QPS, ok_rate {ok_rate:.4f}")

    log("full pipeline (xla surface, production r3.6) for comparison")
    base_fn = lambda: pallas_scan.fused_scan_topk(
        qdev, codes, norms, valid, slab, bits=bits, metric=metric,
        k=k, surface="xla", with_ties=True)
    t_base = timeit(base_fn)
    log(f"full xla pipeline: {t_base*1000:.2f} ms/1024q = "
        f"{q_big/t_base:.0f} QPS")


if __name__ == "__main__":
    sys.exit(main())
