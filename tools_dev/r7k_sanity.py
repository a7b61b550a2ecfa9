"""r7k: one-shot headline sanity (15-16 ms/1024q when the platform is
healthy).  Used to detect the single-tenant tunnel's degraded mode —
back-to-back short-lived TPU processes can wedge it into a ~100x-slow
state for 30-60 min (CLAUDE.md); run this before trusting any number."""

import sys
import time

import numpy as np


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
    from syzgydb_tpu.ops import pallas_scan

    n, d, bits, metric = 1_000_000, 384, 8, "cosine"
    blob = np.load(f"/tmp/syzgydb_bench_{n}x{d}_8b.npz")
    db, codes_np, norms_np = blob["db"], blob["codes"], blob["norms"]
    npad = (-n) % 8192
    valid = jnp.asarray(np.concatenate(
        [np.ones(n, bool), np.zeros(npad, bool)]))
    codes = jnp.asarray(np.concatenate(
        [codes_np, np.zeros((npad, d), codes_np.dtype)]))
    norms = jnp.asarray(np.concatenate(
        [norms_np, np.zeros(npad, norms_np.dtype)]))
    ilv = pallas_scan.make_ilv_codes(codes)
    slab = pallas_scan.make_lane_slab(codes)
    jax.block_until_ready((ilv, slab))
    qrng = np.random.default_rng(777)
    noise = qrng.standard_normal((1024, d)).astype(np.float32)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    queries = db[qrng.integers(0, n, size=1024)] + 0.2 * noise
    q = jnp.asarray(np.float32(
        queries / np.linalg.norm(queries, axis=1, keepdims=True)))
    fn = lambda: pallas_scan.fused_scan_topk(
        q, codes, norms, valid, slab, ilv, bits=bits, metric=metric,
        k=10, with_ties=True)
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(10)]
    float(jnp.reshape(outs[-1][0], (-1,))[0])
    dt = (time.perf_counter() - t0) / 10
    print(f"headline sanity: {dt*1000:.2f} ms = {1024/dt:.0f} QPS, "
          f"ok_rate {float(np.asarray(outs[-1][2]).mean()):.4f}",
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
