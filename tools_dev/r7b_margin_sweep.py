"""r7b: provable-flag margin sweep on the ilv (f32-minima) surface.

The f32 surface drops the bf16 half-ulp factors from the completeness
bridge (pallas_scan._select_and_rerank surf_f32), shrinking the provable
tie window — the default margin set for the bf16 surface (24) may be
loose now.  Sweep fresh query batches per margin; a margin ships only if
the flag holds for EVERY query of EVERY fresh batch (the r5 methodology:
4096 fresh queries).
"""

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

    n, d, bits, metric, k = 1_000_000, 384, 8, "cosine", 10
    blob = np.load(f"/tmp/syzgydb_bench_{n}x{d}_{bits}b.npz")
    db, codes_np, norms_np = blob["db"], blob["codes"], blob["norms"]

    npad = (-n) % 8192
    ntot = n + npad
    valid_np = np.zeros(ntot, dtype=bool)
    valid_np[:n] = True
    codes = jnp.asarray(np.concatenate(
        [codes_np, np.zeros((npad, d), codes_np.dtype)]))
    norms = jnp.asarray(np.concatenate(
        [norms_np, np.zeros(npad, norms_np.dtype)]))
    valid = jnp.asarray(valid_np)
    ilv = pallas_scan.make_ilv_codes(codes)
    slab = pallas_scan.make_lane_slab(codes)
    jax.block_until_ready((ilv, slab))

    def fresh_queries(seed, q=1024):
        qrng = np.random.default_rng(seed)
        noise = qrng.standard_normal((q, d)).astype(np.float32)
        noise /= np.linalg.norm(noise, axis=1, keepdims=True)
        qs = db[qrng.integers(0, n, size=q)] + 0.2 * noise
        return jnp.asarray(np.float32(
            qs / np.linalg.norm(qs, axis=1, keepdims=True)))

    for margin in (8, 12, 16, 24):
        fails = 0
        total = 0
        t = None
        for seed in (101, 202, 303, 404):
            qdev = fresh_queries(seed)
            fn = lambda: pallas_scan.fused_scan_topk(
                qdev, codes, norms, valid, slab, ilv, bits=bits,
                metric=metric, k=k, tie_margin=margin, with_ties=True)
            _, _, ok = fn()
            okn = np.asarray(ok)
            fails += int((okn == 0).sum())
            total += okn.size
            if t is None:
                float(jnp.reshape(fn()[0], (-1,))[0])
                t0 = time.perf_counter()
                out = [fn() for _ in range(10)]
                float(jnp.reshape(out[-1][0], (-1,))[0])
                t = (time.perf_counter() - t0) / 10
        print(f"margin {margin}: fails {fails}/{total}, "
              f"{t*1000:.2f} ms/1024q = {1024/t:.0f} QPS", flush=True)


if __name__ == "__main__":
    sys.exit(main())
