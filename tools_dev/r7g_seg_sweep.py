"""r7g: segment width sweep on the r3.7 ilv stack (margin 8).

The r6e sweep picked seg=64 when selection rode bf16 minima at margin 24;
margin 8 + f32 minima move the selection/gather balance — re-measure the
full pipeline at seg 32/64/128."""

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
    blob = np.load(f"/tmp/syzgydb_bench_{n}x{d}_8b.npz")
    db, codes_np, norms_np = blob["db"], blob["codes"], blob["norms"]
    qrng = np.random.default_rng(777)
    noise = qrng.standard_normal((1024, d)).astype(np.float32)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    queries = db[qrng.integers(0, n, size=1024)] + 0.2 * noise
    queries = np.float32(queries / np.linalg.norm(queries, axis=1,
                                                  keepdims=True))
    qdev = jnp.asarray(queries)

    def timeit(fn, reps=10):
        tiny = lambda o: float(jax.tree.leaves(o)[0].reshape(-1)[0])
        tiny(fn())
        t0 = time.perf_counter()
        out = [fn() for _ in range(reps)]
        tiny(out[-1])
        return (time.perf_counter() - t0) / reps

    for seg in (32, 64, 128):
        blk = 128 * seg
        npad = (-n) % blk
        ntot = n + npad
        valid_np = np.zeros(ntot, dtype=bool)
        valid_np[:n] = True
        valid = jnp.asarray(valid_np)
        codes = jnp.asarray(np.concatenate(
            [codes_np, np.zeros((npad, d), codes_np.dtype)]))
        norms = jnp.asarray(np.concatenate(
            [norms_np, np.zeros(npad, norms_np.dtype)]))
        ilv = pallas_scan.make_ilv_codes(codes, seg)
        slab = pallas_scan.make_lane_slab(codes, seg)
        jax.block_until_ready((ilv, slab))
        fn = lambda: pallas_scan.fused_scan_topk(
            qdev, codes, norms, valid, slab, ilv, bits=bits, metric=metric,
            k=k, seg=seg, with_ties=True)
        t = timeit(fn)
        _, _, ok = fn()
        okr = float(np.asarray(ok).mean())
        ts = timeit(lambda: pallas_scan.segment_min_scan_ilv(
            qdev, ilv, norms, valid, bits=bits, metric=metric, seg=seg))
        print(f"seg={seg:4d}: full {t*1000:6.2f} ms = {1024/t:7.0f} QPS "
              f"(surface {ts*1000:5.2f} ms), ok_rate {okr:.4f}", flush=True)
        del codes, norms, valid, ilv, slab


if __name__ == "__main__":
    sys.exit(main())
