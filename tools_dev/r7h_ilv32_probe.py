"""r7h: 32-bit ilv kernel (bf16x2 code split, two bf16 dots) vs the sound
XLA-HIGH surface at the headline shape."""

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
    from syzgydb_tpu.ops import distance as dist_ops
    from syzgydb_tpu.ops import pallas_scan
    from syzgydb_tpu.ops import quantize as qz

    n, d, metric = 1_000_000, 384, "cosine"
    blob = np.load(f"/tmp/syzgydb_bench_{n}x{d}_8b.npz")
    db = blob["db"]
    qrng = np.random.default_rng(777)
    q_big = 1024
    noise = qrng.standard_normal((q_big, d)).astype(np.float32)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    queries = db[qrng.integers(0, n, size=q_big)] + 0.2 * noise
    queries = np.float32(queries / np.linalg.norm(queries, axis=1,
                                                  keepdims=True))
    qdev = jnp.asarray(queries)
    npad = (-n) % 8192
    ntot = n + npad
    valid_np = np.zeros(ntot, dtype=bool)
    valid_np[:n] = True
    valid = jnp.asarray(valid_np)

    codes_np = qz.codes_to_device_repr(db, 32)
    norms_np = dist_ops.db_row_stats(codes_np, 32)
    codes = jnp.asarray(np.concatenate(
        [codes_np, np.zeros((npad, d), codes_np.dtype)]))
    norms = jnp.asarray(np.concatenate(
        [norms_np, np.zeros(npad, norms_np.dtype)]))
    ilv = pallas_scan.make_ilv_codes(codes)
    slab = pallas_scan.make_lane_slab(codes)
    jax.block_until_ready((ilv, slab))

    def timeit(fn, reps=10):
        tiny = lambda o: float(jax.tree.leaves(o)[0].reshape(-1)[0])
        tiny(fn())
        t0 = time.perf_counter()
        out = [fn() for _ in range(reps)]
        tiny(out[-1])
        return (time.perf_counter() - t0) / reps

    fn = lambda: pallas_scan.segment_min_scan_ilv(
        qdev, ilv, norms, valid, bits=32, metric=metric)
    t = timeit(fn)
    xf = lambda: pallas_scan.segment_min_scan_xla(
        qdev, codes, norms, valid, bits=32, metric=metric)
    tx = timeit(xf)
    ef = lambda: pallas_scan.segment_min_scan_xla(
        qdev, codes, norms, valid, bits=32, metric=metric, exact=True)
    a, b, e = fn(), xf(), ef()
    da = float(jnp.max(jnp.abs(jnp.where(jnp.isinf(a) & jnp.isinf(e),
                                         0.0, a - e))))
    dbb = float(jnp.max(jnp.abs(jnp.where(jnp.isinf(b) & jnp.isinf(e),
                                          0.0, b - e))))
    print(f"32-bit ilv {t*1000:.2f} ms | xla-HIGH {tx*1000:.2f} ms; "
          f"max|ilv-exact|={da:.3e} max|xlaHIGH-exact|={dbb:.3e}",
          flush=True)
    full = lambda: pallas_scan.fused_scan_topk(
        qdev, codes, norms, valid, slab, ilv, bits=32, metric=metric,
        k=10, with_ties=True)
    tfull = timeit(full)
    _, _, ok = full()
    print(f"full 32-bit ilv pipeline: {tfull*1000:.2f} ms = "
          f"{q_big/tfull:.0f} QPS, ok_rate "
          f"{float(np.asarray(ok).mean()):.4f}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
