"""r7f: ilv vs XLA surface across batch sizes — the kernel's fixed
per-grid-step cost (N/256 steps regardless of Q) must be amortized; find
the Q crossover for the production gate."""

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
    qrng = np.random.default_rng(777)
    noise = qrng.standard_normal((1024, d)).astype(np.float32)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    queries = db[qrng.integers(0, n, size=1024)] + 0.2 * noise
    queries = np.float32(queries / np.linalg.norm(queries, axis=1,
                                                  keepdims=True))
    npad = (-n) % 8192
    ntot = n + npad
    valid_np = np.zeros(ntot, dtype=bool)
    valid_np[:n] = True
    valid = jnp.asarray(valid_np)
    codes = jnp.asarray(np.concatenate(
        [codes_np, np.zeros((npad, d), codes_np.dtype)]))
    norms = jnp.asarray(np.concatenate(
        [norms_np, np.zeros(npad, norms_np.dtype)]))
    ilv = pallas_scan.make_ilv_codes(codes)
    jax.block_until_ready(ilv)

    def timeit(fn, reps=10):
        tiny = lambda o: float(jax.tree.leaves(o)[0].reshape(-1)[0])
        tiny(fn())
        t0 = time.perf_counter()
        out = [fn() for _ in range(reps)]
        tiny(out[-1])
        return (time.perf_counter() - t0) / reps

    for q_n in (8, 32, 64, 128, 256):
        qd = jnp.asarray(queries[:q_n])
        ti = timeit(lambda: pallas_scan.segment_min_scan_ilv(
            qd, ilv, norms, valid, bits=bits, metric=metric))
        tx = timeit(lambda: pallas_scan.segment_min_scan_xla(
            qd, codes, norms, valid, bits=bits, metric=metric))
        print(f"Q={q_n:5d}: ilv {ti*1000:7.2f} ms | xla {tx*1000:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
