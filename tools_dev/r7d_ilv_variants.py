"""r7d: ilv kernel variants — subtile size, 16-bit (f32 dot), 4-bit
(dual-nibble dots).  The grid-reduction form compiles in ~1 s, so a few
programs per run is safe (unlike the fori-loop era's 6-min compiles).
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

    def timeit(fn, reps=10):
        tiny = lambda o: float(jax.tree.leaves(o)[0].reshape(-1)[0])
        tiny(fn())
        t0 = time.perf_counter()
        out = [fn() for _ in range(reps)]
        tiny(out[-1])
        return (time.perf_counter() - t0) / reps

    def setup(bits):
        log(f"quantizing bits={bits}")
        codes_np = qz.codes_to_device_repr(db, bits)
        norms_np = dist_ops.db_row_stats(codes_np, bits, d)
        codes = jnp.asarray(np.concatenate(
            [codes_np, np.zeros((npad, codes_np.shape[1]),
                                codes_np.dtype)]))
        norms = jnp.asarray(np.concatenate(
            [norms_np, np.zeros(npad, norms_np.dtype)]))
        ilv = pallas_scan.make_ilv_codes(codes)
        jax.block_until_ready(ilv)
        return codes, norms, ilv

    # -- subtile sweep on the shipped 8-bit config --
    codes8, norms8, ilv8 = setup(8)
    for sub in (512, 256, 128):
        pallas_scan._ILV_SUBTILE = sub
        pallas_scan.segment_min_scan_ilv._clear_cache()
        try:
            t = timeit(lambda: pallas_scan.segment_min_scan_ilv(
                qdev, ilv8, norms8, valid, bits=8, metric=metric))
            log(f"8-bit sub={sub}: {t*1000:.2f} ms/1024q")
        except Exception as e:
            log(f"8-bit sub={sub}: FAILED {str(e)[:120]}")
    pallas_scan._ILV_SUBTILE = 256
    pallas_scan.segment_min_scan_ilv._clear_cache()

    # -- other bit widths: correctness vs xla surface + timing --
    for bits in (16, 4):
        codes, norms, ilv = setup(bits)
        try:
            fn = lambda: pallas_scan.segment_min_scan_ilv(
                qdev, ilv, norms, valid, bits=bits, metric=metric)
            t = timeit(fn)
            xf = lambda: pallas_scan.segment_min_scan_xla(
                qdev, codes, norms, valid, bits=bits, metric=metric)
            tx = timeit(xf)
            a, b = fn(), xf()
            diff = float(jnp.max(jnp.abs(jnp.where(
                jnp.isinf(a) & jnp.isinf(b), 0.0, a - b))))
            log(f"{bits}-bit ilv: {t*1000:.2f} ms vs xla {tx*1000:.2f} ms, "
                f"max|diff|={diff:.3e}")
        except Exception as e:
            log(f"{bits}-bit ilv: FAILED {str(e)[:160]}")


if __name__ == "__main__":
    sys.exit(main())
