"""Round-4 stage-2 probe, part 3: subtile 2048/4096 + the seg32 sweep
(r8b's seg32 section had a lambda-scope typo).  r8b measured:

  full pipeline margin8 seg64 : 14.88 ms (68.8k QPS)
  surface alone (subtile 256) :  9.17 ms
  selection top_k(19)         :  1.92 ms
  lane gather + dots          :  3.47 ms
  residual                    :  0.32 ms
  subtile 512 / 1024          :  8.84 / 8.02 ms
  margin 2 / 4 / 6            : flag held 3839 / 4083 / 4096 of 4096
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


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
    q_big = 1024
    blob = np.load(f"/tmp/syzgydb_bench_{n}x{d}_{bits}b.npz")
    db, codes_np, norms_np = blob["db"], blob["codes"], blob["norms"]

    qrng = np.random.default_rng(777)
    noise = qrng.standard_normal((q_big, d)).astype(np.float32)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    queries = db[qrng.integers(0, n, size=q_big)] + 0.2 * noise
    queries = np.float32(queries / np.linalg.norm(queries, axis=1,
                                                  keepdims=True))

    npad = (-n) % 8192
    ntot = n + npad
    valid_np = np.zeros(ntot, dtype=bool)
    valid_np[:n] = True
    codes = jnp.asarray(np.concatenate(
        [codes_np, np.zeros((npad, d), codes_np.dtype)]))
    norms = jnp.asarray(np.concatenate(
        [norms_np, np.zeros(npad, norms_np.dtype)]))
    valid = jnp.asarray(valid_np)
    qdev = jnp.asarray(queries)

    def timeit(fn, reps=10, fetch=None):
        fetch = fetch or (lambda o: np.asarray(o[0][:1, :1]))
        fetch(fn())
        t0 = time.perf_counter()
        out = [fn() for _ in range(reps)]
        fetch(out[-1])
        return (time.perf_counter() - t0) / reps

    slab = pallas_scan.make_lane_slab(codes)
    ilv = pallas_scan.make_ilv_codes(codes)
    jax.block_until_ready((slab, ilv))

    t = timeit(lambda: pallas_scan.fused_scan_topk(
        qdev, codes, norms, valid, slab, ilv, bits=bits, metric=metric,
        k=k, with_ties=True))
    print(f"sanity full pipeline margin8 seg64: {t*1000:.2f} ms "
          f"({q_big/t:.0f} QPS)", flush=True)
    if t > 0.025:
        print("PLATFORM DEGRADED — results unreliable", flush=True)

    # subtile 2048 / 4096
    for sub in (2048, 4096):
        pallas_scan._ILV_SUBTILE = sub
        pallas_scan.segment_min_scan_ilv.clear_cache()
        try:
            ts = timeit(lambda: pallas_scan.segment_min_scan_ilv(
                qdev, ilv, norms, valid, bits=bits, metric=metric),
                fetch=lambda o: np.asarray(o[:1, :1]))
            print(f"surface subtile={sub}: {ts*1000:.2f} ms", flush=True)
        except Exception as exc:
            print(f"surface subtile={sub}: FAILED {type(exc).__name__} "
                  f"{str(exc)[:200]}", flush=True)

    # full pipeline at the best subtile so far (1024), margins 6 and 8
    pallas_scan._ILV_SUBTILE = 1024
    pallas_scan.segment_min_scan_ilv.clear_cache()
    for margin in (6, 8):
        tm = timeit(lambda m=margin: pallas_scan.fused_scan_topk(
            qdev, codes, norms, valid, slab, ilv, bits=bits, metric=metric,
            k=k, tie_margin=m, with_ties=True))
        print(f"subtile1024 margin {margin}: {tm*1000:.2f} ms "
              f"({q_big/tm:.0f} QPS)", flush=True)

    # seg=32 sweep (subtile 1024), with flag-hold rates on fresh queries
    frng = np.random.default_rng(31337)
    fnoise = frng.standard_normal((4096, d)).astype(np.float32)
    fnoise /= np.linalg.norm(fnoise, axis=1, keepdims=True)
    fresh = db[frng.integers(0, n, size=4096)] + 0.2 * fnoise
    fresh = np.float32(fresh / np.linalg.norm(fresh, axis=1, keepdims=True))
    slab32 = pallas_scan.make_lane_slab(codes, seg=32)
    ilv32 = pallas_scan.make_ilv_codes(codes, seg=32)
    jax.block_until_ready((slab32, ilv32))
    for margin in (4, 6, 8):
        def run32(qs, m=margin):
            return pallas_scan.fused_scan_topk(
                qs, codes, norms, valid, slab32, ilv32, bits=bits,
                metric=metric, k=k, seg=32, tie_margin=m, with_ties=True)
        tm = timeit(lambda: run32(qdev))
        held = 0
        for s in range(0, 4096, 1024):
            _, _, ok = run32(jnp.asarray(fresh[s:s+1024]))
            held += int(np.asarray(ok).sum())
        print(f"seg32 subtile1024 margin {margin}: {tm*1000:.2f} ms "
              f"({q_big/tm:.0f} QPS), flag held {held}/4096", flush=True)

    pallas_scan._ILV_SUBTILE = 256
    print("probe done", flush=True)


if __name__ == "__main__":
    main()
