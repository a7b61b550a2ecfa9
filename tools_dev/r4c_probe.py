"""Isolate the with_ties stage-2 cost at the headline shape: every variant
operates on a PRE-MATERIALIZED (1024, 32768) f32 segmins array."""

import functools
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from syzgydb_tpu.utils.hostmem import tune_host_allocator
    tune_host_allocator()
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    from syzgydb_tpu.ops import pallas_scan

    n, d, bits, metric, k = 1_000_000, 384, 8, "cosine", 10
    blob = np.load(f"/tmp/syzgydb_bench_{n}x{d}_{bits}b.npz")
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

    segmins = pallas_scan.segment_min_scan_xla(
        qdev, codes, norms, valid, bits=bits, metric=metric, seg=32)
    segmins = jax.block_until_ready(segmins)
    nseg = segmins.shape[1]
    log(f"segmins materialized: {segmins.shape}")

    def timeit(fn, reps=10, fetch=lambda o: np.asarray(o[:1, :1])):
        fetch(fn())
        t0 = time.perf_counter()
        last = None
        for _ in range(reps):
            last = fn()
        fetch(last)
        return (time.perf_counter() - t0) / reps

    topk_idx = jax.jit(lambda s: jax.lax.top_k(-s, 26)[1])
    t = timeit(lambda: topk_idx(segmins))
    log(f"top_k idx only:      {t*1e3:8.2f} ms")

    topk_both = jax.jit(lambda s: jax.lax.top_k(-s, 26))
    t = timeit(lambda: topk_both(segmins), fetch=lambda o: np.asarray(
        o[1][:1, :1]))
    log(f"top_k both outputs:  {t*1e3:8.2f} ms")

    ties_only = jax.jit(lambda s: jnp.sum(s <= 0.123, axis=1))
    t = timeit(lambda: ties_only(segmins),
               fetch=lambda o: np.asarray(o[:1, None]))
    log(f"tie count alone:     {t*1e3:8.2f} ms")

    for wt in (False, True):
        f = functools.partial(pallas_scan._select_and_rerank, bits=bits,
                              metric=metric, k=k, seg=32, exact=False,
                              tie_margin=16, with_ties=wt)
        t = timeit(lambda: f(qdev, segmins, codes, norms, valid),
                   fetch=lambda o: np.asarray(o[-1][:1, None])
                   if wt else np.asarray(o[0][:1, :1]))
        log(f"stage2 with_ties={wt}: {t*1e3:8.2f} ms")

    for wt in (False, True):
        t = timeit(lambda: pallas_scan.fused_scan_topk(
            qdev, codes, norms, valid, bits=bits, metric=metric, k=k,
            seg=32, surface="xla", with_ties=wt),
            fetch=lambda o: np.asarray(o[-1][:1, None])
            if wt else np.asarray(o[0][:1, :1]))
        log(f"full fused ties={wt}: {t*1e3:8.2f} ms  ({1024/t:.0f} QPS)")

    log("done")


if __name__ == "__main__":
    main()
