"""Round-3.6 probe B: the slab gather is the wall (r6_rerank_probe: 20.6 ms
for 880 MB ~= 43 GB/s — jnp.take on int8 lowers to an element-wise gather).

Variants timed at the headline shape (batch 1024, sv=35 segments/query):
  1  current: reshape (nseg, seg*D) int8 -> take
  2  int32 bitcast: (nseg, seg*D/4) int32 -> take -> bitcast back
  3  int32 take WITHOUT the bitcast-back (isolate the view cost)
  4  seg=32 int32 gather at margin 24 (same sv -> half the bytes)
  5  production fused_scan_topk at seg=32 (end-to-end effect incl. flag)
  6  production fused_scan_topk at seg=64 (reference point, same process)

Flag-rate check at seg=32: the tie margin counts SEGMENTS whose surface
min sits under the provable threshold; a tie cluster of R rows occupies
at most R segments at ANY seg, so margin 24 should hold at seg=32 as it
does at 64 — verified on the clustered headline corpus.

Run alone (single-tenant TPU): PYTHONPATH=/root/repo:$PYTHONPATH \
    python tools_dev/r6b_gather_probe.py
"""

import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


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
    cache = f"/tmp/syzgydb_bench_{n}x{d}_{bits}b.npz"
    blob = np.load(cache)
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

    margin = pallas_scan._TIE_MARGIN        # 24
    sv = k + margin + 1                     # 35

    def timeit(fn, reps=10, fetch=lambda o: np.asarray(o)[:1]):
        fetch(fn())
        t0 = time.perf_counter()
        out = [fn() for _ in range(reps)]
        fetch(out[-1])
        return (time.perf_counter() - t0) / reps

    srng = np.random.default_rng(4)

    for seg in (64, 32):
        nseg = ntot // seg
        seg_idx = jnp.asarray(np.stack(
            [srng.choice(nseg, size=sv, replace=False)
             for _ in range(1024)]).astype(np.int32))

        @jax.jit
        def take_int8(c, si, seg=seg, nseg=nseg):
            flat = c.reshape(nseg, -1)
            return jnp.take(flat, si, axis=0)
        t1 = timeit(lambda: take_int8(codes, seg_idx),
                    fetch=lambda o: np.asarray(o[:1, :1, :1]))
        mb = 1024 * sv * seg * d / 1e6
        log(f"seg={seg}: int8 take           {t1*1e3:8.2f} ms "
            f"({mb/t1/1e3:6.1f} GB/s of {mb:.0f} MB)")

        @jax.jit
        def take_int32(c, si, seg=seg, nseg=nseg):
            flat = jax.lax.bitcast_convert_type(
                c.reshape(nseg, -1, 4), jnp.int32)        # (nseg, seg*D/4)
            g = jnp.take(flat, si, axis=0)                # (Q, SV, seg*D/4)
            return jax.lax.bitcast_convert_type(g, jnp.int8).reshape(
                g.shape[0], g.shape[1], -1)
        t2 = timeit(lambda: take_int32(codes, seg_idx),
                    fetch=lambda o: np.asarray(o[:1, :1, :1]))
        log(f"seg={seg}: int32 take+bitcast  {t2*1e3:8.2f} ms "
            f"({mb/t2/1e3:6.1f} GB/s)")

        @jax.jit
        def take_int32_raw(c, si, seg=seg, nseg=nseg):
            flat = jax.lax.bitcast_convert_type(
                c.reshape(nseg, -1, 4), jnp.int32)
            return jnp.take(flat, si, axis=0)
        t3 = timeit(lambda: take_int32_raw(codes, seg_idx),
                    fetch=lambda o: np.asarray(o[:1, :1, :1]))
        log(f"seg={seg}: int32 take raw      {t3*1e3:8.2f} ms "
            f"({mb/t3/1e3:6.1f} GB/s)")

    # end-to-end production path at both segs (+ flag rate at 32)
    for seg in (64, 32):
        t_g = timeit(lambda seg=seg: pallas_scan.fused_scan_topk(
            qdev, codes, norms, valid, bits=bits, metric=metric, k=k,
            seg=seg, surface="xla", with_ties=True),
            fetch=lambda o: np.asarray(o[2][:1]))
        out = pallas_scan.fused_scan_topk(
            qdev, codes, norms, valid, bits=bits, metric=metric, k=k,
            seg=seg, surface="xla", with_ties=True)
        okr = float(np.asarray(out[2]).mean())
        log(f"fused seg={seg}: {t_g*1e3:8.2f} ms ({1024/t_g:.0f} QPS) "
            f"flag ok-rate {okr:.4f}")

    log("done")


if __name__ == "__main__":
    main()
