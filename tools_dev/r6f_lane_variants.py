"""Round-3.6 probe F: TPU smoke of the non-headline lane-path shapes.

The REST path can dispatch the fused scan with escalated tie margins
(ladder rungs 64/512), exact=True (f32 surface), and euclidean — each a
distinct compiled shape.  Verify they compile through the tunnel, run at
sane times with the lane slab, and agree with the margin-24 results.

Run alone (single-tenant TPU): PYTHONPATH=/root/repo:$PYTHONPATH \
    python tools_dev/r6f_lane_variants.py
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

    n, d, bits, k = 1_000_000, 384, 8, 10
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
    slab = jax.block_until_ready(pallas_scan.make_lane_slab(codes))

    def timeit(fn, reps=5, fetch=lambda o: np.asarray(o)[:1]):
        out = fn()
        fetch(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        fetch(out)
        return (time.perf_counter() - t0) / reps, out

    def run(label, **kw):
        t, out = timeit(lambda: pallas_scan.fused_scan_topk(
            qdev, codes, norms, valid, slab, bits=bits, k=k,
            surface="xla", with_ties=True, **kw),
            fetch=lambda o: np.asarray(o[2][:1]))
        okr = float(np.asarray(out[2]).mean())
        log(f"{label:36s} {t*1e3:8.2f} ms  flag ok-rate {okr:.4f}")
        return out

    base = run("cosine margin 24 (headline)", metric="cosine")
    for m in (64, 512):
        out = run(f"cosine margin {m} (escalation rung)",
                  metric="cosine", tie_margin=m)
        same = np.array_equal(np.asarray(out[1]), np.asarray(base[1]))
        log(f"  rows match margin-24: {same}")
    run("cosine margin 24 exact=True (f32)", metric="cosine", exact=True)
    run("euclidean margin 24", metric="euclidean")
    log("done")


if __name__ == "__main__":
    main()
