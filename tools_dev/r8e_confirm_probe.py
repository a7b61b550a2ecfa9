"""Round-4 confirmation probe: the production stage-2 configuration.

Changes under test (vs r3.7): DEFAULT_SEG 64->32, _ILV_SUBTILE 256->4096
(auto-scaled by _ilv_subtile to bound the VMEM live slice), f32 default
tie margin 8->6.  Validates on the REAL production entry
(fused_scan_topk with defaults): headline timing, flag-hold on 4096
fresh queries, the Q=2048 subtile-2048 shape, and the large-k radius
shape (Q=8, k=1024, margin 64).
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

    seg = pallas_scan.DEFAULT_SEG
    print(f"production defaults: seg={seg}, "
          f"margin={pallas_scan.default_tie_margin(True)}, "
          f"subtile(q=1024)={pallas_scan._ilv_subtile(1024, 128*seg)}",
          flush=True)
    slab = pallas_scan.make_lane_slab(codes)
    ilv = pallas_scan.make_ilv_codes(codes)
    jax.block_until_ready((slab, ilv))

    t = timeit(lambda: pallas_scan.fused_scan_topk(
        qdev, codes, norms, valid, slab, ilv, bits=bits, metric=metric,
        k=k, with_ties=True))
    print(f"headline (defaults): {t*1000:.2f} ms ({q_big/t:.0f} QPS)",
          flush=True)

    # flag-hold on 4096 fresh queries at the new default margin
    frng = np.random.default_rng(31337)
    fnoise = frng.standard_normal((4096, d)).astype(np.float32)
    fnoise /= np.linalg.norm(fnoise, axis=1, keepdims=True)
    fresh = db[frng.integers(0, n, size=4096)] + 0.2 * fnoise
    fresh = np.float32(fresh / np.linalg.norm(fresh, axis=1, keepdims=True))
    held = 0
    for s0 in range(0, 4096, 1024):
        _, _, ok = pallas_scan.fused_scan_topk(
            jnp.asarray(fresh[s0:s0+1024]), codes, norms, valid, slab, ilv,
            bits=bits, metric=metric, k=k, with_ties=True)
        held += int(np.asarray(ok).sum())
    print(f"flag held {held}/4096 at default margin", flush=True)

    # Q=2048: _ilv_subtile drops to 2048 — compile + run + spot parity
    q2 = jnp.concatenate([qdev, qdev])
    d2, r2, ok2 = pallas_scan.fused_scan_topk(
        q2, codes, norms, valid, slab, ilv, bits=bits, metric=metric,
        k=k, with_ties=True)
    d1, r1, _ = pallas_scan.fused_scan_topk(
        qdev, codes, norms, valid, slab, ilv, bits=bits, metric=metric,
        k=k, with_ties=True)
    same = bool(np.array_equal(np.asarray(r2[:q_big]), np.asarray(r1)))
    print(f"Q=2048 runs, rows match Q=1024 dispatch: {same}, "
          f"flag held {int(np.asarray(ok2).sum())}/2048", flush=True)

    # large-k radius shape
    t8 = timeit(lambda: pallas_scan.fused_scan_topk(
        qdev[:8], codes, norms, valid, slab, ilv, bits=bits, metric=metric,
        k=1024, tie_margin=64, with_ties=True), reps=5)
    print(f"radius shape Q=8 k=1024 margin64: {t8*1000:.2f} ms/dispatch",
          flush=True)

    # exact mode (XLA surface) unchanged
    te = timeit(lambda: pallas_scan.fused_scan_topk(
        qdev[:64], codes, norms, valid, slab, None, bits=bits,
        metric=metric, k=k, exact=True, with_ties=True), reps=3)
    print(f"exact mode Q=64: {te*1000:.2f} ms", flush=True)
    print("probe done", flush=True)


if __name__ == "__main__":
    main()
