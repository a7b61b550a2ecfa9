"""Round-4 stage-2 probe, part 2 (after r8_stage2_probe's H1 partial).

r8 measured: full pipeline margin8 seg64 = 14.70 ms (69.7k QPS),
surface alone = 9.10 ms => stage 2 = 5.6 ms.  Then crashed: jitted
helpers CLOSED OVER the 384 MB ilv operand, which jax inlined into the
remote-compile request body (HTTP 413).  This version passes every big
operand as an explicit jit argument.

Covers: H1 rest (selection cost, gather+dots cost), H3 subtile sweep,
H2 margin sweep, H4 seg32.  ONE long-lived process (CLAUDE.md).
"""

import functools
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
    import os
    cache = f"/tmp/syzgydb_bench_{n}x{d}_{bits}b.npz"
    blob = np.load(cache)
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

    print("== sanity ==", flush=True)
    slab = pallas_scan.make_lane_slab(codes)
    ilv = pallas_scan.make_ilv_codes(codes)
    jax.block_until_ready((slab, ilv))

    t = timeit(lambda: pallas_scan.fused_scan_topk(
        qdev, codes, norms, valid, slab, ilv, bits=bits, metric=metric,
        k=k, with_ties=True))
    print(f"full pipeline margin8 seg64: {t*1000:.2f} ms "
          f"({q_big/t:.0f} QPS)", flush=True)
    if t > 0.025:
        print("PLATFORM DEGRADED — results unreliable", flush=True)

    t_surf = timeit(lambda: pallas_scan.segment_min_scan_ilv(
        qdev, ilv, norms, valid, bits=bits, metric=metric),
        fetch=lambda o: np.asarray(o[:1, :1]))
    print(f"surface alone: {t_surf*1000:.2f} ms", flush=True)

    @functools.partial(jax.jit, static_argnames=("sv",))
    def surf_sel(qd, ilv_, norms_, valid_, sv):
        segm = pallas_scan.segment_min_scan_ilv(
            qd, ilv_, norms_, valid_, bits=bits, metric=metric)
        _, seg_idx = jax.lax.top_k(-segm, sv)
        return seg_idx

    t_sel = timeit(lambda: surf_sel(qdev, ilv, norms, valid, 19),
                   fetch=lambda o: np.asarray(o[:1, :1]))
    print(f"surface + selection top_k(19): {t_sel*1000:.2f} ms "
          f"(selection ~{(t_sel-t_surf)*1000:.2f})", flush=True)

    @functools.partial(jax.jit, static_argnames=("sv",))
    def surf_sel_gather(qd, ilv_, slab_, norms_, valid_, sv):
        segm = pallas_scan.segment_min_scan_ilv(
            qd, ilv_, norms_, valid_, bits=bits, metric=metric)
        _, seg_idx = jax.lax.top_k(-segm, sv)
        raw = pallas_scan._lane_dots(qd, slab_, seg_idx, 64)
        return raw

    t_g = timeit(lambda: surf_sel_gather(qdev, ilv, slab, norms, valid, 19),
                 fetch=lambda o: np.asarray(o[:1, :1]))
    print(f"surface + sel + lane gather/dots: {t_g*1000:.2f} ms "
          f"(gather+dots ~{(t_g-t_sel)*1000:.2f})", flush=True)
    print(f"=> residual (epilogue+final topk+flag): "
          f"{(t-t_g)*1000:.2f} ms", flush=True)

    # H3: subtile sweep
    for sub in (512, 1024):
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
    pallas_scan._ILV_SUBTILE = 256
    pallas_scan.segment_min_scan_ilv.clear_cache()

    # H2: margin sweep with flag-hold rates on fresh queries
    frng = np.random.default_rng(31337)
    fnoise = frng.standard_normal((4096, d)).astype(np.float32)
    fnoise /= np.linalg.norm(fnoise, axis=1, keepdims=True)
    fresh = db[frng.integers(0, n, size=4096)] + 0.2 * fnoise
    fresh = np.float32(fresh / np.linalg.norm(fresh, axis=1, keepdims=True))
    for margin in (2, 4, 6):
        tm = timeit(lambda m=margin: pallas_scan.fused_scan_topk(
            qdev, codes, norms, valid, slab, ilv, bits=bits, metric=metric,
            k=k, tie_margin=m, with_ties=True))
        held = 0
        for s in range(0, 4096, 1024):
            _, _, ok = pallas_scan.fused_scan_topk(
                jnp.asarray(fresh[s:s+1024]), codes, norms, valid, slab,
                ilv, bits=bits, metric=metric, k=k, tie_margin=margin,
                with_ties=True)
            held += int(np.asarray(ok).sum())
        print(f"margin {margin}: {tm*1000:.2f} ms ({q_big/tm:.0f} QPS), "
              f"flag held {held}/4096", flush=True)

    # H4: seg=32 at small margins
    slab32 = pallas_scan.make_lane_slab(codes, seg=32)
    ilv32 = pallas_scan.make_ilv_codes(codes, seg=32)
    jax.block_until_ready((slab32, ilv32))
    for margin in (4, 8):
        tm = timeit(lambda m=margin: pallas_scan.fused_scan_topk(
            qdev, codes, norms, valid, slab32, ilv32, bits=bits,
            metric=metric, k=k, seg=32, tie_margin=m, with_ties=True))
        _, _, ok = pallas_scan.fused_scan_topk(
            jnp.asarray(fresh[:1024]), codes, norms, valid, slab32, ilv32,
            bits=bits, metric=metric, k=k, seg=32, tie_margin=m,
            with_ties=True)
        print(f"seg32 margin {margin}: {tm*1000:.2f} ms "
              f"({q_big/tm:.0f} QPS), flag held "
              f"{int(np.asarray(ok).sum())}/1024", flush=True)

    print("probe done", flush=True)


if __name__ == "__main__":
    main()
