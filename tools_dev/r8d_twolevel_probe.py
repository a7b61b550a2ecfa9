"""Round-4 stage-2 probe, part 4: TWO-LEVEL segment selection.

The direct selection top_k(19) over the (1024, 15744) segment minima
costs 1.92 ms (r8b).  Two-level: fold the minima by `fold` into coarse
blocks, top_k(sp) over the ~2k coarse mins (indices-only — the fast
lowering), gather the selected blocks' fine minima (sp*fold values per
query, take_along_axis), and a SMALL top_k picks the sv segments.

Selection no longer returns the global top-sv segments — the flag must
cover two escape routes (see the production integration): the best
non-selected fine min within covered blocks (the (s+1)-th of the union)
and the (sp+1)-th coarse min (bounds every uncovered block).  This probe
measures TIME and the set agreement vs direct selection; hold rates come
with the integration.

NOVEL OP PATTERN (per-row take_along_axis from a (1024, 15744) array):
one pattern per process, generous timeout — a bad lowering can hang the
remote Mosaic/XLA compiler (CLAUDE.md).
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

    n, d, bits, metric = 1_000_000, 384, 8, "cosine"
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
        fetch = fetch or (lambda o: np.asarray(o[:1, :1]))
        fetch(fn())
        t0 = time.perf_counter()
        out = [fn() for _ in range(reps)]
        fetch(out[-1])
        return (time.perf_counter() - t0) / reps

    pallas_scan._ILV_SUBTILE = 4096  # r8c: 7.06 ms surface vs 9.17 at 256
    ilv = pallas_scan.make_ilv_codes(codes)
    jax.block_until_ready(ilv)

    t_surf = timeit(lambda: pallas_scan.segment_min_scan_ilv(
        qdev, ilv, norms, valid, bits=bits, metric=metric))
    print(f"surface alone (subtile {pallas_scan._ILV_SUBTILE}): "
          f"{t_surf*1000:.2f} ms", flush=True)
    if t_surf > 0.018:
        print("PLATFORM DEGRADED — results unreliable", flush=True)

    @functools.partial(jax.jit, static_argnames=("sv",))
    def direct(qd, ilv_, norms_, valid_, sv):
        segm = pallas_scan.segment_min_scan_ilv(
            qd, ilv_, norms_, valid_, bits=bits, metric=metric)
        _, seg_idx = jax.lax.top_k(-segm, sv)
        return seg_idx

    t_dir = timeit(lambda: direct(qdev, ilv, norms, valid, 19))
    print(f"surface + direct top_k(19): {t_dir*1000:.2f} ms "
          f"(selection ~{(t_dir-t_surf)*1000:.2f})", flush=True)

    @functools.partial(jax.jit, static_argnames=("sv", "sp", "fold"))
    def twolevel(qd, ilv_, norms_, valid_, sv, sp, fold):
        segm = pallas_scan.segment_min_scan_ilv(
            qd, ilv_, norms_, valid_, bits=bits, metric=metric)
        q, nseg = segm.shape
        coarse = jnp.min(segm.reshape(q, nseg // fold, fold), -1)
        _, cidx = jax.lax.top_k(-coarse, sp)          # indices-only
        g = (cidx[:, :, None] * fold +
             jnp.arange(fold, dtype=cidx.dtype)[None, None, :]
             ).reshape(q, sp * fold)
        u = jnp.take_along_axis(segm, g, axis=1)      # (Q, sp*fold)
        _, p = jax.lax.top_k(-u, sv)                  # small
        return jnp.take_along_axis(g, p, axis=1)

    for fold, sp in ((8, 23), (8, 19), (16, 23)):
        try:
            t2 = timeit(lambda f=fold, s=sp: twolevel(
                qdev, ilv, norms, valid, 19, s, f))
            print(f"surface + twolevel(fold={fold}, sp={sp}): "
                  f"{t2*1000:.2f} ms (selection ~{(t2-t_surf)*1000:.2f})",
                  flush=True)
        except Exception as exc:
            print(f"twolevel(fold={fold}, sp={sp}): FAILED "
                  f"{type(exc).__name__} {str(exc)[:200]}", flush=True)

    # set agreement vs direct on a few queries (ties allowed to differ:
    # compare the MINIMA VALUES at the selected segments instead of ids)
    si_d = np.asarray(direct(qdev[:64], ilv, norms, valid, 19))
    si_2 = np.asarray(twolevel(qdev[:64], ilv, norms, valid, 19, 23, 8))
    segm = np.asarray(pallas_scan.segment_min_scan_ilv(
        qdev[:64], ilv, norms, valid, bits=bits, metric=metric))
    vd = np.sort(np.take_along_axis(segm, si_d, 1), 1)
    v2 = np.sort(np.take_along_axis(segm, si_2, 1), 1)
    agree = int((vd == v2).all(1).sum())
    print(f"value-set agreement on 64 queries: {agree}/64 "
          f"(max |diff| {np.abs(vd - v2).max():.3e})", flush=True)
    print("probe done", flush=True)


if __name__ == "__main__":
    main()
