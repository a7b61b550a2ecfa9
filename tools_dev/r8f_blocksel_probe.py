"""Round-4 stage-2 probe, part 5: BLOCK-LEVEL selection.

Direct selection top_k over the (Q, nseg) fine minima costs 1.96 ms at
nseg=15744 and ~2.5 ms at 31488 (r8b/r8c).  r8d's two-level (fold 8/16)
LOST because the union gather was per-ELEMENT take_along_axis (each f32
pulls a whole (8,128) tile).  This variant folds by 128 — the ilv
kernel's natural output-block width — so the union gather moves whole
(1, 128) lane rows:

  bmins  = segmins.reshape(Q, nblk, 128).min(-1)       # (Q, ~246)
  cidx   = top_k(-bmins, sp+1) indices                 # tiny
  union  = take_along_axis(segmins.reshape(Q, nblk, 128),
                           cidx[:, :sp, None], 1)      # (Q, sp, 128)
  p      = top_k(-union.reshape(Q, sp*128), s+1) indices
  seg_idx = decode(p via cidx)                          # (Q, s+1)

Soundness of the completeness flag survives because block minima are a
SUBSET of fine minima: the (sp+1)-th block min >= the (sp+1)-th fine
min, so any margin that held with direct selection holds here (bound B =
min(union's (s+1)-th value, the (sp+1)-th block min) — both STORED
values on the f32 surface, so the exact->surface delta bridge drops on
the v_next side entirely).

NOVEL OP PATTERN (lane-block take_along_axis): own process, generous
timeout.
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

    seg = pallas_scan.DEFAULT_SEG
    ilv = pallas_scan.make_ilv_codes(codes)
    jax.block_until_ready(ilv)

    t_surf = timeit(lambda: pallas_scan.segment_min_scan_ilv(
        qdev, ilv, norms, valid, bits=bits, metric=metric))
    print(f"surface alone (seg={seg}): {t_surf*1000:.2f} ms", flush=True)
    if t_surf > 0.018:
        print("PLATFORM DEGRADED — results unreliable", flush=True)

    @functools.partial(jax.jit, static_argnames=("sv",))
    def direct(qd, ilv_, norms_, valid_, sv):
        segm = pallas_scan.segment_min_scan_ilv(
            qd, ilv_, norms_, valid_, bits=bits, metric=metric)
        _, seg_idx = jax.lax.top_k(-segm, sv)
        return seg_idx

    t_dir = timeit(lambda: direct(qdev, ilv, norms, valid, 17))
    print(f"surface + direct top_k(17): {t_dir*1000:.2f} ms "
          f"(selection ~{(t_dir-t_surf)*1000:.2f})", flush=True)

    @functools.partial(jax.jit, static_argnames=("sv", "sp"))
    def blocksel(qd, ilv_, norms_, valid_, sv, sp):
        segm = pallas_scan.segment_min_scan_ilv(
            qd, ilv_, norms_, valid_, bits=bits, metric=metric)
        q, nseg = segm.shape
        nblk = nseg // 128
        seg3 = segm.reshape(q, nblk, 128)
        bmins = jnp.min(seg3, -1)                       # (Q, nblk)
        _, cidx = jax.lax.top_k(-bmins, sp + 1)         # indices-only
        union = jnp.take_along_axis(seg3, cidx[:, :sp, None],
                                    axis=1)             # (Q, sp, 128)
        uf = union.reshape(q, sp * 128)
        _, p = jax.lax.top_k(-uf, sv)                   # (Q, sv)
        blk_of = jnp.take_along_axis(cidx[:, :sp], p // 128, axis=1)
        seg_idx = blk_of * 128 + (p % 128)
        # bound terms: the (sv)th union value and the (sp+1)-th block min
        u_next = jnp.take_along_axis(uf, p[:, -1:], axis=1)
        b_next = jnp.take_along_axis(bmins, cidx[:, -1:], axis=1)
        return seg_idx, jnp.minimum(u_next, b_next)[:, 0]

    for sp in (17, 21, 32):
        try:
            t2 = timeit(lambda s=sp: blocksel(
                qdev, ilv, norms, valid, 17, s),
                fetch=lambda o: np.asarray(o[0][:1, :1]))
            print(f"surface + blocksel(sp={sp}): {t2*1000:.2f} ms "
                  f"(selection ~{(t2-t_surf)*1000:.2f})", flush=True)
        except Exception as exc:
            print(f"blocksel(sp={sp}): FAILED {type(exc).__name__} "
                  f"{str(exc)[:300]}", flush=True)

    # agreement vs direct (by selected minima VALUES, ties may reorder)
    si_d = np.asarray(direct(qdev[:64], ilv, norms, valid, 17))
    si_b, bound = blocksel(qdev[:64], ilv, norms, valid, 17, 21)
    si_b = np.asarray(si_b)
    segm = np.asarray(pallas_scan.segment_min_scan_ilv(
        qdev[:64], ilv, norms, valid, bits=bits, metric=metric))
    vd = np.sort(np.take_along_axis(segm, si_d, 1), 1)
    vb = np.sort(np.take_along_axis(segm, si_b, 1), 1)
    agree = int((vd == vb).all(1).sum())
    print(f"value-set agreement on 64 queries: {agree}/64 "
          f"(max |diff| {np.abs(vd - vb).max():.3e})", flush=True)
    # bound sanity: B must be >= the 17th selected value (it lower-bounds
    # every non-selected segment, and selection was exact top-17 here)
    b_ok = int((np.asarray(bound) >= vb[:, -1] - 1e-12).sum())
    print(f"bound >= 17th selected value on {b_ok}/64", flush=True)
    print("probe done", flush=True)


if __name__ == "__main__":
    main()
