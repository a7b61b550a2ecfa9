"""Profile the exact-scan and ANN hot paths on the real TPU (VERDICT r1 #2).

Times each pipeline STAGE as its own (pre-jitted) dispatch.  Key insight to
validate: per-dispatch tunnel overhead may dominate small ops — so measure
the dispatch floor first, and measure ops both solo and chained.

Run (single-tenant TPU; background-task mechanism):
    PYTHONPATH=. python tools_dev/profile_scan.py
"""

import functools
import time

import numpy as np


def log(m):
    print(m, flush=True)


def main():
    from syzgydb_tpu.utils.hostmem import tune_host_allocator
    tune_host_allocator()
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    from syzgydb_tpu.index.hamming import SignHashIndex, rerank_topk
    from syzgydb_tpu.ops import distance as dist_ops
    from syzgydb_tpu.ops import pallas_hamming
    from syzgydb_tpu.utils.rng import MyRandom

    n, d, bits, metric, k, q_batch = 1_000_000, 384, 8, "cosine", 10, 64
    blob = np.load(f"/tmp/syzgydb_bench_{n}x{d}_{bits}b.npz")
    queries = blob["queries"]
    codes_np, norms_np = blob["codes"], blob["norms"]
    valid_np = np.ones(n, dtype=bool)

    log(f"upload {n}x{d}")
    codes = jnp.asarray(codes_np)
    norms = jnp.asarray(norms_np)
    valid = jnp.asarray(valid_np)
    qdev = jnp.asarray(queries)

    def timeit(fn, reps=20, label=""):
        try:
            r = fn()
            np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn()
            np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
            dt = (time.perf_counter() - t0) / reps
            log(f"{label:52s} {dt*1000:8.2f} ms")
            return dt
        except Exception as e:
            log(f"{label:52s} FAILED {type(e).__name__}: {e}")
            return float("nan")

    # ---- T0: dispatch floor -------------------------------------------------
    tiny = jnp.ones((8, 128), jnp.float32)

    @jax.jit
    def bump(x):
        return x + 1.0

    timeit(lambda: bump(tiny), reps=50, label="T0 dispatch floor (tiny add)")

    # ---- T1: surface write, solo vs chained ---------------------------------
    timeit(lambda: dist_ops.score_block(
        qdev, codes, norms, valid, bits, metric), reps=1,
        label="T1a score_block reps=1")
    timeit(lambda: dist_ops.score_block(
        qdev, codes, norms, valid, bits, metric), reps=20,
        label="T1b score_block reps=20 (async overlap)")

    dist = dist_ops.score_block(qdev, codes, norms, valid, bits, metric)
    dist.block_until_ready()

    timeit(lambda: dist_ops.top_k_smallest(dist, k), reps=20,
           label="T2a flat top_k(10) on held surface")

    # the actual production pipeline (two chained dispatches per rep)
    def pipeline():
        dd = dist_ops.score_block(qdev, codes, norms, valid, bits, metric)
        return dist_ops.top_k_smallest(dd, k)

    timeit(pipeline, reps=20, label="T2b pipeline score+topk [bench shape]")

    @jax.jit
    def min_only(x):
        return jnp.min(x, axis=1)

    timeit(lambda: min_only(dist), reps=20, label="T2c min-reduce on surface")

    fb, fi = dist_ops.top_k_smallest(dist, k)
    fi.block_until_ready()

    # ---- T3: ANN stages (padded so the Pallas kernel engages) ---------------
    index = SignHashIndex(d, metric, MyRandom(7))
    hashes = index.encode_codes_device(codes, bits)
    hashes.block_until_ready()
    qcodes = jnp.asarray(index.encode_np(queries))
    budget = 2048

    npad = (-n) % 4096
    ntot = n + npad
    hpad = jnp.concatenate(
        [hashes, jnp.zeros((npad, index.words), jnp.uint32)])
    vpad = jnp.concatenate([valid, jnp.zeros((npad,), bool)])
    hpad.block_until_ready()

    timeit(lambda: pallas_hamming.hamming_scores(
        qcodes.astype(jnp.uint32), hpad, words=index.words, block_n=4096),
        label="T3a pallas hamming surface (padded)")

    from syzgydb_tpu.index.hamming import _hamming_candidates_xla
    timeit(lambda: _hamming_candidates_xla(qcodes, hashes, valid, budget,
                                           index.words),
           reps=10, label="T3b XLA word-loop + approx sel [r1 bench path]")

    ham8 = pallas_hamming.hamming_scores(qcodes.astype(jnp.uint32), hpad,
                                         words=index.words, block_n=4096)
    ham8.block_until_ready()

    # ---- T4: selection variants on held uint8 surface ------------------------
    @functools.partial(jax.jit, static_argnames=("b", "rt"))
    def sel_approx_f32(ham8, valid, b, rt=0.95):
        h = jnp.where(valid[None, :], ham8, jnp.uint8(255))
        return jax.lax.approx_min_k(h.astype(jnp.float32), b,
                                    recall_target=rt)

    timeit(lambda: sel_approx_f32(ham8, vpad, budget), reps=10,
           label="T4a approx_min_k(2048) f32 rt=.95 [current]")
    timeit(lambda: sel_approx_f32(ham8, vpad, budget, 0.999), reps=10,
           label="T4b approx_min_k(2048) f32 rt=.999")

    @functools.partial(jax.jit, static_argnames=("b",))
    def sel_exact_int(ham8, valid, b):
        h = jnp.where(valid[None, :], ham8, jnp.uint8(255)).astype(jnp.int32)
        neg, idx = jax.lax.top_k(-h, b)
        return -neg, idx

    timeit(lambda: sel_exact_int(ham8, vpad, budget), reps=5,
           label="T4c flat exact top_k(2048) int32")

    # ---- T5: rerank scaling ---------------------------------------------------
    _, cand_cur = sel_approx_f32(ham8, vpad, budget)
    cand_cur.block_until_ready()
    for b in (512, 2048, 8192):
        _, cb = sel_approx_f32(ham8, vpad, b)
        cb.block_until_ready()
        timeit(lambda cb=cb: rerank_topk(qdev, codes, norms, valid, cb, bits,
                                         metric, k),
               reps=10, label=f"T5 gather+rerank({b})")

    # ANN production pipeline end-to-end (3 dispatches)
    def ann_pipeline():
        h8 = pallas_hamming.hamming_scores(qcodes.astype(jnp.uint32), hpad,
                                           words=index.words, block_n=4096)
        _, cc = sel_approx_f32(h8, vpad, budget)
        return rerank_topk(qdev, codes, norms, valid, cc, bits, metric, k)

    timeit(ann_pipeline, reps=10, label="T6 ANN pipeline pallas+sel+rerank")

    # ---- T7: recall attribution ------------------------------------------------
    eidx = np.sort(np.asarray(fi), axis=1)

    def recall_of(rows):
        rows = np.asarray(rows)
        return float(np.mean([
            len(set(eidx[i].tolist()) & set(rows[i].tolist())) / k
            for i in range(q_batch)]))

    def final_recall(cand):
        _, rows = rerank_topk(qdev, codes, norms, valid, cand, bits, metric,
                              k)
        return recall_of(rows)

    try:
        log(f"R sel=approx f32 rt=.95 b=2048 [current]: "
            f"{final_recall(cand_cur):.4f}")
        _, c2 = sel_exact_int(ham8, vpad, budget)
        log(f"R sel=exact top_k b=2048:                 {final_recall(c2):.4f}")
        _, c3 = sel_approx_f32(ham8, vpad, budget, 0.999)
        log(f"R sel=approx rt=.999 b=2048:              {final_recall(c3):.4f}")
        for b in (8192, 32768):
            _, cb = sel_exact_int(ham8, vpad, b)
            log(f"R sel=exact b={b}:                    {final_recall(cb):.4f}")
    except Exception as e:
        log(f"recall attribution failed: {e}")

    log("done")


if __name__ == "__main__":
    main()
