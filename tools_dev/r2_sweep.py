# NOTE (r4): segment_min_scan / surface="kernel" moved to
# tools_dev/superseded_kernels.py; re-point imports before re-running.
"""Round-2 consolidated TPU measurements: XLA-surface fused scan, bf16 ANN
end-to-end, and the sketch-width recall sweep (VERDICT items 2 and 4)."""

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
    from syzgydb_tpu.index.hamming import (SignHashIndex, hamming_candidates,
                                           rerank_topk)
    from syzgydb_tpu.ops import distance as dist_ops
    from syzgydb_tpu.ops import pallas_scan
    from syzgydb_tpu.utils.rng import MyRandom

    n, d, bits, metric, k, q_batch = 1_000_000, 384, 8, "cosine", 10, 64
    blob = np.load(f"/tmp/syzgydb_bench_{n}x{d}_{bits}b.npz")
    queries, codes_np, norms_np = blob["queries"], blob["codes"], blob["norms"]

    npad = (-n) % 4096
    ntot = n + npad
    codes_np = np.concatenate([codes_np, np.zeros((npad, d), codes_np.dtype)])
    norms_np = np.concatenate([norms_np, np.zeros(npad, norms_np.dtype)])
    valid_np = np.zeros(ntot, dtype=bool)
    valid_np[:n] = True

    log(f"upload {ntot}x{d}")
    codes = jnp.asarray(codes_np)
    norms = jnp.asarray(norms_np)
    valid = jnp.asarray(valid_np)
    qdev = jnp.asarray(queries)
    q1 = qdev[:1]

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
            log(f"{label:52s} FAILED {type(e).__name__}: {str(e)[:200]}")
            return float("nan")

    # ---- exact scan: XLA pipeline vs XLA-surface fused --------------------
    def pipeline():
        dd = dist_ops.score_block(qdev, codes, norms, valid, bits, metric)
        return dist_ops.top_k_smallest(dd, k)

    timeit(pipeline, 20, "XLA score+topk pipeline [old]")
    timeit(lambda: pallas_scan.score_surface(
        qdev, codes, norms, valid, bits=bits, metric=metric),
        20, "score_surface kernel only")
    for seg in (32, 64):
        timeit(lambda seg=seg: pallas_scan.fused_scan_topk(
            qdev, codes, norms, valid, bits=bits, metric=metric, k=k,
            seg=seg, surface="kernel"), 20, f"fused kernel-surface seg={seg}")
    timeit(lambda: pallas_scan.fused_scan_topk(
        q1, codes, norms, valid, bits=bits, metric=metric, k=k,
        surface="kernel"), 20, "fused kernel-surface Q=1")

    # correctness vs pipeline
    rv, ri = pipeline()
    fv, fi = pallas_scan.fused_scan_topk(qdev, codes, norms, valid, bits=bits,
                                         metric=metric, k=k,
                                         surface="kernel")
    rv, ri, fv, fi = (np.asarray(x) for x in (rv, ri, fv, fi))
    same = np.mean([len(set(ri[i]) & set(fi[i])) / k for i in range(q_batch)])
    log(f"fused-xla index agreement vs pipeline: {same:.4f} "
        f"max|dv|={np.abs(rv - fv).max():.2e}")

    # exact top-k oracle rows for recall
    eidx = ri

    def recall_of(aidx):
        return float(np.mean([
            len(set(eidx[i].tolist()) & set(aidx[i].tolist())) / k
            for i in range(q_batch)]))

    # ---- ANN end-to-end + sketch width sweep ------------------------------
    budget = 2048
    for tables, bpt, tag in ((5, 32, "160b (default)"), (7, 32, "224b"),
                             (6, 32, "192b")):
        index = SignHashIndex(d, metric, MyRandom(7), tables, bpt)
        hashes = index.encode_codes_device(codes, bits)
        jax.block_until_ready(hashes)
        qcodes = jnp.asarray(index.encode_np(queries))

        def ann():
            _, cand = hamming_candidates(qcodes, hashes, valid, budget,
                                         index.words)
            return rerank_topk(qdev, codes, norms, valid, cand, bits,
                               metric, k)

        dt = timeit(ann, 20, f"ANN e2e sketch={tag}")
        _, aidx = ann()
        rec = recall_of(np.asarray(aidx))
        log(f"  recall@10={rec:.4f}  qps={q_batch/dt:.0f}")
        # single query latency on the default width
        if tables == 5:
            qc1 = qcodes[:1]

            def ann1():
                _, cand = hamming_candidates(qc1, hashes, valid, budget,
                                             index.words)
                return rerank_topk(q1, codes, norms, valid, cand, bits,
                                   metric, k)

            timeit(ann1, 20, "ANN e2e Q=1 (160b)")

    log("done")


if __name__ == "__main__":
    main()
