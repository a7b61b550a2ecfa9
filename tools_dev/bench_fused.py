# NOTE (r4): segment_min_scan / surface="kernel" moved to
# tools_dev/superseded_kernels.py; re-point imports before re-running.
"""Benchmark the fused streaming-top-k scan kernel on the real TPU."""

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
    from syzgydb_tpu.ops import distance as dist_ops
    from syzgydb_tpu.ops import pallas_scan

    n, d, bits, metric, k, q_batch = 1_000_000, 384, 8, "cosine", 10, 64
    blob = np.load(f"/tmp/syzgydb_bench_{n}x{d}_{bits}b.npz")
    queries = blob["queries"]
    codes_np, norms_np = blob["codes"], blob["norms"]

    block = 4096
    npad = (-n) % block
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

    # reference: current two-dispatch pipeline
    def pipeline():
        dd = dist_ops.score_block(qdev, codes, norms, valid, bits, metric)
        return dist_ops.top_k_smallest(dd, k)

    timeit(pipeline, reps=20, label="XLA score+topk pipeline [current]")

    # kernel-only (no rerank) to see the scan floor
    timeit(lambda: pallas_scan.segment_min_scan(
        qdev, codes, norms, valid, bits=bits, metric=metric, block_n=4096,
        seg=64), reps=20, label="segmin kernel only")

    for bn, seg in ((4096, 64),):
        if ntot % bn:
            continue
        timeit(lambda bn=bn, seg=seg: pallas_scan.fused_scan_topk(
            qdev, codes, norms, valid, bits=bits, metric=metric, k=k,
            block_n=bn, seg=seg),
            reps=20, label=f"fused segmin block={bn} seg={seg}")

    # single-query latency shape (Q=1 path, REST single search)
    q1 = qdev[:1]
    timeit(lambda: pallas_scan.fused_scan_topk(
        q1, codes, norms, valid, bits=bits, metric=metric, k=k,
        block_n=4096), reps=20, label="fused Q=1")

    def pipeline1():
        dd = dist_ops.score_block(q1, codes, norms, valid, bits, metric)
        return dist_ops.top_k_smallest(dd, k)

    timeit(pipeline1, reps=20, label="XLA pipeline Q=1")

    # correctness vs XLA oracle on the real chip
    dd = dist_ops.score_block(qdev, codes, norms, valid, bits, metric)
    rv, ri = dist_ops.top_k_smallest(dd, k)
    fv, fi = pallas_scan.fused_scan_topk(qdev, codes, norms, valid, bits=bits,
                                         metric=metric, k=k, block_n=4096)
    rv, ri, fv, fi = (np.asarray(x) for x in (rv, ri, fv, fi))
    same = np.mean([len(set(ri[i]) & set(fi[i])) / k for i in range(q_batch)])
    log(f"index agreement vs XLA: {same:.4f}")
    log(f"max |dist diff|: {np.abs(rv - fv).max():.2e}")

    # exact=True variant (f32 HIGHEST matmul)
    timeit(lambda: pallas_scan.fused_scan_topk(
        qdev, codes, norms, valid, bits=bits, metric=metric, k=k,
        block_n=4096, exact=True), reps=10, label="fused exact=True (f32)")

    # ---- ANN path stages -------------------------------------------------
    from syzgydb_tpu.index.hamming import (SignHashIndex,
                                           _hamming_candidates_xla,
                                           rerank_topk)
    from syzgydb_tpu.ops import pallas_hamming
    from syzgydb_tpu.utils.rng import MyRandom

    index = SignHashIndex(d, metric, MyRandom(7))
    hashes = index.encode_codes_device(codes, bits)
    jax.block_until_ready(hashes)
    qcodes = jnp.asarray(index.encode_np(queries)).astype(jnp.uint32)
    budget = 2048

    timeit(lambda: pallas_hamming.hamming_scores(
        qcodes, hashes, words=index.words), reps=20,
        label="hamming surface uint8 (kernel only)")
    timeit(lambda: pallas_hamming.hamming_scores_bf16(
        qcodes, hashes, valid, words=index.words), reps=20,
        label="hamming surface bf16 (kernel only)")

    @jax.jit
    def ann_u8(qcodes):
        ham8 = pallas_hamming.hamming_scores(qcodes, hashes,
                                             words=index.words)
        ham8 = jnp.where(valid[None, :], ham8, jnp.uint8(255))
        return jax.lax.approx_min_k(ham8.astype(jnp.float32), budget,
                                    recall_target=0.95)

    @jax.jit
    def ann_bf16(qcodes):
        ham = pallas_hamming.hamming_scores_bf16(qcodes, hashes, valid,
                                                 words=index.words)
        return jax.lax.approx_min_k(ham, budget, recall_target=0.95)

    timeit(lambda: ann_u8(qcodes), reps=20,
           label="candidates uint8->f32 approx_min_k")
    timeit(lambda: ann_bf16(qcodes), reps=20,
           label="candidates bf16 approx_min_k")
    timeit(lambda: _hamming_candidates_xla(qcodes, hashes, valid, budget,
                                           index.words), reps=20,
           label="candidates XLA per-word loop")

    _, cand = ann_bf16(qcodes)
    jax.block_until_ready(cand)
    timeit(lambda: rerank_topk(qdev, codes, norms, valid, cand, bits, metric,
                               k), reps=20, label="rerank gather+topk")

    def ann_end2end(fn):
        _, cc = fn(qcodes)
        return rerank_topk(qdev, codes, norms, valid, cc, bits, metric, k)

    timeit(lambda: ann_end2end(ann_bf16), reps=20, label="ANN end2end bf16")
    timeit(lambda: ann_end2end(ann_u8), reps=20, label="ANN end2end uint8")

    # agreement of the two candidate paths
    _, c1 = ann_u8(qcodes)
    _, c2 = ann_bf16(qcodes)
    c1, c2 = np.asarray(c1), np.asarray(c2)
    ag = np.mean([len(set(c1[i]) & set(c2[i])) / budget
                  for i in range(q_batch)])
    log(f"candidate agreement uint8 vs bf16: {ag:.4f}")

    log("done")


if __name__ == "__main__":
    main()
