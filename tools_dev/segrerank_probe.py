"""Probe: sketch-ANN with SEGMENT-level candidate selection.

Instead of gathering the top-`budget` rows by Hamming distance (random-row
gather, measured ~6.5ms/64q), select the top budget/SEG segments by their
MIN hamming distance and rerank whole contiguous SEG-row slabs.  Same
rerank FLOPs, DMA-friendly gathers; the question is recall (a winning
segment drags SEG-1 fillers along, shrinking candidate diversity)."""

import time

import numpy as np


def log(m):
    print(m, flush=True)


def main():
    from syzgydb_tpu.utils.hostmem import tune_host_allocator
    tune_host_allocator()
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from syzgydb_tpu.index.hamming import (SignHashIndex,
                                           _hamming_candidates_xla,
                                           rerank_topk)
    from syzgydb_tpu.ops import distance as dist_ops
    from syzgydb_tpu.ops import pallas_scan
    from syzgydb_tpu.utils.rng import MyRandom

    n, d, bits, metric, k = 1_000_000, 384, 8, "cosine", 10
    blob = np.load(f"/tmp/syzgydb_bench_{n}x{d}_{bits}b.npz")
    db, codes_np, norms_np = blob["db"], blob["codes"], blob["norms"]
    npad = (-n) % 4096
    ntot = n + npad
    codes = jnp.asarray(np.concatenate(
        [codes_np, np.zeros((npad, d), codes_np.dtype)]))
    norms = jnp.asarray(np.concatenate(
        [norms_np, np.zeros(npad, norms_np.dtype)]))
    valid = jnp.asarray(np.arange(ntot) < n)

    rng = np.random.default_rng(5)

    def make_queries(qn):
        base = db[rng.integers(0, n, size=qn)]
        noise = rng.standard_normal((qn, d)).astype(np.float32)
        noise /= np.linalg.norm(noise, axis=1, keepdims=True)
        q = base + 0.2 * noise
        return np.float32(q / np.linalg.norm(q, axis=1, keepdims=True))

    index = SignHashIndex(d, metric, MyRandom(7))
    hashes = index.encode_codes_device(codes, bits)
    jax.block_until_ready(hashes)

    def timeit(fn, reps=15, label=""):
        r = fn()
        np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
        dt = (time.perf_counter() - t0) / reps
        log(f"{label:46s} {dt*1000:8.2f} ms")
        return dt

    import functools

    @functools.partial(jax.jit, static_argnames=("budget", "seg", "words"))
    def ann_seg(qcodes, qdev, codes, norms, hashes, valid, *, budget, seg,
                words):
        q = qcodes.astype(jnp.uint32)
        nn = hashes.shape[0]
        ham = jnp.zeros((q.shape[0], nn), dtype=jnp.int32)
        for w in range(words):
            x = jnp.bitwise_xor(q[:, w][:, None], hashes[None, :, w])
            ham = ham + jax.lax.population_count(x).astype(jnp.int32)
        ham = jnp.where(valid[None, :], ham, jnp.int32(1 << 30))
        segmin = jnp.min(ham.reshape(q.shape[0], nn // seg, seg), axis=-1)
        s = budget // seg
        _, seg_idx = jax.lax.top_k(-segmin, s)
        ccodes = pallas_scan.gather_segments(codes, seg_idx, seg)
        cnorms = pallas_scan.gather_segments(norms, seg_idx, seg)
        cvalid = pallas_scan.gather_segments(valid, seg_idx, seg)
        rows = (seg_idx[:, :, None] * seg +
                jnp.arange(seg, dtype=jnp.int32)[None, None, :]
                ).reshape(seg_idx.shape[0], s * seg)
        dist = pallas_scan._candidate_distances(
            qdev, ccodes, cnorms, cvalid, bits, metric, False)
        neg, pos = jax.lax.top_k(-dist, k)
        return -neg, jnp.take_along_axis(rows, pos, axis=1)

    @functools.partial(jax.jit, static_argnames=("budget", "words"))
    def ann_row(qcodes, qdev, codes, norms, hashes, valid, *, budget, words):
        _, cand = _hamming_candidates_xla(qcodes, hashes, valid, budget,
                                          words)
        return rerank_topk(qdev, codes, norms, valid, cand, bits, metric, k)

    for qn in (64, 256):
        qdev = jnp.asarray(make_queries(qn))
        qcodes = jnp.asarray(index.encode_np(np.asarray(qdev)))
        # f32 truth
        truth = []
        for s0 in range(0, qn, 64):
            dd = dist_ops.score_block(qdev[s0:s0+64], codes, norms, valid,
                                      bits, metric, exact=True)
            _, ti = dist_ops.top_k_smallest(dd, k)
            truth.append(np.asarray(ti))
        truth = np.concatenate(truth)

        def recall(aidx):
            return float(np.mean([
                len(set(truth[i].tolist()) & set(aidx[i].tolist())) / k
                for i in range(qn)]))

        for budget in (2048, 4096):
            dt = timeit(lambda b=budget: ann_row(
                qcodes, qdev, codes, norms, hashes, valid, budget=b,
                words=index.words), 15, f"row-gather  Q={qn} budget={budget}")
            _, ai = ann_row(qcodes, qdev, codes, norms, hashes, valid,
                            budget=budget, words=index.words)
            log(f"  recall={recall(np.asarray(ai)):.4f} qps={qn/dt:.0f}")
            for seg in (16, 32):
                dt = timeit(lambda b=budget, sg=seg: ann_seg(
                    qcodes, qdev, codes, norms, hashes, valid, budget=b,
                    seg=sg, words=index.words), 15,
                    f"seg-gather  Q={qn} budget={budget} seg={seg}")
                _, ai = ann_seg(qcodes, qdev, codes, norms, hashes, valid,
                                budget=budget, seg=seg, words=index.words)
                log(f"  recall={recall(np.asarray(ai)):.4f} qps={qn/dt:.0f}")
    log("done")


if __name__ == "__main__":
    main()
