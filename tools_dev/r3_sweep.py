# NOTE (r4): segment_min_scan / surface="kernel" moved to
# tools_dev/superseded_kernels.py; re-point imports before re-running.
"""Round-2 sweep #3: dispatch-overhead floor, batch-size scaling, and ANN
candidate-path variants — picks the production configuration by measurement."""

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
    from syzgydb_tpu.index.hamming import (SignHashIndex,
                                           _hamming_candidates_xla,
                                           rerank_topk)
    from syzgydb_tpu.ops import distance as dist_ops
    from syzgydb_tpu.ops import pallas_hamming, pallas_scan
    from syzgydb_tpu.utils.rng import MyRandom

    n, d, bits, metric, k = 1_000_000, 384, 8, "cosine", 10
    blob = np.load(f"/tmp/syzgydb_bench_{n}x{d}_{bits}b.npz")
    queries64, codes_np, norms_np = (blob["queries"], blob["codes"],
                                     blob["norms"])
    db = blob["db"]

    npad = (-n) % 4096
    ntot = n + npad
    codes_np = np.concatenate([codes_np, np.zeros((npad, d), codes_np.dtype)])
    norms_np = np.concatenate([norms_np, np.zeros(npad, norms_np.dtype)])
    valid_np = np.zeros(ntot, dtype=bool)
    valid_np[:n] = True

    rng = np.random.default_rng(5)

    def make_queries(qn):
        base = db[rng.integers(0, n, size=qn)]
        noise = rng.standard_normal((qn, d)).astype(np.float32)
        noise /= np.linalg.norm(noise, axis=1, keepdims=True)
        q = base + 0.2 * noise
        return np.float32(q / np.linalg.norm(q, axis=1, keepdims=True))

    log(f"upload {ntot}x{d}")
    codes = jnp.asarray(codes_np)
    norms = jnp.asarray(norms_np)
    valid = jnp.asarray(valid_np)

    def timeit(fn, reps=20, label=""):
        try:
            r = fn()
            np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn()
            np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
            dt = (time.perf_counter() - t0) / reps
            log(f"{label:56s} {dt*1000:8.2f} ms")
            return dt
        except Exception as e:
            log(f"{label:56s} FAILED {type(e).__name__}: {str(e)[:160]}")
            return float("nan")

    # ---- dispatch-overhead floor ------------------------------------------
    tiny = jnp.zeros((8, 128), jnp.float32)
    f_tiny = jax.jit(lambda x: x * 2.0 + 1.0)
    timeit(lambda: f_tiny(tiny), 50, "trivial dispatch (overhead floor)")

    # ---- batch scaling: exact pipeline ------------------------------------
    for qn in (64, 256, 1024):
        qdev = jnp.asarray(make_queries(qn))

        def pipe(qdev=qdev):
            dd = dist_ops.score_block(qdev, codes, norms, valid, bits, metric)
            return dist_ops.top_k_smallest(dd, k)

        dt = timeit(pipe, 10, f"exact pipeline Q={qn}")
        log(f"  -> {qn/dt:.0f} QPS")

    # direct surface + approx_min_k (no sketch, no rerank): medium candidate
    @jax.jit
    def direct(qdev, codes, norms, valid):
        surf = pallas_scan.score_surface(qdev, codes, norms, valid,
                                         bits=bits, metric=metric)
        return jax.lax.approx_min_k(surf.astype(jnp.float32), k,
                                    recall_target=0.95)

    for qn in (64, 256):
        qdev = jnp.asarray(make_queries(qn))
        dt = timeit(lambda qdev=qdev: direct(qdev, codes, norms, valid),
                    10, f"surface+approx_min_k Q={qn}")
        log(f"  -> {qn/dt:.0f} QPS")

    # fused segment-min paths at larger Q (surface traffic dominates there)
    for qn, surf_kind in ((256, "xla"), (256, "kernel"), (1024, "xla")):
        qdev = jnp.asarray(make_queries(qn))
        dt = timeit(lambda qdev=qdev, sk=surf_kind: pallas_scan.fused_scan_topk(
            qdev, codes, norms, valid, bits=bits, metric=metric, k=k,
            seg=32, surface=sk), 10, f"fused {surf_kind}-surface Q={qn}")
        log(f"  -> {qn/dt:.0f} QPS")

    # ---- ANN candidate variants -------------------------------------------
    index = SignHashIndex(d, metric, MyRandom(7))
    hashes = index.encode_codes_device(codes, bits)
    jax.block_until_ready(hashes)
    budget = 2048

    def rr(cand, qdev, codes, norms, valid):
        return rerank_topk(qdev, codes, norms, valid, cand, bits, metric, k)

    @jax.jit
    def v_xla(qcodes, qdev, codes, norms, valid, hashes):
        _, cand = _hamming_candidates_xla(qcodes, hashes, valid, budget,
                                          index.words)
        return rr(cand, qdev, codes, norms, valid)

    @jax.jit
    def v_bf16(qcodes, qdev, codes, norms, valid, hashes):
        ham = pallas_hamming.hamming_scores_bf16(
            qcodes, hashes, valid, words=index.words)
        _, cand = jax.lax.approx_min_k(ham, budget, recall_target=0.95)
        return rr(cand, qdev, codes, norms, valid)

    @jax.jit
    def v_bf16_f32sel(qcodes, qdev, codes, norms, valid, hashes):
        ham = pallas_hamming.hamming_scores_bf16(
            qcodes, hashes, valid, words=index.words)
        _, cand = jax.lax.approx_min_k(ham.astype(jnp.float32), budget,
                                       recall_target=0.95)
        return rr(cand, qdev, codes, norms, valid)

    @jax.jit
    def v_f32(qcodes, qdev, codes, norms, valid, hashes):
        ham = pallas_hamming.hamming_scores_bf16(
            qcodes, hashes, valid, words=index.words,
            out_dtype=jnp.float32)
        _, cand = jax.lax.approx_min_k(ham, budget, recall_target=0.95)
        return rr(cand, qdev, codes, norms, valid)

    def variants(qn):
        qdev = jnp.asarray(make_queries(qn))
        qcodes = jnp.asarray(index.encode_np(np.asarray(qdev))).astype(
            jnp.uint32)

        for name, fn in (("xla-loop", v_xla), ("bf16-surface", v_bf16),
                         ("bf16->f32-select", v_bf16_f32sel),
                         ("f32-surface", v_f32)):
            dt = timeit(lambda fn=fn, q1=qcodes, q2=qdev: fn(
                q1, q2, codes, norms, valid, hashes), 10,
                f"ANN {name} Q={qn}")
            if dt == dt:
                log(f"  -> {qn/dt:.0f} QPS")

    variants(64)
    variants(256)
    log("done")


if __name__ == "__main__":
    main()
