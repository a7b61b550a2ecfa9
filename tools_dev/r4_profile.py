"""Round-4 headline-batch stage breakdown (VERDICT r2 next-step 2).

Times each stage of the precision="high" pipeline at the headline shape
(1M x 384, 8-bit cosine, batch 1024) on the real chip, pipelined-block
timing with a final value fetch (block_until_ready under-reports through
the axon tunnel).  Also sweeps the ANN path across batch sizes to locate
the index-vs-scan crossover empirically (BASELINE.md r3 table).

Run alone (single-tenant TPU): python tools_dev/r4_profile.py
"""

import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


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
    from syzgydb_tpu.ops import quantize as qz
    from syzgydb_tpu.utils.rng import MyRandom

    n, d, bits, metric, k = 1_000_000, 384, 8, "cosine", 10
    rng = np.random.default_rng(12345)
    import os
    cache = f"/tmp/syzgydb_bench_{n}x{d}_{bits}b.npz"
    if os.path.exists(cache):
        blob = np.load(cache)
        db, codes_np, norms_np = blob["db"], blob["codes"], blob["norms"]
    else:
        log("generating")
        n_clusters = 4096
        centers = rng.standard_normal((n_clusters, d), dtype=np.float32)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        assign = rng.integers(0, n_clusters, size=n)
        spread = rng.standard_normal((n, d), dtype=np.float32)
        spread /= np.linalg.norm(spread, axis=1, keepdims=True)
        db = centers[assign] + 0.35 * spread
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        codes_np = qz.codes_to_device_repr(db, bits)
        norms_np = dist_ops.db_row_stats(codes_np, bits)
        np.savez(cache, db=db, queries=db[:64], codes=codes_np,
                 norms=norms_np)

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

    index = SignHashIndex(d, metric, MyRandom(7))
    hashes = index.encode_codes_device(codes, bits)
    jax.block_until_ready(hashes)
    qc_all = jnp.asarray(index.encode_np(queries))

    def timeit(fn, reps=10, fetch=lambda o: np.asarray(o[:1, :1])):
        fetch(fn())
        t0 = time.perf_counter()
        out = [fn() for _ in range(reps)]
        fetch(out[-1])
        return (time.perf_counter() - t0) / reps

    seg = 32
    log("== high pipeline stages (batch 1024, seg=32) ==")
    t_surf = timeit(lambda: pallas_scan.segment_min_scan_xla(
        qdev, codes, norms, valid, bits=bits, metric=metric, seg=seg))
    log(f"segmin surface alone:        {t_surf*1e3:8.2f} ms")

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def surf_topk(q, c, nr, v):
        sm = pallas_scan.segment_min_scan_xla(q, c, nr, v, bits=bits,
                                              metric=metric, seg=seg)
        return jax.lax.top_k(-sm, k + 16)
    t_sel = timeit(lambda: surf_topk(qdev, codes, norms, valid),
                   fetch=lambda o: np.asarray(o[1][:1, :1]))
    log(f"surface + seg top_k:         {t_sel*1e3:8.2f} ms")

    t_full = timeit(lambda: pallas_scan.fused_scan_topk(
        qdev, codes, norms, valid, bits=bits, metric=metric, k=k, seg=seg,
        surface="xla"), fetch=lambda o: np.asarray(o[0][:1, :1]))
    log(f"full fused (no ties):        {t_full*1e3:8.2f} ms")

    t_ties = timeit(lambda: pallas_scan.fused_scan_topk(
        qdev, codes, norms, valid, bits=bits, metric=metric, k=k, seg=seg,
        surface="xla", with_ties=True),
        fetch=lambda o: np.asarray(o[2][:1, None]))
    log(f"full fused + tie counts:     {t_ties*1e3:8.2f} ms "
        f"({1024/t_ties:.0f} QPS)")

    for sg in (64, 128):
        t_sg = timeit(lambda sg=sg: pallas_scan.fused_scan_topk(
            qdev, codes, norms, valid, bits=bits, metric=metric, k=k, seg=sg,
            surface="xla", with_ties=True),
            fetch=lambda o: np.asarray(o[2][:1]))
        log(f"fused seg={sg}:              {t_sg*1e3:8.2f} ms")

    log("== bf16 exhaustive two-dispatch baseline ==")
    t_two = timeit(lambda: dist_ops.top_k_smallest(dist_ops.score_block(
        qdev, codes, norms, valid, bits, metric, exact=False), k), reps=5,
        fetch=lambda o: np.asarray(o[0][:1, :1]))
    log(f"score_block + top_k:         {t_two*1e3:8.2f} ms")

    log("== ANN crossover sweep (budget rows, batch) ==")
    for q_n in (64, 256, 1024):
        qd = qdev[:q_n]
        qc = qc_all[:q_n]
        for budget in (512, 1024, 2048):
            def ann():
                _, cand = hamming_candidates(qc, hashes, valid, budget,
                                             index.words)
                return rerank_topk(qd, codes, norms, valid, cand, bits,
                                   metric, k)
            t = timeit(ann, reps=5, fetch=lambda o: np.asarray(o[0][:1, :1]))
            log(f"ann batch={q_n:5d} budget={budget:5d}: "
                f"{t*1e3:8.2f} ms  {q_n/t:9.0f} QPS")

    log("done")


if __name__ == "__main__":
    main()
