"""Round-4 follow-up probes after the optimization-barrier fix:

1. fused+ties cost with the barrier (the production high path)
2. int8 vs bf16 MXU rate at the headline matmul shape (is int8 ~2x? —
   would let an int8x2 query split replace bf16x2 at ~half the FLOP time)
3. rerank stage cost: HIGHEST vs bf16 einsum at the candidate shape
4. precision="high" throughput at batches 64/256/1024 (locates the
   ANN-vs-scan crossover against r4_profile's ANN sweep)
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
    from syzgydb_tpu.ops import distance as dist_ops
    from syzgydb_tpu.ops import pallas_scan

    n, d, bits, metric, k = 1_000_000, 384, 8, "cosine", 10
    blob = np.load(f"/tmp/syzgydb_bench_{n}x{d}_{bits}b.npz")
    db, codes_np, norms_np = blob["db"], blob["codes"], blob["norms"]
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

    def timeit(fn, reps=10, fetch=lambda o: np.asarray(o[:1, :1])):
        # keep only the LAST output alive: the raw-matmul probes return
        # 4GB surfaces and holding every rep's buffer OOMs the chip
        fetch(fn())
        t0 = time.perf_counter()
        last = None
        for _ in range(reps):
            last = fn()
        fetch(last)
        return (time.perf_counter() - t0) / reps

    log("== 1. fused high path with barrier ==")
    for q_n in (64, 256, 1024):
        qd = qdev[:q_n]
        t = timeit(lambda: pallas_scan.fused_scan_topk(
            qd, codes, norms, valid, bits=bits, metric=metric, k=k, seg=32,
            surface="xla", with_ties=True),
            fetch=lambda o: np.asarray(o[2][:1, None]))
        log(f"high batch={q_n:5d}: {t*1e3:8.2f} ms  {q_n/t:9.0f} QPS")

    log("== 2. raw matmul rates (1024x384 @ 384x1M) ==")
    import functools

    @functools.partial(jax.jit, static_argnames=("mode",))
    def mm(q, c, mode: str):
        dn = (((1,), (1,)), ((), ()))
        if mode == "bf16":
            return jax.lax.dot_general(
                q.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
                dimension_numbers=dn, preferred_element_type=jnp.float32)
        if mode == "bf16x2":
            hi, lo = dist_ops.split_bf16x2(q)
            cb = c.astype(jnp.bfloat16)
            return jax.lax.dot_general(
                hi, cb, dimension_numbers=dn,
                preferred_element_type=jnp.float32) + jax.lax.dot_general(
                lo, cb, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
        if mode == "int8":
            qi = jnp.clip(jnp.round(q * 127.0), -127, 127).astype(jnp.int8)
            return jax.lax.dot_general(
                qi, c, dimension_numbers=dn,
                preferred_element_type=jnp.int32)
        if mode == "int8x2":
            q1 = jnp.clip(jnp.round(q * 127.0), -127, 127).astype(jnp.int8)
            r = q - q1.astype(jnp.float32) / 127.0
            q2 = jnp.clip(jnp.round(r * (127.0 * 254.0)), -127,
                          127).astype(jnp.int8)
            a = jax.lax.dot_general(q1, c, dimension_numbers=dn,
                                    preferred_element_type=jnp.int32)
            b = jax.lax.dot_general(q2, c, dimension_numbers=dn,
                                    preferred_element_type=jnp.int32)
            return (a.astype(jnp.float32) / 127.0
                    + b.astype(jnp.float32) / (127.0 * 254.0))
        raise ValueError(mode)

    gf = 2 * 1024 * d * ntot / 1e9
    for mode in ("bf16", "bf16x2", "int8", "int8x2"):
        t = timeit(lambda m=mode: mm(qdev, codes, m), reps=5)
        log(f"{mode:7s}: {t*1e3:8.2f} ms  {gf/t/1e3:7.1f} TFLOP/s-equiv")

    log("== 3. rerank einsum at candidate shape (1024, 832, 384) ==")
    crng = np.random.default_rng(5)
    ccodes = jnp.asarray(crng.integers(-127, 127,
                                       size=(1024, 832, d)).astype(np.int8))

    @functools.partial(jax.jit, static_argnames=("mode",))
    def rr(q, cc, mode: str):
        if mode == "highest":
            return jnp.einsum("qd,qcd->qc", q, cc.astype(jnp.float32),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
        if mode == "bf16":
            return jnp.einsum("qd,qcd->qc", q.astype(jnp.bfloat16),
                              cc.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
        if mode == "f32_default":
            return jnp.einsum("qd,qcd->qc", q, cc.astype(jnp.float32),
                              preferred_element_type=jnp.float32)
        raise ValueError(mode)

    for mode in ("highest", "bf16", "f32_default"):
        t = timeit(lambda m=mode: rr(qdev, ccodes, m), reps=5)
        log(f"rerank {mode:12s}: {t*1e3:8.2f} ms")

    log("done")


if __name__ == "__main__":
    main()
