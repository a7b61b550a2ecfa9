"""r7i: the two ilv production surfaces no probe has device-compiled yet —
the euclidean epilogue (all r7 probes ran cosine) and a 64-bit Collection
end-to-end search."""

import os
import sys
import tempfile
import time

import numpy as np


def log(m):
    print(m, flush=True)


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
    from syzgydb_tpu.ops import distance as dist_ops
    from syzgydb_tpu.ops import pallas_scan
    from syzgydb_tpu.ops import quantize as qz

    # -- (a) euclidean 8-bit ilv surface at the headline shape --
    n, d = 1_000_000, 384
    blob = np.load(f"/tmp/syzgydb_bench_{n}x{d}_8b.npz")
    db, codes_np, norms_np = blob["db"], blob["codes"], blob["norms"]
    qrng = np.random.default_rng(777)
    queries = np.float32(db[qrng.integers(0, n, size=1024)])
    qdev = jnp.asarray(queries)
    npad = (-n) % 8192
    ntot = n + npad
    valid_np = np.zeros(ntot, dtype=bool)
    valid_np[:n] = True
    valid = jnp.asarray(valid_np)
    codes = jnp.asarray(np.concatenate(
        [codes_np, np.zeros((npad, d), codes_np.dtype)]))
    norms = jnp.asarray(np.concatenate(
        [norms_np, np.zeros(npad, norms_np.dtype)]))
    ilv = pallas_scan.make_ilv_codes(codes)
    jax.block_until_ready(ilv)

    def timeit(fn, reps=10):
        tiny = lambda o: float(jax.tree.leaves(o)[0].reshape(-1)[0])
        tiny(fn())
        t0 = time.perf_counter()
        out = [fn() for _ in range(reps)]
        tiny(out[-1])
        return (time.perf_counter() - t0) / reps

    fn = lambda: pallas_scan.segment_min_scan_ilv(
        qdev, ilv, norms, valid, bits=8, metric="euclidean")
    t = timeit(fn)
    xf = lambda: pallas_scan.segment_min_scan_xla(
        qdev, codes, norms, valid, bits=8, metric="euclidean")
    tx = timeit(xf)
    a, b = fn(), xf()
    diff = float(jnp.max(jnp.abs(jnp.where(jnp.isinf(a) & jnp.isinf(b),
                                           0.0, a - b))))
    log(f"euclid 8-bit ilv {t*1000:.2f} ms | xla {tx*1000:.2f} ms; "
        f"max|diff|={diff:.3e} (surrogate units, bf16-storage scale)")

    # -- (b) 64-bit Collection end-to-end 'high' search --
    from syzgydb_tpu.core.collection import (COSINE, Collection,
                                             CollectionOptions, SearchArgs)
    n2, d2 = 20_000, 128
    rng = np.random.default_rng(77)
    db2 = rng.standard_normal((n2, d2))
    db2 /= np.linalg.norm(db2, axis=1, keepdims=True)
    path = os.path.join(tempfile.mkdtemp(), "r7i.dat")
    coll = Collection(CollectionOptions(
        name=path, dimension_count=d2, quantization=64,
        distance_method=COSINE))
    coll.add_documents(range(n2), db2, [b"{}"] * n2)
    dev = coll._device_state()
    log(f"64-bit collection device state has ilv: {'ilv' in dev}")
    ok = True
    for i in range(4):
        q = db2[rng.integers(0, n2)] + 0.05 * rng.standard_normal(d2)
        q = np.float32(q / np.linalg.norm(q))
        res = coll.search(SearchArgs(vector=q, k=10, precision="high"))
        got = [r.id for r in res.results]
        cos = (q @ db2.T) / np.linalg.norm(db2, axis=1)
        ang = np.arccos(np.clip(cos / np.linalg.norm(q), -1, 1)) / np.pi
        want = list(np.argsort(ang, kind="stable")[:10])
        if got != [int(w) for w in want]:
            log(f"  q{i}: got {got} want {want}")
            ok = False
    log(f"64-bit high search vs f64 host oracle: {'OK' if ok else 'FAIL'}")
    coll.close()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
