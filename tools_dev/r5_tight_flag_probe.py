"""Flag hold-rate + QPS vs tie_margin with the TIGHTENED completeness
bound (1*delta direct bridge through kth_exact + exact half-ulp rounding
factor, vs the old 3.1*delta + 2^-7; ops/pallas_scan._select_and_rerank).

Old bound (r4p probe): margin 16 -> 8.4% fail; 24 -> 0.37%; 32 -> 0/5k.
This probe re-measures the same corpus/query distribution to pick the new
default margin, then times the headline pipeline at the candidates.
"""
import os
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


from syzgydb_tpu.utils.hostmem import tune_host_allocator
from syzgydb_tpu.utils.platform import (normalize_jax_platforms,
                                        require_accelerator)
tune_host_allocator()
normalize_jax_platforms()
import jax
import jax.numpy as jnp
from syzgydb_tpu.utils import xla_cache
xla_cache.enable()
from syzgydb_tpu.ops import pallas_scan
from syzgydb_tpu.ops import distance as dist_ops
from syzgydb_tpu.ops import quantize as qz

n, d, bits, metric, k = 1_000_000, 384, 8, "cosine", 10
cache = f"/tmp/syzgydb_bench_{n}x{d}_{bits}b.npz"
if os.path.exists(cache):
    log("probe: loading cached dataset")
    blob = np.load(cache)
    db, codes_np, norms_np = blob["db"], blob["codes"], blob["norms"]
else:
    log("probe: generating dataset (bench.py recipe, seed 12345)")
    rng = np.random.default_rng(12345)
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
    try:
        np.savez(cache, db=db, queries=db[:64], codes=codes_np,
                 norms=norms_np)
    except OSError:
        pass

npad = (-n) % 4096
ntot = n + npad
codes = jnp.asarray(np.concatenate(
    [codes_np, np.zeros((npad, d), codes_np.dtype)]))
norms = jnp.asarray(np.concatenate(
    [norms_np, np.zeros(npad, norms_np.dtype)]))
valid_np = np.zeros(ntot, bool)
valid_np[:n] = True
valid = jnp.asarray(valid_np)

require_accelerator()
log(f"probe: backend {jax.default_backend()}")


def run(queries, mg):
    return pallas_scan.fused_scan_topk(
        jnp.asarray(queries), codes, norms, valid, bits=bits, metric=metric,
        k=k, seg=32, surface="xla", tie_margin=mg, with_ties=True)


# hold-rate over 4 fresh 1024-query batches per margin (r4p distribution)
qrng = np.random.default_rng(31337)
batches = []
for b in range(4):
    noise = qrng.standard_normal((1024, d)).astype(np.float32)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    queries = db[qrng.integers(0, n, size=1024)] + 0.2 * noise
    batches.append(np.float32(
        queries / np.linalg.norm(queries, axis=1, keepdims=True)))

for mg in (8, 16, 24, 32):
    oks = []
    for qb in batches:
        out = run(qb, mg)
        oks.append(np.asarray(out[2]))
    ok = np.concatenate(oks)
    log(f"margin {mg}: ok-rate {ok.mean():.4f} over {len(ok)} queries "
        f"({int(round((1 - ok.mean()) * len(ok)))} escalation-triggering)")

# timing at the candidate margins (bench.py methodology)
qdev = batches[0]


def timeit(mg, reps=10):
    np.asarray(run(qdev, mg)[0][:1, :1])
    t0 = time.perf_counter()
    outs = [run(qdev, mg) for _ in range(reps)]
    np.asarray(outs[-1][0][:1, :1])
    return (time.perf_counter() - t0) / reps

for mg in (16, 24, 32):
    t = timeit(mg)
    log(f"margin {mg}: {t * 1000:.1f} ms/1024q = {1024 / t:.0f} QPS")
log("done")
