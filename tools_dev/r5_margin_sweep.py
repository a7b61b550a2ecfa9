"""Careful margin timing sweep (3 interleaved rounds, report min) for the
tightened completeness bound, plus hold-rate at margin 20 and the cost of
an escalated rung-64 dispatch (ladder design).  The single r5_tight_flag
probe showed non-monotone timings (24 slower than 32) — suspected tunnel
run-to-run noise; min-of-3 interleaved separates shape effects from noise.
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

n, d, bits, metric, k = 1_000_000, 384, 8, "cosine", 10
blob = np.load(f"/tmp/syzgydb_bench_{n}x{d}_{bits}b.npz")
db, codes_np, norms_np = blob["db"], blob["codes"], blob["norms"]
npad = (-n) % 4096
codes = jnp.asarray(np.concatenate(
    [codes_np, np.zeros((npad, d), codes_np.dtype)]))
norms = jnp.asarray(np.concatenate(
    [norms_np, np.zeros(npad, norms_np.dtype)]))
valid_np = np.zeros(n + npad, bool)
valid_np[:n] = True
valid = jnp.asarray(valid_np)
require_accelerator()
log(f"backend {jax.default_backend()}")

qrng = np.random.default_rng(31337)
noise = qrng.standard_normal((1024, d)).astype(np.float32)
noise /= np.linalg.norm(noise, axis=1, keepdims=True)
queries = db[qrng.integers(0, n, size=1024)] + 0.2 * noise
qdev = np.float32(queries / np.linalg.norm(queries, axis=1, keepdims=True))


def run(mg):
    return pallas_scan.fused_scan_topk(
        jnp.asarray(qdev), codes, norms, valid, bits=bits, metric=metric,
        k=k, seg=32, surface="xla", tie_margin=mg, with_ties=True)


def timeit(mg, reps=10):
    np.asarray(run(mg)[0][:1, :1])  # warm/compile
    t0 = time.perf_counter()
    outs = [run(mg) for _ in range(reps)]
    np.asarray(outs[-1][0][:1, :1])
    return (time.perf_counter() - t0) / reps


MARGINS = (16, 20, 24, 32, 64)
# hold-rate at 20 (16/24/32 known: 0.9998 / 1.0 / 1.0)
ok20 = np.asarray(run(20)[2])
log(f"margin 20: ok-rate {ok20.mean():.4f} over {len(ok20)}")

best = {m: float("inf") for m in MARGINS}
for rnd in range(3):
    for m in MARGINS:
        t = timeit(m)
        best[m] = min(best[m], t)
        log(f"round {rnd} margin {m}: {t * 1000:.1f} ms")
for m in MARGINS:
    log(f"BEST margin {m}: {best[m] * 1000:.1f} ms/1024q = "
        f"{1024 / best[m]:.0f} QPS")
log("done")
