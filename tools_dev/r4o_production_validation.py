"""Production fused_scan_topk validation on hardware (r3 final design:
indices-only selection + flag from exact rerank minima)."""
import sys, time
import numpy as np
def log(m): print(m, file=sys.stderr, flush=True)
from syzgydb_tpu.utils.hostmem import tune_host_allocator
tune_host_allocator()
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from syzgydb_tpu.ops import pallas_scan, distance as dist_ops
n, d, bits, metric, k = 1_000_000, 384, 8, "cosine", 10
blob = np.load(f"/tmp/syzgydb_bench_{n}x{d}_{bits}b.npz")
db, codes_np, norms_np = blob["db"], blob["codes"], blob["norms"]
qrng = np.random.default_rng(777)
noise = qrng.standard_normal((1024, d)).astype(np.float32)
noise /= np.linalg.norm(noise, axis=1, keepdims=True)
queries = db[qrng.integers(0, n, size=1024)] + 0.2*noise
queries = np.float32(queries/np.linalg.norm(queries, axis=1, keepdims=True))
npad = (-n) % 4096; ntot = n+npad
codes = jnp.asarray(np.concatenate([codes_np, np.zeros((npad, d), codes_np.dtype)]))
norms = jnp.asarray(np.concatenate([norms_np, np.zeros(npad, norms_np.dtype)]))
valid_np = np.zeros(ntot, bool); valid_np[:n] = True
valid = jnp.asarray(valid_np); qdev = jnp.asarray(queries)

def timeit(fn, reps=8, fetch=lambda o: np.asarray(o[2][:1, None])):
    fetch(fn()); t0=time.perf_counter(); last=None
    for _ in range(reps): last=fn()
    fetch(last); return (time.perf_counter()-t0)/reps

log("== production fused_scan_topk (raw-negv output + tiny flag program) ==")
for q_n in (1024, 256, 64):
    qd = qdev[:q_n]
    for mg in ((32,) if q_n != 1024 else (32, 16)):
        t = timeit(lambda: pallas_scan.fused_scan_topk(
            qd, codes, norms, valid, bits=bits, metric=metric, k=k, seg=32,
            surface="xla", tie_margin=mg, with_ties=True))
        log(f"batch={q_n:5d} margin={mg}: {t*1e3:8.2f} ms  {q_n/t:9.0f} QPS")
out = pallas_scan.fused_scan_topk(qdev, codes, norms, valid, bits=bits,
    metric=metric, k=k, seg=32, surface="xla", with_ties=True)
log(f"ok-rate: {np.asarray(out[2]).mean():.4f}")
truth = np.zeros((1024, k), dtype=np.int64)
for s in range(0, 1024, 256):
    dd = dist_ops.score_block(qdev[s:s+256], codes, norms, valid, bits, metric, exact=True)
    _, ti = dist_ops.top_k_smallest(dd, k)
    truth[s:s+256] = np.asarray(ti)
rows = np.asarray(out[1])
rec = np.mean([len(set(truth[i]) & set(rows[i]))/k for i in range(1024)])
log(f"recall@10 vs f32-exact: {rec:.4f}")
log("done")
