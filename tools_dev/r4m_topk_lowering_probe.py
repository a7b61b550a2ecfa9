"""TPU top_k lowering isolation (r3): column slices of top_k VALUES
cost +29ms at the headline shape; raw outputs and indices-only are fast.
Findings recorded in BASELINE.md round 3 + CLAUDE.md."""
import sys, time
import numpy as np
def log(m): print(m, file=sys.stderr, flush=True)
from syzgydb_tpu.utils.hostmem import tune_host_allocator
tune_host_allocator()
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from syzgydb_tpu.ops import pallas_scan
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
S = k + 16
segmins = jax.block_until_ready(pallas_scan.segment_min_scan_xla(
    qdev, codes, norms, valid, bits=bits, metric=metric, seg=32))

def timeit(fn, reps=8, fetch=None):
    fetch(fn()); t0=time.perf_counter(); last=None
    for _ in range(reps): last=fn()
    fetch(last); return (time.perf_counter()-t0)/reps

fa = jax.jit(lambda s: jax.lax.top_k(-s, S+1))
log(f"a topk_both raw      : {timeit(lambda: fa(segmins), fetch=lambda o: np.asarray(o[1][:1,:1]))*1e3:8.2f} ms")

fb = jax.jit(lambda s: (lambda nv, ix: (ix[:, :S], -nv[:, k-1], -nv[:, S]))(*jax.lax.top_k(-s, S+1)))
log(f"b topk + sliced vals : {timeit(lambda: fb(segmins), fetch=lambda o: np.asarray(o[1][:1,None]))*1e3:8.2f} ms")

def p2(q, s):
    negv, seg_all = jax.lax.top_k(-s, S + 1)
    m_k = -negv[:, k-1]; v_next = -negv[:, S]
    qn2 = jnp.sum(q*q, axis=-1)
    qhat = q.astype(jnp.bfloat16).astype(jnp.float32)
    dq = jnp.sqrt(jnp.sum((q-qhat)**2, axis=-1))
    dq_rel = jnp.where(qn2>0, dq*jax.lax.rsqrt(jnp.maximum(qn2,1e-30)), 1.0)
    thresh = m_k*(1.0+1.0/128.0+1.0/1024.0) + 2.1*(0.5*dq_rel + 3e-5)
    return seg_all[:, :S], (v_next > thresh).astype(jnp.int32)
fc = jax.jit(p2)
log(f"c p2_sel_flag        : {timeit(lambda: fc(qdev, segmins), fetch=lambda o: np.asarray(o[1][:1,None]))*1e3:8.2f} ms")

fidx = jax.jit(lambda s: jax.lax.top_k(-s, S)[1])
seg_idx = jax.block_until_ready(fidx(segmins))
def p3(q, c, nr, v, si):
    ccodes = pallas_scan.gather_segments(c, si, 32)
    cnorms = pallas_scan.gather_segments(nr, si, 32)
    cvalid = pallas_scan.gather_segments(v, si, 32)
    rows = (si[:, :, None]*32 + jnp.arange(32, dtype=jnp.int32)[None,None,:]).reshape(si.shape[0], -1)
    dist = pallas_scan._candidate_distances(q, ccodes, cnorms, cvalid, bits, metric, False)
    neg, pos = jax.lax.top_k(-dist, k)
    return -neg, jnp.take_along_axis(rows, pos, axis=1)
fd = jax.jit(p3)
log(f"d p3_rerank          : {timeit(lambda: fd(qdev, codes, norms, valid, seg_idx), fetch=lambda o: np.asarray(o[0][:1,:1]))*1e3:8.2f} ms")

fe = jax.jit(lambda s: jax.lax.top_k(-s, S)[1])
log(f"e topk idx only       : {timeit(lambda: fe(segmins), fetch=lambda o: np.asarray(o[:1,:1]))*1e3:8.2f} ms")
log("done")
