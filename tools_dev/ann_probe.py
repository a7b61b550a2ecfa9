import time, numpy as np
t0 = time.time()
def log(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp
log(f"devices {jax.devices()}")
from syzgydb_tpu.ops import distance as dist_ops, quantize as qz
from syzgydb_tpu.index.hamming import SignHashIndex, hamming_candidates, rerank_topk
from syzgydb_tpu.utils.rng import MyRandom
n, d, bits = 1_000_000, 384, 8
rng = np.random.default_rng(0)
db = rng.standard_normal((n, d), dtype=np.float32)
codes = jax.device_put(qz.codes_to_device_repr(db, bits))
norms = jnp.asarray(dist_ops.db_row_stats(np.asarray(codes), bits))
valid = jnp.ones(n, bool)
log("uploads done")
index = SignHashIndex(d, "cosine", MyRandom(7))
t = time.time(); hashes = jnp.asarray(index.encode_batch(db)); jax.block_until_ready(hashes)
log(f"hash encode 1M {time.time()-t:.1f}s")
q = jnp.asarray(db[:64]); qc = jnp.asarray(index.encode_np(np.asarray(q)))
for budget in [2048, 16384]:
    t = time.time()
    ham, cand = hamming_candidates(qc, hashes, valid, budget, index.words)
    jax.block_until_ready(cand)
    log(f"hamming budget={budget} compile+run {time.time()-t:.1f}s")
    t = time.time()
    for _ in range(5):
        ham, cand = hamming_candidates(qc, hashes, valid, budget, index.words)
    jax.block_until_ready(cand)
    log(f"hamming budget={budget} 5 steps {(time.time()-t)/5*1000:.1f}ms/step")
    t = time.time()
    out = rerank_topk(q, codes, norms, valid, cand, bits, "cosine", 10)
    jax.block_until_ready(out)
    log(f"rerank budget={budget} compile+run {time.time()-t:.1f}s")
    t = time.time()
    for _ in range(5):
        out = rerank_topk(q, codes, norms, valid, cand, bits, "cosine", 10)
    jax.block_until_ready(out)
    log(f"rerank budget={budget} 5 steps {(time.time()-t)/5*1000:.1f}ms/step")
log("DONE")
