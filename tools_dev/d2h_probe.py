import time, numpy as np
t0=time.time()
def log(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp
log("start")
x = jnp.arange(1024, dtype=jnp.int32)
log("small array created")
y = (x * 2).sum()
log(f"fetch scalar: {int(y)}")
z = jnp.ones((64, 10), jnp.int32) * 3
log(f"fetch (64,10): {np.asarray(z)[0,0]}")
# now a real matmul chain like exact_step
from syzgydb_tpu.ops import distance as dist_ops, quantize as qz
rng = np.random.default_rng(0)
n, d = 200_000, 384
db = rng.standard_normal((n,d), dtype=np.float32)
codes = jnp.asarray(qz.codes_to_device_repr(db, 8))
norms = jnp.asarray(dist_ops.db_row_stats(np.asarray(qz.codes_to_device_repr(db, 8)), 8))
valid = jnp.ones(n, bool)
q = jnp.asarray(db[:64])
log("uploaded 200k")
dist = dist_ops.score_block(q, codes, norms, valid, 8, "cosine", exact=False)
vals, idx = dist_ops.top_k_smallest(dist, 10)
jax.block_until_ready(idx)
log("computed")
t=time.time(); arr = np.asarray(idx); log(f"fetch idx took {time.time()-t:.2f}s")
t=time.time()
for i in range(20):
    vals, idx = dist_ops.top_k_smallest(dist_ops.score_block(q, codes, norms, valid, 8, "cosine", exact=False), 10)
jax.block_until_ready(idx)
log(f"20 steps wall {(time.time()-t):.3f}s")
t=time.time(); arr = np.asarray(idx); log(f"fetch after 20 steps took {time.time()-t:.2f}s")
log("DONE")
