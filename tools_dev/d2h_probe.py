import time, numpy as np
t0 = time.time()
def log(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp
log(f"devices {jax.devices()}")

# 1. tiny compute + immediate fetch
x = jnp.ones((8, 128), jnp.float32)
y = (x * 2).sum()
t = time.time(); v = float(y); log(f"scalar fetch after tiny compute: {v} ({time.time()-t:.2f}s)")

# 2. small array fetch
z = jnp.ones((64, 10), jnp.int32) * 3
t = time.time(); a = np.asarray(z); log(f"(64,10) fetch: ({time.time()-t:.2f}s)")

# 3. after one big matmul
from syzgydb_tpu.ops import distance as dist_ops, quantize as qz
rng = np.random.default_rng(0)
n, d = 1_000_000, 384
db = rng.standard_normal((n, d), dtype=np.float32)
codes = jnp.asarray(qz.codes_to_device_repr(db, 8))
norms = jnp.asarray(dist_ops.db_row_stats(qz.codes_to_device_repr(db, 8), 8))
valid = jnp.ones(n, bool)
q = jnp.asarray(db[:64])
log("uploaded 1M")
dist = dist_ops.score_block(q, codes, norms, valid, 8, "cosine", exact=False)
vals, idx = dist_ops.top_k_smallest(dist, 10)
jax.block_until_ready(idx)
log("one step computed")
t = time.time(); arr = np.asarray(idx); log(f"(64,10) idx fetch after 1 step: {time.time()-t:.2f}s")

# 4. after 20 queued steps
t = time.time()
outs = []
for i in range(20):
    vals, idx = dist_ops.top_k_smallest(
        dist_ops.score_block(q, codes, norms, valid, 8, "cosine",
                             exact=False), 10)
    outs.append(idx)
jax.block_until_ready(outs)
log(f"20 steps wall {(time.time()-t):.3f}s")
t = time.time(); arr = np.asarray(idx); log(f"fetch after 20 steps: {time.time()-t:.2f}s")
log(f"sample ids: {arr[0][:5].tolist()}")
log("DONE")
