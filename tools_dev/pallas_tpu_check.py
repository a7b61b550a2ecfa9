import time, numpy as np
t0 = time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp
log(f"devices {jax.devices()}")
from syzgydb_tpu.ops import distance as dist_ops, quantize as qz, pallas_scan
rng = np.random.default_rng(0)
n, d, q, k = 1 << 17, 384, 8, 10
db = rng.uniform(-1, 1, (n, d)).astype(np.float32)
codes = jnp.asarray(qz.codes_to_device_repr(db, 8))
norms = jnp.asarray(dist_ops.db_row_stats(qz.codes_to_device_repr(db, 8), 8))
valid = jnp.ones(n, bool)
queries = jnp.asarray(db[:q])
log("uploaded")
vals, rows = pallas_scan.fused_scan_topk(queries, codes, norms, valid,
                                         bits=8, metric="cosine", k=k)
v0 = np.asarray(vals)
log("pallas kernel compiled+ran on TPU")
ref = dist_ops.score_block(queries, codes, norms, valid, 8, "cosine")
rv, ri = dist_ops.top_k_smallest(ref, k)
rv = np.asarray(rv)
match = np.allclose(v0, rv, atol=2e-4)
log(f"matches XLA oracle: {match}")
if not match:
    print("pallas:", v0[0][:5], "\nxla:", rv[0][:5], flush=True)
# timing
t = time.time()
outs = [pallas_scan.fused_scan_topk(queries, codes, norms, valid, bits=8,
                                    metric="cosine", k=k) for _ in range(10)]
np.asarray(outs[-1][0][:1, :1])
log(f"pallas 10 steps: {(time.time()-t)/10*1000:.2f}ms/step")
t = time.time()
outs = [dist_ops.top_k_smallest(dist_ops.score_block(
    queries, codes, norms, valid, 8, "cosine"), k) for _ in range(10)]
np.asarray(outs[-1][0][:1, :1])
log(f"xla    10 steps: {(time.time()-t)/10*1000:.2f}ms/step")
log("DONE")
