import faulthandler, sys, time
faulthandler.register(__import__("signal").SIGUSR1)
import numpy as np
t0 = time.time()
def log(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)

n, d = 1_000_000, 768
rng = np.random.default_rng(4)
log("gen start")
vecs = rng.standard_normal((n, d), dtype=np.float32)
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
log("gen done")
import json
metas = [json.dumps({"cat": int(i % 10), "score": float(i % 100),
                     "name": f"doc_{i}"}).encode() for i in range(n)]
log("metas done")
from syzgydb_tpu.ops import quantize as qz
from syzgydb_tpu.ops import distance as dist_ops
t = time.time(); packed = qz.pack_vectors(vecs, 8); log(f"pack_vectors {time.time()-t:.1f}s")
t = time.time(); codes = qz.codes_to_device_repr(vecs, 8); log(f"codes_to_device_repr {time.time()-t:.1f}s")
t = time.time(); norms = dist_ops.db_row_stats(codes, 8); log(f"db_row_stats {time.time()-t:.1f}s")
from syzgydb_tpu.core.storage import SpanLog
slog = SpanLog("/tmp/ingest_profile.dat")
t = time.time()
items = [(str(i), [metas[i], packed[i].tobytes()]) for i in range(n)]
log(f"items list {time.time()-t:.1f}s")
t = time.time(); slog.write_many(items); log(f"write_many {time.time()-t:.1f}s")
slog.close()
log("DONE")
