"""r7c: Collection-level production validation of the ilv fused surface on
hardware — device-state build, donated scatter sync across mutations, and
precision="high" search correctness vs the host f64 oracle.

CPU tests can't reach this path (pallas_scan.supported() is False there);
this probe is the hardware counterpart of tests/test_collection.py's
mutation/search flows.
"""

import os
import sys
import tempfile

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
    require_accelerator()
    from syzgydb_tpu.utils import xla_cache
    xla_cache.enable()
    from syzgydb_tpu.core.collection import (COSINE, Collection,
                                             CollectionOptions, SearchArgs)

    n, d = 20_000, 384
    rng = np.random.default_rng(4242)
    db = rng.standard_normal((n, d)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)

    path = os.path.join(tempfile.mkdtemp(), "r7c.dat")
    coll = Collection(CollectionOptions(
        name=path, dimension_count=d, quantization=8,
        distance_method=COSINE))
    log(f"ingesting {n} docs")
    coll.add_documents(range(n), db, [b"{}"] * n)
    assert coll.columns.capacity % 8192 == 0, coll.columns.capacity

    q = db[rng.integers(0, n, size=8)] + 0.1 * rng.standard_normal((8, d))
    q = np.float32(q / np.linalg.norm(q, axis=1, keepdims=True))

    def oracle(qv, k=10):
        from syzgydb_tpu.ops import quantize as qz
        deq = qz.quantization_roundtrip(db2, 8)
        cos = (qv @ deq.T) / (np.linalg.norm(qv) *
                              np.linalg.norm(deq, axis=1))
        ang = np.arccos(np.clip(cos, -1, 1)) / np.pi
        order = np.argsort(ang, kind="stable")
        return [ids2[i] for i in order[:k]]

    def check(tag):
        dev = coll._device_state()
        assert "ilv" in dev, "ilv device state missing"
        ok = True
        for i in range(len(q)):
            res = coll.search(SearchArgs(vector=q[i], k=10,
                                         precision="high"))
            got = [r.id for r in res.results]
            want = oracle(q[i])
            # compare as sets: equal-distance ties may order differently
            if set(got) != set(want):
                # tolerate only genuine distance ties at the boundary
                gd = [r.distance for r in res.results]
                log(f"  q{i}: got {got} want {want} dists {gd}")
                ok = False
        log(f"{tag}: {'OK' if ok else 'MISMATCH'}")
        return ok

    db2 = db.copy()
    ids2 = list(range(n))
    ok1 = check("fresh collection")

    log("mutating: 300 updates + 100 deletes + 200 inserts")
    upd = rng.choice(n, size=300, replace=False)
    for r in upd:
        v = rng.standard_normal(d).astype(np.float32)
        v /= np.linalg.norm(v)
        # vector updates are superseding writes of the same id (the
        # reference's UpdateDocument only touches metadata)
        coll.add_document(int(r), v, b"{}")
        db2[r] = v
    dele = [int(x) for x in rng.choice(n, size=100, replace=False)
            if x not in set(upd.tolist())][:100]
    for r in dele:
        coll.remove_document(r)
    keep = np.ones(n, bool)
    keep[dele] = False
    new = rng.standard_normal((200, d)).astype(np.float32)
    new /= np.linalg.norm(new, axis=1, keepdims=True)
    coll.add_documents(range(n, n + 200), new, [b"{}"] * 200)
    db2 = np.concatenate([db2[keep], new])
    ids2 = [i for i in range(n) if keep[i]] + list(range(n, n + 200))
    ok2 = check("after scatter-synced mutations")
    log(f"sync stats: {coll.sync_stats}")
    coll.close()
    return 0 if (ok1 and ok2) else 1


if __name__ == "__main__":
    sys.exit(main())
