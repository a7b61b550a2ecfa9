"""Host-path micro-benchmarks: bulk ingest, reopen replay, filter engine.

These paths run on the host CPU regardless of the accelerator, so this
benchmark is meaningful (and CI-runnable) without a TPU.  Reference
analogs: AddDocument encode+write (collection.go:427-457), NewCollection
replay (collection.go:297-311), per-candidate filter evaluation
(collection.go:583-596).

r4 numbers on the single-core container (50k x 384 x 8-bit batches,
500k-row collection): ingest 102k docs/s, reopen 51k docs/s, first
path-filter query ~ cost of one fallback query, cached filter ~1ms/200k.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from benchmarks.common import emit, log  # noqa: E402


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from syzgydb_tpu import Collection, CollectionOptions, SearchArgs, COSINE

    d = 384
    n_batches = int(os.environ.get("SYZGY_HOST_BATCHES", "10"))
    batch = 50_000
    n = n_batches * batch
    rng = np.random.default_rng(9)

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "host.dat")
        c = Collection(CollectionOptions(
            name=path, distance_method=COSINE, dimension_count=d,
            quantization=8, create_and_overwrite=True, index_seed=9))
        metas = [json.dumps({"cat": i % 10, "user": {"age": i % 70},
                             "tags": ["x"] * (i % 3)}).encode()
                 for i in range(batch)]
        v = rng.standard_normal((batch, d))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        t0 = time.perf_counter()
        for s in range(0, n, batch):
            c.add_documents(list(range(s, s + batch)), v, metas)
        ingest_s = time.perf_counter() - t0
        log(f"ingest {n} docs in {ingest_s:.1f}s "
            f"({n / ingest_s / 1000:.0f}k docs/s)")
        c.close()

        t0 = time.perf_counter()
        c = Collection(CollectionOptions(name=path, dimension_count=d,
                                         quantization=8))
        reopen_s = time.perf_counter() - t0
        log(f"reopen {n} docs in {reopen_s:.1f}s "
            f"({n / reopen_s / 1000:.0f}k docs/s)")

        # filter engine: first path query pays the projection pass, the
        # second (same paths, new predicate) rides the cached columns
        t0 = time.perf_counter()
        m1, _ = c._filter_mask(SearchArgs(
            vector=None, k=0, filter_query="user.age > 30 AND cat == 3"))
        first_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        m2, _ = c._filter_mask(SearchArgs(
            vector=None, k=0, filter_query="user.age < 20 OR cat == 7"))
        second_s = time.perf_counter() - t0
        log(f"path filter: first {first_s:.2f}s, cached-path "
            f"{second_s * 1000:.0f}ms ({int(m1.sum())}/{int(m2.sum())} rows)")
        c.close()

    emit({
        "metric": "host_paths",
        "value": round(n / ingest_s, 0),
        "unit": "ingest docs/s",
        "n": n,
        "ingest_docs_per_s": round(n / ingest_s, 0),
        "reopen_docs_per_s": round(n / reopen_s, 0),
        "filter_first_s": round(first_s, 2),
        "filter_cached_path_s": round(second_s, 4),
    })


if __name__ == "__main__":
    main()
