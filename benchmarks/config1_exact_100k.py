"""BASELINE config 1: 100k x 128-d, 64-bit (full precision), cosine,
exhaustive top-10 — the CPU-runnable reference point, exercised through the
full Collection API (storage + columns + device scan)."""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from benchmarks.common import Timer, emit, log, make_vectors, scale  # noqa: E402


def main():
    from syzgydb_tpu import (Collection, CollectionOptions, SearchArgs,
                             COSINE)
    from syzgydb_tpu.ops import distance as dist_ops

    n = max(2000, int(100_000 * scale()))
    d, k, n_queries = 128, 10, 32
    rng = np.random.default_rng(1)
    vecs = make_vectors(rng, n, d)
    queries = make_vectors(rng, n_queries, d)

    with tempfile.TemporaryDirectory() as tmp:
        t = Timer()
        c = Collection(CollectionOptions(
            name=os.path.join(tmp, "c1.dat"), distance_method=COSINE,
            dimension_count=d, quantization=64, create_and_overwrite=True,
            index_seed=1))
        c.add_documents(list(range(n)), vecs, [b"{}"] * n)
        ingest_s = t.lap()
        log(f"ingested {n} docs in {ingest_s:.1f}s")

        # warm the jit + device cache
        c.search(SearchArgs(vector=queries[0], k=k, precision="exact"))
        t.lap()
        lat = []
        for q in queries:
            res = c.search(SearchArgs(vector=q, k=k, precision="exact"))
            lat.append(res.search_time_ms)
            assert res.percent_searched == 100.0
        total = t.lap()

        # correctness vs f64 oracle on one query
        truth = np.argsort(dist_ops.angular_np(
            queries[-1][None, :], vecs))[:k]
        got = [r.id for r in res.results]
        agree = len(set(truth.tolist()) & set(got)) / k
        c.close()

    emit({
        "metric": "config1_exact_qps_100kx128d_64bit_cosine",
        "value": round(n_queries / total, 2),
        "unit": "queries/s",
        "n": n,
        "median_latency_ms": round(float(np.median(lat)), 2),
        "ingest_docs_per_s": round(n / ingest_s, 1),
        "oracle_agreement": agree,
    })


if __name__ == "__main__":
    main()
