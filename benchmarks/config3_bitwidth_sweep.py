"""BASELINE config 3: SIFT1M-style 1M x 128-d euclidean — top-100 + radius
search with a recall-vs-bit-width sweep (4/8/16/32-bit quantization)."""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from benchmarks.common import (Timer, emit, log, make_vectors, recall_at_k,
                               scale)  # noqa: E402


def main():
    from syzgydb_tpu import (Collection, CollectionOptions, SearchArgs,
                             EUCLIDEAN)

    n = max(5000, int(1_000_000 * scale()))
    d, k, n_queries = 128, 100, 16
    rng = np.random.default_rng(3)
    # SIFT-like: non-negative, clumped magnitudes, scaled into [-1,1] for
    # the linear quantizer's range
    vecs = np.abs(make_vectors(rng, n, d, normalize=False)) * 0.25
    queries = vecs[rng.integers(0, n, n_queries)] + \
        0.02 * rng.standard_normal((n_queries, d), dtype=np.float32)

    sweep = []
    truth = None
    for bits in (32, 16, 8, 4):
        with tempfile.TemporaryDirectory() as tmp:
            t = Timer()
            c = Collection(CollectionOptions(
                name=os.path.join(tmp, f"c3_{bits}.dat"),
                distance_method=EUCLIDEAN, dimension_count=d,
                quantization=bits, create_and_overwrite=True, index_seed=3))
            c.add_documents(list(range(n)), vecs, [b"{}"] * n)
            log(f"[{bits}b] ingested in {t.lap():.1f}s")

            got = np.empty((n_queries, k), dtype=np.int64)
            c.search(SearchArgs(vector=queries[0], k=k, precision="exact"))
            t.lap()
            for i, q in enumerate(queries):
                res = c.search(SearchArgs(vector=q, k=k, precision="exact"))
                got[i] = [r.id for r in res.results]
            exact_s = t.lap()
            if bits == 32:
                truth = got.copy()  # 32-bit scan = ground truth for sweep
            rec = recall_at_k(truth, got, k) if truth is not None else 1.0

            # radius search sized to enclose ~k/2 of the SAME query's
            # neighbors so hit counts are meaningful
            probe = c.search(SearchArgs(vector=queries[0], k=k,
                                        precision="exact"))
            radius = float(probe.results[k // 2].distance)
            rres = c.search(SearchArgs(vector=queries[0], radius=radius,
                                       precision="exact"))
            sweep.append({"bits": bits, "recall_at_100_vs_32bit": round(rec, 4),
                          "exact_qps": round(n_queries / exact_s, 2),
                          "radius_hits": len(rres.results)})
            log(f"[{bits}b] {sweep[-1]}")
            c.close()

    emit({
        "metric": "config3_bitwidth_recall_sweep_euclidean_top100",
        "value": sweep[2]["recall_at_100_vs_32bit"],  # 8-bit headline
        "unit": "recall@100",
        "n": n,
        "sweep": sweep,
    })


if __name__ == "__main__":
    main()
