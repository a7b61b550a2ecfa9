"""Head-to-head recall: reference LSH forest oracle vs our sketch index.

Produces the BASELINE.md "Go LSH vs sketch ANN at equal %-searched" table
(VERDICT r1 #5).  Mirrors the reference's own quality test protocol
(collection_test.go:23-103: 20k vectors, cosine, exact-vs-medium top-10)
but compares the two ANN structures at matched candidate budgets.

Run on the host (no TPU needed):
    PYTHONPATH=. python benchmarks/lsh_parity.py
"""

import math
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from syzgydb_tpu.index.hamming import SignHashIndex  # noqa: E402
from syzgydb_tpu.index import lsh_oracle  # noqa: E402
from syzgydb_tpu.utils.rng import MyRandom  # noqa: E402


def exact_topk(db, q, k):
    qn = np.linalg.norm(q)
    vn = np.linalg.norm(db, axis=1)
    cos = np.clip(db @ q / np.where(vn * qn > 0, vn * qn, 1.0), -1, 1)
    d = np.arccos(cos) / math.pi
    return np.argsort(d, kind="stable")[:k]


def hamming_rank(qcode, hashes):
    x = np.bitwise_xor(hashes, qcode[None, :])
    return np.unpackbits(x.view(np.uint8), axis=1).sum(axis=1)


def run(n, d, n_clusters, n_q=50, k=10, seed=11):
    rng = np.random.default_rng(seed)
    if n_clusters:
        centers = rng.standard_normal((n_clusters, d))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        db = centers[rng.integers(0, n_clusters, size=n)] + \
            0.35 * rng.standard_normal((n, d))
    else:
        db = rng.standard_normal((n, d))
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    queries = db[rng.integers(0, n, size=n_q)] + \
        0.2 * rng.standard_normal((n_q, d))
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    t0 = time.time()
    forest = lsh_oracle.GoLSHForest("cosine", MyRandom(7))
    for i in range(n):
        forest.add(i, db[i])
    build_s = time.time() - t0

    index = SignHashIndex(d, "cosine", MyRandom(7))
    hashes = index.encode_np(db)

    ref_recalls, ref_searched = [], []
    for q in queries:
        truth = set(exact_topk(db, q, k).tolist())
        got, searched = lsh_oracle.knn_via_forest(forest, q, k)
        ref_recalls.append(len(truth & set(got)) / k)
        ref_searched.append(searched)
    budget = int(np.mean(ref_searched))

    our_recalls = []
    for q in queries:
        truth = set(exact_topk(db, q, k).tolist())
        qc = index.encode_np(q)[0]
        ham = hamming_rank(qc, hashes)
        cand = np.argpartition(ham, budget - 1)[:budget]
        top = cand[exact_topk(db[cand], q, k)]
        our_recalls.append(len(truth & set(top.tolist())) / k)

    print(f"| {n} x {d}d ({'clustered' if n_clusters else 'iid'}) "
          f"| {np.mean(ref_recalls):.3f} | {budget / n * 100:.1f}% "
          f"| {np.mean(our_recalls):.3f} | (forest build {build_s:.1f}s) |")


if __name__ == "__main__":
    print("| corpus | Go-LSH recall@10 | %searched | sketch recall@10 "
          "@ equal budget | note |")
    print("|---|---|---|---|---|")
    run(20000, 3, 0)      # the reference test's own corpus shape
    run(20000, 64, 256)   # clustered, higher-D (realistic embeddings)
    run(20000, 384, 512)  # bench-like dimensionality
