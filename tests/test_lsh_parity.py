"""Recall parity vs the reference's LSH forest (VERDICT r1 #5).

Builds the behavioral oracle of lshtree.go (index/lsh_oracle.py) and our
sign-sketch index on the same seeded corpus, then compares recall@10 at the
same fraction of the database searched — the comparison the reference's own
TestCosineDistancePrecisionComparison (collection_test.go:23-103) makes
between exact and medium precision, here made head-to-head between the two
ANN structures."""

import math

import numpy as np
import pytest

from syzgydb_tpu.index.hamming import SignHashIndex
from syzgydb_tpu.index import lsh_oracle
from syzgydb_tpu.utils.rng import MyRandom


def _hamming_rank_np(qcode: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Host Hamming distances of one packed query vs all packed rows."""
    x = np.bitwise_xor(hashes, qcode[None, :])  # (N, words) uint32
    bits = np.unpackbits(x.view(np.uint8), axis=1)
    return bits.sum(axis=1)


def _exact_topk(db, q, k):
    qn = np.linalg.norm(q)
    vn = np.linalg.norm(db, axis=1)
    cos = np.clip(db @ q / np.where(vn * qn > 0, vn * qn, 1.0), -1, 1)
    d = np.arccos(cos) / math.pi
    return np.argsort(d, kind="stable")[:k]


@pytest.mark.parametrize("n,d", [(4000, 16)])
def test_sketch_recall_not_worse_than_reference_lsh(n, d):
    rng = np.random.default_rng(99)
    # clustered corpus (see bench.py): on iid data recall@10 is meaningless
    centers = rng.standard_normal((64, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, 64, size=n)
    db = centers[assign] + 0.35 * rng.standard_normal((n, d))
    db /= np.linalg.norm(db, axis=1, keepdims=True)

    forest = lsh_oracle.GoLSHForest("cosine", MyRandom(7))
    for i in range(n):
        forest.add(i, db[i])

    index = SignHashIndex(d, "cosine", MyRandom(7))
    hashes = index.encode_np(db)

    n_q, k = 25, 10
    queries = db[rng.integers(0, n, size=n_q)] + \
        0.2 * rng.standard_normal((n_q, d))
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    ref_recalls, ref_searched = [], []
    for q in queries:
        truth = set(_exact_topk(db, q, k).tolist())
        got, searched = lsh_oracle.knn_via_forest(forest, q, k)
        ref_recalls.append(len(truth & set(got)) / k)
        ref_searched.append(searched)

    budget = int(np.mean(ref_searched))  # same fraction of the DB touched
    our_recalls = []
    for q in queries:
        truth = set(_exact_topk(db, q, k).tolist())
        qc = index.encode_np(q)[0]
        ham = _hamming_rank_np(qc, hashes)
        cand = np.argpartition(ham, budget - 1)[:budget]
        top = cand[_exact_topk(db[cand], q, k)]
        our_recalls.append(len(truth & set(top.tolist())) / k)

    ref_recall = float(np.mean(ref_recalls))
    our_recall = float(np.mean(our_recalls))
    pct = budget / n * 100
    print(f"\nref LSH recall@10={ref_recall:.3f} "
          f"(searched {np.mean(ref_searched):.0f}/{n} = {pct:.1f}%)  "
          f"sketch recall@10={our_recall:.3f} at equal budget")
    # regression pin: at the SAME percent searched we must not lose to the
    # reference's tree
    assert our_recall >= ref_recall - 1e-9
    assert our_recall >= 0.9


def test_oracle_forest_structure_sane():
    """The oracle itself behaves like a forest: splits happen, search visits
    a subset, exhaustive visitation recovers everything."""
    rng = np.random.default_rng(5)
    n, d = 600, 8
    db = rng.standard_normal((n, d))
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    forest = lsh_oracle.GoLSHForest("cosine", MyRandom(3), threshold=50)
    for i in range(n):
        forest.add(i, db[i])
    assert any(not r.is_leaf for r in forest.roots)
    got, searched = lsh_oracle.knn_via_forest(forest, db[0], 5)
    assert 0 in got  # the point itself must be found
    assert searched <= n
