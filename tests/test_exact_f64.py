"""precision="exact" must match the reference's all-f64 distance semantics
(collection.go:812-832) at EVERY scale — including above the host-scan
threshold where distances come from an f32 device shortlist that the
collection re-ranks in f64 (VERDICT r2 missing #4).

The adversarial corpora here put many rows at f32-IDENTICAL distances that
differ only at f64 resolution (1e-12-level deltas the f32 truncation
erases), so any path that trusts f32 ordering returns wrong ranks."""

import numpy as np
import pytest

from syzgydb_tpu import Collection, CollectionOptions, SearchArgs, EUCLIDEAN
from syzgydb_tpu.core.collection import HOST_SCAN_MAX_ELEMS
from syzgydb_tpu.ops import distance as dist_ops
from syzgydb_tpu.ops import quantize as qz


def test_dequant_uses_reference_f64_formula():
    """Host decode must equal (codes/maxint)*2-1 BITWISE (the affine form
    differs by one f64 ulp for some codes)."""
    for bits in (8, 16):
        maxint = {8: 255, 16: 65535}[bits]
        codes = np.arange(maxint + 1, dtype=np.uint64)
        ref = qz.dequantize_np(codes, bits)
        half = (maxint + 1) // 2
        centered = (codes.astype(np.int64) - half).astype(
            qz.device_dtype(bits))
        got = qz.device_repr_to_float(centered[None, :], bits)[0]
        assert np.array_equal(ref, got)


def _adversarial_collection(path, n, d, quant, n_ties, tie_base=0.5):
    """Rows 0..n_ties-1 sit at euclidean distance tie_base + i*1e-12 from
    the zero query (f32-identical, f64-distinct); the rest are far."""
    rng = np.random.default_rng(3)
    vecs = np.zeros((n, d))
    vecs[:n_ties, 0] = tie_base + np.arange(n_ties) * 1e-12
    far = rng.uniform(0.1, 0.9, size=(n - n_ties, d))
    far /= np.linalg.norm(far, axis=1, keepdims=True) / \
        rng.uniform(1.5, 2.0, size=(n - n_ties, 1))
    vecs[n_ties:] = np.clip(far, -1, 1)
    c = Collection(CollectionOptions(
        name=path, distance_method=EUCLIDEAN, dimension_count=d,
        quantization=quant, create_and_overwrite=True, index_seed=5))
    c.add_documents(list(range(n)), vecs, [b"{}"] * n)
    return c, vecs


def test_exact_knn_matches_f64_oracle_beyond_host_threshold(tmp_path):
    n, d, k = 8192, 384, 10
    assert n * d > HOST_SCAN_MAX_ELEMS  # forces the device shortlist path
    c, vecs = _adversarial_collection(str(tmp_path / "a.dat"), n, d, 64,
                                      n_ties=100)
    q = np.zeros(d)
    res = c.search(SearchArgs(vector=q, k=k, precision="exact"))

    stored = qz.quantization_roundtrip(vecs, 64)  # identity for 64-bit
    d64 = dist_ops.distance_np(q[None, :], stored, "euclidean")
    want = np.argsort(d64, kind="stable")[:k]
    got = [r.id for r in res.results]
    assert got == [int(i) for i in want], (got, want)
    for r, i in zip(res.results, want):
        assert r.distance == float(d64[i])  # bit-for-bit f64
    c.close()


def test_exact_knn_f64_16bit_quantization(tmp_path):
    """Integer-quantized codes must also rank by the f64 dequant math."""
    n, d, k = 8192, 384, 5
    rng = np.random.default_rng(11)
    vecs = rng.uniform(-1, 1, size=(n, d))
    c = Collection(CollectionOptions(
        name=str(tmp_path / "b.dat"), distance_method=EUCLIDEAN,
        dimension_count=d, quantization=16, create_and_overwrite=True,
        index_seed=5))
    c.add_documents(list(range(n)), vecs, [b"{}"] * n)
    q = rng.uniform(-1, 1, size=d)
    res = c.search(SearchArgs(vector=q, k=k, precision="exact"))
    stored = qz.quantization_roundtrip(vecs, 16)
    d64 = dist_ops.distance_np(q[None, :], stored, "euclidean")
    want = np.argsort(d64, kind="stable")[:k]
    assert [r.id for r in res.results] == [int(i) for i in want]
    for r, i in zip(res.results, want):
        assert r.distance == float(d64[i])
    c.close()


def test_exact_radius_f64_boundary(tmp_path):
    """Rows 1e-10 inside vs outside the radius are f32-indistinguishable;
    the exact radius filter must resolve them in f64."""
    n, d = 8192, 384
    radius = 0.5
    c, vecs = _adversarial_collection(str(tmp_path / "c.dat"), n, d, 64,
                                      n_ties=0)
    # overwrite rows 0/1: one just inside, one just outside the radius
    inside = np.zeros(d)
    inside[0] = radius - 1e-10
    outside = np.zeros(d)
    outside[0] = radius + 1e-10
    c.add_document(0, inside, b"{}")
    c.add_document(1, outside, b"{}")
    res = c.search(SearchArgs(vector=np.zeros(d), radius=radius,
                              precision="exact"))
    ids = {r.id for r in res.results}
    assert 0 in ids and 1 not in ids, ids
    # results ascending by f64 distance
    dd = [r.distance for r in res.results]
    assert dd == sorted(dd)
    c.close()


def test_exact_small_collection_still_f64(tmp_path):
    """The host fast path keeps full-f64 64-bit vectors now (the column
    store no longer truncates them to f32 at ingest)."""
    n, d, k = 64, 8, 3
    c, vecs = _adversarial_collection(str(tmp_path / "d.dat"), n, d, 64,
                                      n_ties=20)
    q = np.zeros(d)
    res = c.search(SearchArgs(vector=q, k=k, precision="exact"))
    d64 = dist_ops.distance_np(q[None, :], vecs, "euclidean")
    want = np.argsort(d64, kind="stable")[:k]
    assert [r.id for r in res.results] == [int(i) for i in want]
    c.close()


def test_exact_f64_survives_reopen(tmp_path):
    """The f64 codes rebuild losslessly from the span log on reopen."""
    n, d, k = 512, 8, 4
    path = str(tmp_path / "e.dat")
    c, vecs = _adversarial_collection(path, n, d, 64, n_ties=30)
    c.close()
    c2 = Collection(CollectionOptions(name=path, dimension_count=d))
    assert c2.columns.codes.dtype == np.float64
    q = np.zeros(d)
    res = c2.search(SearchArgs(vector=q, k=k, precision="exact"))
    d64 = dist_ops.distance_np(q[None, :], vecs, "euclidean")
    want = np.argsort(d64, kind="stable")[:k]
    assert [r.id for r in res.results] == [int(i) for i in want]
    c2.close()
