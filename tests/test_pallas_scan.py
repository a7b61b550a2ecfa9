"""Fused Pallas scan kernel vs the XLA oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from syzgydb_tpu.ops import distance as dist_ops
from syzgydb_tpu.ops import pallas_scan
from syzgydb_tpu.ops import quantize as qz


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
@pytest.mark.parametrize("bits", [8, 32])
def test_fused_scan_matches_xla(rng, metric, bits):
    n, d, q, k, block = 512, 128, 4, 10, 128
    db = rng.uniform(-1, 1, size=(n, d))
    codes = qz.codes_to_device_repr(db, bits)
    norms = dist_ops.db_row_stats(codes, bits)
    valid = np.ones(n, dtype=bool)
    valid[100:110] = False
    queries = np.float32(rng.uniform(-1, 1, size=(q, d)))

    vals, rows = pallas_scan.fused_scan_topk(
        jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(norms),
        jnp.asarray(valid), bits=bits, metric=metric, k=k, block_n=block,
        interpret=True)
    ref = dist_ops.score_block(jnp.asarray(queries), jnp.asarray(codes),
                               jnp.asarray(norms), jnp.asarray(valid),
                               bits, metric)
    ref_vals, ref_rows = dist_ops.top_k_smallest(ref, k)

    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                               atol=2e-5)
    for i in range(q):
        assert set(np.asarray(rows)[i].tolist()) == \
            set(np.asarray(ref_rows)[i].tolist())


def test_fused_scan_k_larger_than_block(rng):
    n, d, q, block = 256, 64, 2, 128
    db = rng.uniform(-1, 1, size=(n, d))
    codes = qz.codes_to_device_repr(db, 32)
    norms = dist_ops.db_row_stats(codes, 32)
    valid = np.ones(n, dtype=bool)
    queries = np.float32(rng.uniform(-1, 1, size=(q, d)))
    vals, rows = pallas_scan.fused_scan_topk(
        jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(norms),
        jnp.asarray(valid), bits=32, metric="euclidean", k=150, block_n=block,
        interpret=True)
    # k clamps to block_n per block; the merge still returns 150 valid rows
    assert vals.shape == (q, 150)
    d_all = np.asarray(dist_ops.score_block(
        jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(norms),
        jnp.asarray(valid), 32, "euclidean"))
    want = np.sort(d_all, axis=1)[:, :150]
    # per-block top-128 then merge can only miss rows beyond rank 128 of a
    # single block; with two blocks of 128 the union is exact
    np.testing.assert_allclose(np.asarray(vals), want, atol=2e-5)


def test_pallas_hamming_matches_xla(rng):
    from syzgydb_tpu.ops import pallas_hamming
    import jax
    q, n, w = 4, 512, 5
    qcodes = rng.integers(0, 2**32, size=(q, w), dtype=np.uint32)
    hashes = rng.integers(0, 2**32, size=(n, w), dtype=np.uint32)
    got = np.asarray(pallas_hamming.hamming_scores(
        jnp.asarray(qcodes), jnp.asarray(hashes), words=w, block_n=128,
        interpret=True))
    # oracle: bit_count of xor
    want = np.zeros((q, n), dtype=np.int64)
    for i in range(q):
        for ww in range(w):
            x = np.bitwise_xor(qcodes[i, ww], hashes[:, ww])
            want[i] += np.vectorize(lambda v: bin(v).count("1"))(x)
    np.testing.assert_array_equal(got.astype(np.int64), want)
