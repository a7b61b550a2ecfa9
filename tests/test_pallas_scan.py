"""Fused Pallas scan kernel vs the XLA oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from syzgydb_tpu.ops import distance as dist_ops
from syzgydb_tpu.ops import pallas_scan
from syzgydb_tpu.ops import quantize as qz


def _ilv_kwargs(surface, codes, seg=4):
    """surface="ilv" rides the fused matmul+min kernel: needs the
    interleaved operand and an n % (128*seg) == 0 seg."""
    if surface != "ilv":
        return {"surface": surface}
    return {"codes_ilv": jnp.asarray(
        pallas_scan.make_ilv_codes(np.asarray(codes), seg)), "seg": seg}


@pytest.mark.parametrize("surface", ["xla", "ilv"])
@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
@pytest.mark.parametrize("bits", [4, 8, 16, 32])
def test_fused_scan_matches_xla(rng, metric, bits, surface):
    n, d, q, k, block = 512, 128, 4, 10, 128
    db = rng.uniform(-1, 1, size=(n, d))
    codes = qz.codes_to_device_repr(db, bits)
    norms = dist_ops.db_row_stats(codes, bits, d)
    valid = np.ones(n, dtype=bool)
    valid[100:110] = False
    queries = np.float32(rng.uniform(-1, 1, size=(q, d)))

    vals, rows = pallas_scan.fused_scan_topk(
        jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(norms),
        jnp.asarray(valid), bits=bits, metric=metric, k=k, block_n=block,
        interpret=True, **_ilv_kwargs(surface, codes))
    ref = dist_ops.score_block(jnp.asarray(queries), jnp.asarray(codes),
                               jnp.asarray(norms), jnp.asarray(valid),
                               bits, metric)
    ref_vals, ref_rows = dist_ops.top_k_smallest(ref, k)

    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                               atol=2e-5)
    for i in range(q):
        assert set(np.asarray(rows)[i].tolist()) == \
            set(np.asarray(ref_rows)[i].tolist())


@pytest.mark.parametrize("surface", ["xla", "ilv"])
def test_fused_scan_winners_in_late_blocks(rng, surface):
    """The threshold-skip must not drop winners that appear after the
    running top-k has tightened (the correctness-critical case)."""
    n, d, q, k, block = 1024, 64, 2, 16, 128
    db = rng.uniform(-1, 1, size=(n, d))
    queries = np.float32(rng.uniform(-1, 1, size=(q, d)))
    # plant near-duplicates of query 0 in the LAST block
    db[-5:] = queries[0] + 0.001 * rng.standard_normal((5, d))
    db = np.clip(db, -1, 1)
    codes = qz.codes_to_device_repr(db, 32)
    norms = dist_ops.db_row_stats(codes, 32)
    valid = np.ones(n, dtype=bool)
    vals, rows = pallas_scan.fused_scan_topk(
        jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(norms),
        jnp.asarray(valid), bits=32, metric="euclidean", k=k, block_n=block,
        interpret=True, **_ilv_kwargs(surface, codes))
    ref = dist_ops.score_block(jnp.asarray(queries), jnp.asarray(codes),
                               jnp.asarray(norms), jnp.asarray(valid),
                               32, "euclidean")
    ref_vals, ref_rows = dist_ops.top_k_smallest(ref, k)
    # near-duplicate euclidean distances lose ~1e-4 absolute to f32
    # cancellation in the dot-product form (both paths do; they just round
    # differently) — values compare loosely, the row SETS must agree
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                               atol=5e-4)
    for i in range(q):
        assert set(np.asarray(rows)[i].tolist()) == \
            set(np.asarray(ref_rows)[i].tolist())
    assert set(np.asarray(rows)[0].tolist()) >= {n - 5, n - 4, n - 3,
                                                 n - 2, n - 1}


@pytest.mark.parametrize("surface", ["xla", "ilv"])
def test_fused_scan_duplicate_distances(rng, surface):
    """Exact duplicates (tied distances) across blocks: the merge must keep
    k distinct rows, never repeat one."""
    n, d, q, k, block = 512, 32, 1, 8, 128
    base = rng.uniform(-1, 1, size=(d,))
    db = np.tile(base, (n, 1))  # all rows identical -> all ties
    codes = qz.codes_to_device_repr(db, 32)
    norms = dist_ops.db_row_stats(codes, 32)
    valid = np.ones(n, dtype=bool)
    queries = np.float32(base[None, :])
    vals, rows = pallas_scan.fused_scan_topk(
        jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(norms),
        jnp.asarray(valid), bits=32, metric="euclidean", k=k, block_n=block,
        interpret=True, **_ilv_kwargs(surface, codes))
    r = np.asarray(rows)[0]
    assert len(set(r.tolist())) == k  # distinct rows
    # f32 cancellation in the dot-product form leaves a ~sqrt(1e-6) residue
    np.testing.assert_allclose(np.asarray(vals)[0], 0.0, atol=2e-3)


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_ilv_segmins_match_xla_exact(rng, metric):
    """The interleaved fused matmul+min kernel must produce the SAME f32
    segment minima, in the same (original) segment order, as the exact XLA
    surface — including +inf for all-invalid segments."""
    import jax
    n, d, q, seg = 2048, 128, 8, 8
    db = rng.uniform(-1, 1, size=(n, d))
    codes = qz.codes_to_device_repr(db, 32)
    norms = dist_ops.db_row_stats(codes, 32)
    valid = np.ones(n, dtype=bool)
    valid[64:80] = False  # two whole segments invalid
    valid[3] = False
    queries = np.float32(rng.uniform(-1, 1, size=(q, d)))
    ilv = jnp.asarray(pallas_scan.make_ilv_codes(codes, seg))
    got = pallas_scan.segment_min_scan_ilv(
        jnp.asarray(queries), ilv, jnp.asarray(norms), jnp.asarray(valid),
        bits=32, metric=metric, seg=seg, exact=True, interpret=True)
    want = pallas_scan.segment_min_scan_xla(
        jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(norms),
        jnp.asarray(valid), bits=32, metric=metric, seg=seg, exact=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    assert np.isinf(np.asarray(got)[:, 8:10]).all()


@pytest.mark.parametrize("surface", ["xla", "ilv"])
def test_fused_scan_large_k_radius_shape(rng, surface):
    """The radius-escalation shape (small Q, k up to 1024) rides the fused
    path within the gather budget — results must match the full-surface
    oracle."""
    n, d, q, k = 4096, 64, 2, 500
    assert pallas_scan.fused_k_ok(k, q)
    assert not pallas_scan.fused_k_ok(k, 1024)  # big batches stay off
    db = rng.uniform(-1, 1, size=(n, d))
    codes = qz.codes_to_device_repr(db, 8)
    norms = dist_ops.db_row_stats(codes, 8, d)
    valid = np.ones(n, dtype=bool)
    valid[7:19] = False
    queries = np.float32(rng.uniform(-1, 1, size=(q, d)))
    vals, rows = pallas_scan.fused_scan_topk(
        jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(norms),
        jnp.asarray(valid), bits=8, metric="euclidean", k=k, block_n=512,
        interpret=True, **_ilv_kwargs(surface, codes))
    ref = dist_ops.score_block(jnp.asarray(queries), jnp.asarray(codes),
                               jnp.asarray(norms), jnp.asarray(valid),
                               8, "euclidean")
    ref_vals, ref_rows = dist_ops.top_k_smallest(ref, k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                               atol=2e-4)
    for i in range(q):
        assert set(np.asarray(rows)[i].tolist()) == \
            set(np.asarray(ref_rows)[i].tolist())


def test_scatter_ilv_matches_rebuild(rng):
    """Collection's donated ilv scatter must equal rebuilding the
    interleaved operand from the scattered codes (incl. dropping the
    pad index == capacity)."""
    from syzgydb_tpu.core.collection import _scatter_ilv_apply
    n, w = 2 * 128 * 64, 16
    codes = rng.integers(0, 255, size=(n, w), dtype=np.uint8)
    ilv = jnp.asarray(pallas_scan.make_ilv_codes(codes))
    rows = np.array([0, 1, 63, 64, 8191, 8192, 12345, n], dtype=np.int32)
    c_new = rng.integers(0, 255, size=(len(rows), w), dtype=np.uint8)
    got = _scatter_ilv_apply(ilv, jnp.asarray(rows), jnp.asarray(c_new))
    ref = codes.copy()
    ref[rows[:-1]] = c_new[:-1]
    np.testing.assert_array_equal(np.asarray(got),
                                  pallas_scan.make_ilv_codes(ref))


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


def test_pallas_hamming_bf16_matches_uint8(rng):
    from syzgydb_tpu.ops import pallas_hamming
    q, n, w = 4, 512, 5
    qcodes = rng.integers(0, 2**32, size=(q, w), dtype=np.uint32)
    hashes = rng.integers(0, 2**32, size=(n, w), dtype=np.uint32)
    valid = np.ones(n, dtype=bool)
    valid[7:19] = False
    u8 = np.asarray(pallas_hamming.hamming_scores(
        jnp.asarray(qcodes), jnp.asarray(hashes), words=w, block_n=128,
        interpret=True))
    bf = np.asarray(pallas_hamming.hamming_scores_bf16(
        jnp.asarray(qcodes), jnp.asarray(hashes), jnp.asarray(valid),
        words=w, block_n=128, interpret=True)).astype(np.float32)
    np.testing.assert_array_equal(bf[:, valid], u8[:, valid].astype(np.float32))
    assert (bf[:, ~valid] == 16384.0).all()
