"""Distance semantics tests: device scoring vs the float64 host oracle, which
itself mirrors the reference loops (collection.go:812-832)."""

import jax.numpy as jnp
import numpy as np
import pytest

from syzgydb_tpu.ops import distance as dist_ops
from syzgydb_tpu.ops import quantize as qz


def test_euclidean_exact_values():
    # matches collection_test.go:12-21 style hand check
    a = np.array([1.0, 2.0, 3.0])
    b = np.array([4.0, 6.0, 3.0])
    assert dist_ops.euclidean_np(a, b) == pytest.approx(5.0)


def test_angular_semantics():
    a = np.array([1.0, 0.0])
    b = np.array([0.0, 1.0])
    assert dist_ops.angular_np(a, b) == pytest.approx(0.5)  # 90deg / 180deg
    assert dist_ops.angular_np(a, a) == pytest.approx(0.0)
    assert dist_ops.angular_np(a, -a) == pytest.approx(1.0)
    # zero vector -> max distance 1.0 (collection.go:828-829)
    z = np.zeros(2)
    assert dist_ops.angular_np(a, z) == 1.0
    assert dist_ops.angular_np(z, z) == 1.0


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
@pytest.mark.parametrize("bits", [4, 8, 16, 32, 64])
def test_score_block_matches_oracle(metric, bits, rng):
    n, d, q = 64, 24, 3
    db = rng.uniform(-1, 1, size=(n, d))
    queries = rng.uniform(-1, 1, size=(q, d))
    codes = qz.codes_to_device_repr(db, bits)
    norms = dist_ops.db_row_stats(codes, bits, d)
    valid = np.ones(n, dtype=bool)
    got = np.asarray(dist_ops.score_block(
        jnp.asarray(np.float32(queries)), jnp.asarray(codes),
        jnp.asarray(norms), jnp.asarray(valid), bits, metric, exact=True))
    # oracle: distance between raw query and the quantization-roundtripped DB
    seen = qz.quantization_roundtrip(db, bits)
    want = dist_ops.distance_np(queries[:, None, :], seen[None, :, :], metric)
    atol = 2e-3 if bits == 4 else 1e-3
    np.testing.assert_allclose(got, want, atol=atol)


def test_score_block_invalid_rows_inf(rng):
    n, d = 16, 8
    db = rng.uniform(-1, 1, size=(n, d))
    codes = qz.codes_to_device_repr(db, 32)
    norms = dist_ops.db_row_stats(codes, 32)
    valid = np.ones(n, dtype=bool)
    valid[3] = False
    out = np.asarray(dist_ops.score_block(
        jnp.asarray(np.float32(db[:1])), jnp.asarray(codes),
        jnp.asarray(norms), jnp.asarray(valid), 32, "euclidean"))
    assert np.isinf(out[0, 3])
    assert np.isfinite(out[0, 0])


def test_top_k_smallest(rng):
    d = rng.uniform(0, 10, size=(2, 50)).astype(np.float32)
    vals, idx = dist_ops.top_k_smallest(jnp.asarray(d), 5)
    vals, idx = np.asarray(vals), np.asarray(idx)
    for row in range(2):
        want = np.sort(d[row])[:5]
        np.testing.assert_allclose(vals[row], want, rtol=1e-6)
        np.testing.assert_allclose(d[row][idx[row]], vals[row], rtol=1e-6)


def test_code_matmul_wide_codes_never_default_precision():
    """score_block's non-fused fallback serves precision='high' results;
    >8-bit codes must not ride the TPU default one-bf16-pass matmul
    (CLAUDE.md invariant; review finding r5).  Pin via jaxpr — CPU
    matmuls are exact, so numerics tests can't catch it."""
    import jax

    d, n = 16, 64
    for bits in (16, 32, 64):
        codes = qz.codes_to_device_repr(
            np.random.default_rng(0).uniform(-1, 1, (n, d)), bits)
        norms = dist_ops.db_row_stats(codes, bits, d)
        jaxpr = str(jax.make_jaxpr(
            lambda q, c, nr, v: dist_ops.score_block(q, c, nr, v, bits,
                                                 "cosine", exact=False))(
            jnp.zeros((2, d), jnp.float32), jnp.asarray(codes),
            jnp.asarray(norms), jnp.ones(n, bool)))
        assert "HIGH" in jaxpr.upper(), bits  # HIGH or HIGHEST, never None
