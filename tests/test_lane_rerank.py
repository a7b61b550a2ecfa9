"""Tile-aligned lane rerank (ops/pallas_scan.make_lane_slab/_lane_dots).

The lane path changes the CANDIDATE GATHER + contraction layout of the
fused scan's stage 2, not its semantics: results and the provable-
completeness flag must match the (Q, C, D) gather path, and the slab
device state must stay in sync with the codes through scatter updates
(core/collection._scatter_slab_apply).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from syzgydb_tpu.ops import distance as dist_ops
from syzgydb_tpu.ops import pallas_scan
from syzgydb_tpu.ops import quantize as qz


def _corpus(rng, n, d, bits, zero_rows=()):
    db = rng.uniform(-1, 1, size=(n, d))
    for r in zero_rows:
        db[r] = 0.0
    codes = qz.codes_to_device_repr(db, bits)
    norms = dist_ops.db_row_stats(codes, bits, d)
    valid = np.ones(n, dtype=bool)
    valid[n // 2: n // 2 + 7] = False
    return db, codes, norms, valid


@pytest.mark.parametrize("bits,metric", [
    (8, "cosine"), (8, "euclidean"),
    (16, "cosine"), (32, "euclidean"), (64, "cosine"),
])
def test_lane_matches_gather_path(rng, bits, metric):
    n, d, q, k, seg = 4096, 128, 8, 10, 32
    db, codes, norms, valid = _corpus(rng, n, d, bits, zero_rows=(5,))
    queries = np.float32(rng.uniform(-1, 1, size=(q, d)))
    queries[3] = 0.0  # zero-vector query: reference semantics both paths
    args = (jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(norms),
            jnp.asarray(valid))
    slab = pallas_scan.make_lane_slab(args[1], seg=seg)
    kw = dict(bits=bits, metric=metric, k=k, block_n=1024, seg=seg,
              surface="xla", with_ties=True)
    d_ref, r_ref, ok_ref = pallas_scan.fused_scan_topk(*args, **kw)
    d_ln, r_ln, ok_ln = pallas_scan.fused_scan_topk(*args, slab, **kw)
    # same candidate order -> identical tie-breaking; distances agree to
    # f32 accumulation-order noise
    np.testing.assert_array_equal(np.asarray(r_ref), np.asarray(r_ln))
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_ln),
                               atol=2e-6, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_ln))


def test_lane_slab_shape_guard():
    assert pallas_scan.lane_slab_supported(8, 128)
    assert pallas_scan.lane_slab_supported(32, 384)
    assert not pallas_scan.lane_slab_supported(4, 128)   # packed nibbles
    assert not pallas_scan.lane_slab_supported(8, 100)   # partial lanes


def test_lane_slab_layout_identity(rng):
    """Row r of the codes occupies lane rows [r*Lr, (r+1)*Lr) of the
    flattened slab — the identity _scatter_slab_apply depends on."""
    n, d, seg = 512, 256, 32
    codes = rng.integers(-128, 128, size=(n, d)).astype(np.int8)
    slab = np.asarray(pallas_scan.make_lane_slab(jnp.asarray(codes),
                                                 seg=seg))
    lr = d // 128
    flat = slab.reshape(n * lr, 128)
    np.testing.assert_array_equal(flat.reshape(n, d), codes)


def test_collection_lane_slab_sync(tmp_path, monkeypatch):
    """Collection keeps the slab as derived device state: created on full
    upload, scatter-updated in step with the codes, and precision="high"
    results stay exact through mutations."""
    from syzgydb_tpu import (Collection, CollectionOptions, SearchArgs,
                             COSINE)
    monkeypatch.setattr(pallas_scan, "supported", lambda: True)
    # keep the CPU run off the real ilv kernel (interpret-only here)
    monkeypatch.setattr(pallas_scan, "ilv_supported",
                        lambda *a, **k: False)

    n, d, k = 2048, 128, 5
    rng = np.random.default_rng(11)
    db = rng.standard_normal((n, d))
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    c = Collection(CollectionOptions(
        name=str(tmp_path / "lane.dat"), distance_method=COSINE,
        dimension_count=d, quantization=8, create_and_overwrite=True,
        index_seed=3))
    c.add_documents(list(range(n)), db, [b"{}"] * n)

    q = db[7] + 0.01 * rng.standard_normal(d)
    out = c.search(SearchArgs(vector=q, k=k, precision="high"))
    dev = c._device_state()
    assert "slab" in dev
    lr = d // 128
    np.testing.assert_array_equal(
        np.asarray(dev["slab"]).reshape(-1, d)[:n],
        np.asarray(dev["codes"])[:n])
    assert out.results[0].id == 7

    # mutations ride the scatter path; the slab must follow the codes
    upd = rng.standard_normal((16, d))
    upd /= np.linalg.norm(upd, axis=1, keepdims=True)
    c.add_documents(list(range(100, 116)), upd, [b"{}"] * 16)
    c.remove_document(7)
    out2 = c.search(SearchArgs(vector=upd[0], k=k, precision="high"))
    dev2 = c._device_state()
    assert c.sync_stats["scatter"] >= 1
    np.testing.assert_array_equal(
        np.asarray(dev2["slab"]).reshape(-1, d)[:n],
        np.asarray(dev2["codes"])[:n])
    assert out2.results[0].id == 100
    # the deleted doc is gone from results
    out3 = c.search(SearchArgs(vector=q, k=k, precision="high"))
    assert all(r.id != 7 for r in out3.results)
    c.close()


@pytest.mark.parametrize("data,feature", [(8, 1), (4, 2), (2, 1)])
@pytest.mark.parametrize("bits,metric", [(8, "cosine"), (32, "euclidean")])
def test_mesh_lane_matches_unsharded(rng, data, feature, bits, metric):
    """sharded_exact_topk with a lane slab must agree with the plain
    sharded path and the single-device oracle on every mesh shape whose
    feature shards hold whole lanes."""
    import jax
    from syzgydb_tpu.parallel import mesh as mesh_mod
    from syzgydb_tpu.parallel import search as psearch

    n, d, k = 1024, 256, 10
    m = mesh_mod.make_mesh(mesh_mod.MeshConfig(data=data, feature=feature),
                           jax.devices()[: data * feature])
    assert psearch.lane_ok_mesh(m, bits, d, n)
    db = rng.uniform(-1, 1, size=(n, d))
    codes = jnp.asarray(qz.codes_to_device_repr(db, bits))
    norms = jnp.asarray(dist_ops.db_row_stats(np.asarray(codes), bits, d))
    valid_np = np.ones(n, dtype=bool)
    valid_np[50:60] = False
    valid = jnp.asarray(valid_np)
    queries = jnp.asarray(np.float32(rng.uniform(-1, 1, size=(4, d))))

    slab = psearch.sharded_lane_slab(m, codes)
    kw = dict(bits=bits, metric=metric, k=k, with_ties=True)
    d_ref, r_ref, ok_ref = psearch.sharded_exact_topk(
        m, queries, codes, norms, valid, **kw)
    d_ln, r_ln, ok_ln = psearch.sharded_exact_topk(
        m, queries, codes, norms, valid, slab, **kw)
    np.testing.assert_array_equal(np.asarray(r_ref), np.asarray(r_ln))
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_ln),
                               atol=2e-6, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_ln))
    # and against the unsharded oracle
    ref = dist_ops.score_block(queries, codes, norms, valid, bits, metric,
                               exact=True)
    _, oracle_rows = dist_ops.top_k_smallest(ref, k)
    for i in range(4):
        assert set(np.asarray(r_ln)[i].tolist()) == \
            set(np.asarray(oracle_rows)[i].tolist())


def test_mesh_lane_collection_state(tmp_path, monkeypatch):
    """Under a mesh placement the Collection derives the sharded lane slab
    (TPU-gated in production; forced here), rebuilds it through scatter
    syncs, and keeps returning exact results."""
    import jax
    from syzgydb_tpu import (Collection, CollectionOptions, SearchArgs,
                             COSINE)
    from syzgydb_tpu.parallel import mesh as mesh_mod
    from syzgydb_tpu.parallel import search as psearch
    monkeypatch.setattr(pallas_scan, "supported", lambda: True)
    # keep the CPU run off the real ilv kernel (interpret-only here) —
    # the MESH path gates on ilv_ok_mesh, not ilv_supported
    monkeypatch.setattr(psearch, "ilv_ok_mesh", lambda *a, **k: False)
    monkeypatch.setattr(pallas_scan, "ilv_supported",
                        lambda *a, **k: False)

    n, d = 1024, 256
    rng = np.random.default_rng(9)
    db = rng.standard_normal((n, d))
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    c = Collection(CollectionOptions(
        name=str(tmp_path / "meshlane.dat"), distance_method=COSINE,
        dimension_count=d, quantization=8, create_and_overwrite=True,
        index_seed=3))
    # collection-integrated meshes shard N only (use_mesh contract)
    c.use_mesh(mesh_mod.make_mesh(
        mesh_mod.MeshConfig(data=8, feature=1), jax.devices()[:8]))
    c.add_documents(list(range(n)), db, [b"{}"] * n)
    out = c.search(SearchArgs(vector=db[11], k=5, precision="high"))
    assert "slab" in c._device_state()
    assert out.results[0].id == 11
    # scatter sync rebuilds the sharded slab
    upd = rng.standard_normal((8, d))
    upd /= np.linalg.norm(upd, axis=1, keepdims=True)
    c.add_documents(list(range(2000, 2008)), upd, [b"{}"] * 8)
    out2 = c.search(SearchArgs(vector=upd[3], k=5, precision="high"))
    assert out2.results[0].id == 2003
    c.close()


def test_collection_no_slab_for_packed_or_ragged(tmp_path, monkeypatch):
    """4-bit packed codes and dims not divisible by 128 stay on the
    gather path (no slab) and still answer exactly."""
    from syzgydb_tpu import (Collection, CollectionOptions, SearchArgs,
                             COSINE)
    monkeypatch.setattr(pallas_scan, "supported", lambda: True)
    # keep the CPU run off the real ilv kernel (interpret-only here)
    monkeypatch.setattr(pallas_scan, "ilv_supported",
                        lambda *a, **k: False)
    rng = np.random.default_rng(5)
    for quant, d in ((4, 128), (8, 96)):
        db = rng.standard_normal((256, d))
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        c = Collection(CollectionOptions(
            name=str(tmp_path / f"ns{quant}_{d}.dat"),
            distance_method=COSINE, dimension_count=d, quantization=quant,
            create_and_overwrite=True, index_seed=3))
        c.add_documents(list(range(256)), db, [b"{}"] * 256)
        out = c.search(SearchArgs(vector=db[9], k=3, precision="high"))
        assert "slab" not in c._device_state()
        assert out.results[0].id == 9
        c.close()
