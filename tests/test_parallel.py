"""Multi-device sharding tests on the virtual 8-CPU mesh: sharded search must
agree with the single-device oracle for every mesh shape and quantization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syzgydb_tpu.index.hamming import SignHashIndex
from syzgydb_tpu.ops import distance as dist_ops
from syzgydb_tpu.ops import quantize as qz
from syzgydb_tpu.parallel import mesh as mesh_mod
from syzgydb_tpu.parallel import search as psearch
from syzgydb_tpu.utils.rng import MyRandom


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def _setup(rng, n=512, d=32, bits=8):
    db = rng.uniform(-1, 1, size=(n, d))
    codes = qz.codes_to_device_repr(db, bits)
    norms = dist_ops.db_row_stats(codes, bits, d)
    valid = np.ones(n, dtype=bool)
    queries = np.float32(rng.uniform(-1, 1, size=(4, d)))
    return db, codes, norms, valid, queries


@pytest.mark.parametrize("data,feature", [(8, 1), (4, 2), (2, 4), (4, 1)])
@pytest.mark.parametrize("bits", [4, 8, 32])
def test_sharded_exact_matches_single_device(rng, data, feature, bits):
    m = mesh_mod.make_mesh(mesh_mod.MeshConfig(data=data, feature=feature),
                           jax.devices()[: data * feature])
    db, codes, norms, valid, queries = _setup(rng, bits=bits)
    k = 10
    sd_dist, sd_idx = psearch.sharded_exact_topk(
        m, jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(norms),
        jnp.asarray(valid), bits=bits, metric="euclidean", k=k, exact=True)
    ref = dist_ops.score_block(jnp.asarray(queries), jnp.asarray(codes),
                               jnp.asarray(norms), jnp.asarray(valid),
                               bits, "euclidean", exact=True)
    ref_dist, ref_idx = dist_ops.top_k_smallest(ref, k)
    np.testing.assert_allclose(np.asarray(sd_dist), np.asarray(ref_dist),
                               atol=1e-5)
    assert set(np.asarray(sd_idx)[0].tolist()) == \
        set(np.asarray(ref_idx)[0].tolist())


@pytest.mark.parametrize("bits", [4, 8, 16, 32])
@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_sharded_exact_ilv_kernel_parity(rng, metric, bits):
    """The mesh ilv fused surface (r3.7 kernel in interpret mode) must
    agree with the accurate-dots surface path — the CPU-verified
    integration for the multi-chip hardware we don't have (same pattern
    as the fused-hamming use_kernel flag)."""
    data = 2
    m = mesh_mod.make_mesh(mesh_mod.MeshConfig(data=data, feature=1),
                           jax.devices()[:data])
    n, d, k = 8192, 128, 10  # 4096 rows/shard = 128 * _SEG exactly
    assert psearch.ilv_ok_mesh(m, bits, n)
    db = rng.uniform(-1, 1, size=(n, d))
    codes = qz.codes_to_device_repr(db, bits)
    norms = dist_ops.db_row_stats(codes, bits, d)
    valid = np.ones(n, dtype=bool)
    valid[50:60] = False
    queries = np.float32(rng.uniform(-1, 1, size=(4, d)))
    ilv = psearch.sharded_ilv_codes(m, jnp.asarray(codes))
    got = psearch.sharded_exact_topk(
        m, jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(norms),
        jnp.asarray(valid), None, ilv, bits=bits, metric=metric, k=k,
        with_ties=True, kernel_interpret=True)
    want = psearch.sharded_exact_topk(
        m, jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(norms),
        jnp.asarray(valid), bits=bits, metric=metric, k=k, with_ties=True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=2e-5)
    for i in range(queries.shape[0]):
        assert set(np.asarray(got[1])[i].tolist()) == \
            set(np.asarray(want[1])[i].tolist())
    assert np.asarray(got[2]).shape == (queries.shape[0],)


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_sharded_scores_full_matrix(rng, metric):
    m = mesh_mod.make_mesh(mesh_mod.MeshConfig(data=4, feature=2),
                           jax.devices()[:8])
    db, codes, norms, valid, queries = _setup(rng, n=256, bits=32)
    got = np.asarray(psearch.sharded_scores(
        m, jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(norms),
        jnp.asarray(valid), bits=32, metric=metric, exact=True))
    want = np.asarray(dist_ops.score_block(
        jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(norms),
        jnp.asarray(valid), 32, metric, exact=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_ann_recall(rng):
    m = mesh_mod.make_mesh(mesh_mod.MeshConfig(data=8, feature=1))
    n, d, bits, k = 2048, 32, 8, 10
    db, codes, norms, valid, queries = _setup(rng, n=n, d=d, bits=bits)
    index = SignHashIndex(d, "euclidean", MyRandom(99))
    index.calibrate(db[:1024])
    hashes = index.encode_batch(np.float32(db))
    qcodes = index.encode_np(queries)

    dist, rows = psearch.sharded_ann_topk(
        m, jnp.asarray(qcodes), jnp.asarray(queries), jnp.asarray(codes),
        jnp.asarray(norms), jnp.asarray(hashes), jnp.asarray(valid),
        bits=bits, metric="euclidean", k=k, local_budget=64,
        words=index.words)
    ref = dist_ops.score_block(jnp.asarray(queries), jnp.asarray(codes),
                               jnp.asarray(norms), jnp.asarray(valid),
                               bits, "euclidean", exact=True)
    _, ref_idx = dist_ops.top_k_smallest(ref, k)
    recalls = [
        len(set(np.asarray(rows)[q].tolist()) &
            set(np.asarray(ref_idx)[q].tolist())) / k
        for q in range(queries.shape[0])]
    assert np.mean(recalls) >= 0.6, recalls
    # distances ascending per query
    dd = np.asarray(dist)
    assert all((np.diff(dd[q]) >= -1e-6).all() for q in range(dd.shape[0]))


def test_invalid_rows_never_returned(rng):
    m = mesh_mod.make_mesh(mesh_mod.MeshConfig(data=8, feature=1))
    db, codes, norms, valid, queries = _setup(rng, n=128, bits=32)
    valid[::2] = False
    _, rows = psearch.sharded_exact_topk(
        m, jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(norms),
        jnp.asarray(valid), bits=32, metric="euclidean", k=20, exact=True)
    assert all(r % 2 == 1 for r in np.asarray(rows).ravel())


def test_collection_on_mesh_matches_single_device(tmp_path, rng):
    """Collection.use_mesh: sharded searches agree with single-device."""
    from syzgydb_tpu import Collection, CollectionOptions, SearchArgs, COSINE

    c = Collection(CollectionOptions(
        name=str(tmp_path / "m.dat"), distance_method=COSINE,
        dimension_count=16, quantization=8, create_and_overwrite=True,
        index_seed=3))
    n = 3000
    vecs = rng.standard_normal((n, 16))
    c.add_documents(list(range(n)), vecs, [b"{}"] * n)
    q = rng.standard_normal(16)

    single_exact = c.search(SearchArgs(vector=q, k=10, precision="exact"))
    single_med = c.search(SearchArgs(vector=q, k=10))
    single_rad = c.search(SearchArgs(vector=q, radius=0.4, precision="exact"))

    mesh = mesh_mod.make_mesh(mesh_mod.MeshConfig(data=8, feature=1))
    c.use_mesh(mesh)
    sharded_exact = c.search(SearchArgs(vector=q, k=10, precision="exact"))
    sharded_med = c.search(SearchArgs(vector=q, k=10))
    sharded_rad = c.search(SearchArgs(vector=q, radius=0.4, precision="exact"))

    assert [r.id for r in sharded_exact.results] == \
        [r.id for r in single_exact.results]
    assert {r.id for r in sharded_rad.results} == \
        {r.id for r in single_rad.results}
    # medium paths share the same sketch but differ in budget partitioning;
    # require high agreement rather than identity
    overlap = len({r.id for r in sharded_med.results} &
                  {r.id for r in single_med.results})
    assert overlap >= 8, overlap
    c.close()


def test_radius_escalation_returns_all(tmp_path, rng):
    """Radius search must return every in-radius doc even past the first
    1024-result bound (escalating top-k, no full-matrix pull)."""
    from syzgydb_tpu import Collection, CollectionOptions, SearchArgs

    c = Collection(CollectionOptions(
        name=str(tmp_path / "r.dat"), dimension_count=4, quantization=32,
        create_and_overwrite=True, index_seed=3))
    n = 2000
    vecs = rng.uniform(-0.01, 0.01, size=(n, 4))  # everything close together
    c.add_documents(list(range(n)), vecs, [b"{}"] * n)
    res = c.search(SearchArgs(vector=[0.0] * 4, radius=1.0,
                              precision="exact"))
    assert len(res.results) == n  # all within radius, beyond the 1024 bound
    c.close()


def test_mesh_incremental_scatter_sync(tmp_path, rng, monkeypatch):
    """Under a mesh, small mutation batches must ride the on-device scatter
    path — never a full column re-placement — and searches stay correct
    (VERDICT r1 item 7; SURVEY.md §2.2 concurrent-workload row)."""
    from syzgydb_tpu import Collection, CollectionOptions, SearchArgs
    from syzgydb_tpu.core import collection as coll_mod
    from syzgydb_tpu.ops import quantize as qz

    monkeypatch.setattr(coll_mod, "HOST_SCAN_MAX_ELEMS", 0)  # force device
    c = Collection(CollectionOptions(
        name=str(tmp_path / "ms.dat"), dimension_count=8, quantization=8,
        create_and_overwrite=True, index_seed=5))
    n = 1000  # capacity rounds to 1024: inserts below stay within it
    vecs = rng.uniform(-1, 1, size=(n, 8))
    c.add_documents(list(range(n)), vecs, [b"{}"] * n)
    live = {i: v for i, v in zip(range(n), vecs)}

    mesh = mesh_mod.make_mesh(mesh_mod.MeshConfig(data=8, feature=1))
    c.use_mesh(mesh)
    q = rng.uniform(-1, 1, size=8)
    c.search(SearchArgs(vector=q, k=5, precision="exact"))  # first placement
    assert c.sync_stats["full"] == 1

    next_id = n
    for step in range(6):
        if step % 3 == 2:  # remove a few
            for doc_id in list(live)[:3]:
                c.remove_document(doc_id)
                del live[doc_id]
        else:  # insert a small batch (stays within capacity: frees reused)
            add = rng.uniform(-1, 1, size=(3, 8))
            ids = list(range(next_id, next_id + 3))
            next_id += 3
            c.add_documents(ids, add, [b"{}"] * 3)
            live.update(zip(ids, add))

        got = [r.id for r in c.search(
            SearchArgs(vector=q, k=5, precision="exact")).results]
        ids_arr = np.array(list(live.keys()))
        seen = qz.quantization_roundtrip(np.array(list(live.values())), 8)
        d = np.sqrt(((seen - q) ** 2).sum(axis=1))
        want = set(ids_arr[np.argsort(d, kind="stable")[:5]].tolist())
        assert set(got) == want, f"step {step}"

    # every one of the 6 mutation batches synced via scatter, not re-upload
    assert c.sync_stats["full"] == 1
    assert c.sync_stats["scatter"] == 6
    # the scattered device columns must still be sharded over the mesh
    assert c._dev["codes"].sharding.is_equivalent_to(
        mesh_mod.row_sharding(mesh), 2)
    c.close()


def test_sharded_ann_kernel_path_parity(rng):
    """The fused bf16 Hamming kernel (ops/pallas_hamming.py) wired into
    sharded_ann_topk behind use_kernel must agree with the XLA accumulator
    path — forced through Pallas interpret mode on the CPU mesh (VERDICT r2
    next-step 9: a CPU-verified integration waiting for hardware)."""
    m = mesh_mod.make_mesh(mesh_mod.MeshConfig(data=8, feature=1))
    n, d, bits, k = 8192, 32, 8, 10  # n_local = 1024 = kernel block size
    db, codes, norms, valid, queries = _setup(rng, n=n, d=d, bits=bits)
    valid[::7] = False  # the kernel folds validity into its surface
    index = SignHashIndex(d, "euclidean", MyRandom(5))
    index.calibrate(db[:1024])
    hashes = index.encode_batch(np.float32(db))
    qcodes = index.encode_np(queries)

    args = (m, jnp.asarray(qcodes), jnp.asarray(queries), jnp.asarray(codes),
            jnp.asarray(norms), jnp.asarray(hashes), jnp.asarray(valid))
    kw = dict(bits=bits, metric="euclidean", k=k, local_budget=96,
              words=index.words)
    d_xla, r_xla = psearch.sharded_ann_topk(*args, **kw)
    d_ker, r_ker = psearch.sharded_ann_topk(*args, use_kernel=True,
                                            kernel_interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(d_ker), np.asarray(d_xla),
                               atol=1e-5)
    for q in range(queries.shape[0]):
        assert set(np.asarray(r_ker)[q].tolist()) == \
            set(np.asarray(r_xla)[q].tolist())
    assert all(int(r) % 7 != 0 for r in np.asarray(r_ker).ravel())


def test_mesh_ilv_memory_gate_is_per_shard(tmp_path, rng, monkeypatch):
    """The ilv-operand memory gate applies PER SHARD under a mesh: a
    collection whose TOTAL codes exceed _LEAN_CODE_BYTES but whose
    per-shard slice fits keeps the fused ilv surface (each device holds
    only its own rows, and sharded_ilv_codes relayouts inside shard_map
    so the transient is per-shard too).  Single-device placements of the
    same size go lean instead — tests/test_lean.py.  Closes the r4
    deferred note's "the 2 GB gate still drops the mesh ilv operand"."""
    from syzgydb_tpu import Collection, CollectionOptions, SearchArgs
    from syzgydb_tpu.core import collection as coll_mod
    from syzgydb_tpu.ops import pallas_scan
    from syzgydb_tpu.ops import quantize as qz

    monkeypatch.setattr(coll_mod, "HOST_SCAN_MAX_ELEMS", 0)  # force device
    monkeypatch.setattr(pallas_scan, "supported", lambda: True)
    monkeypatch.setattr(Collection, "_kernel_interpret", True)

    data, d, bits = 2, 128, 8
    n = data * 128 * psearch._SEG  # 8192: minimal ilv_ok_mesh capacity
    total_bytes = n * d            # int8 codes
    # cap between per-shard (total/2) and total: old total-bytes gate
    # dropped ilv here; the per-shard gate must keep it
    monkeypatch.setattr(coll_mod, "_LEAN_CODE_BYTES", total_bytes - 1)

    c = Collection(CollectionOptions(
        name=str(tmp_path / "ps.dat"), dimension_count=d, quantization=bits,
        create_and_overwrite=True, index_seed=7))
    vecs = rng.uniform(-1, 1, size=(n, d))
    c.add_documents(list(range(n)), vecs, [b"{}"] * n)
    mesh = mesh_mod.make_mesh(mesh_mod.MeshConfig(data=data, feature=1),
                              jax.devices()[:data])
    c.use_mesh(mesh)
    assert psearch.ilv_ok_mesh(mesh, bits, c.columns.capacity)

    q = rng.uniform(-1, 1, size=d)
    got = [r.id for r in c.search(
        SearchArgs(vector=q, k=10, precision="high")).results]
    assert "ilv" in c._dev, "per-shard gate must keep the fused surface"

    seen = qz.quantization_roundtrip(vecs, bits)
    dist = np.sqrt(((seen - q) ** 2).sum(axis=1))
    want = set(np.argsort(dist, kind="stable")[:10].tolist())
    assert set(got) == want

    # a mutation must ride the scatter path and rebuild the mesh ilv
    c.add_documents([0], vecs[:1] * 0.5, [b"{}"])
    got2 = [r.id for r in c.search(
        SearchArgs(vector=q, k=10, precision="high")).results]
    assert c.sync_stats["scatter"] >= 1 and "ilv" in c._dev
    seen[0] = qz.quantization_roundtrip(vecs[:1] * 0.5, bits)[0]
    dist = np.sqrt(((seen - q) ** 2).sum(axis=1))
    want2 = set(np.argsort(dist, kind="stable")[:10].tolist())
    assert set(got2) == want2
    c.close()


def test_make_mesh_feature_exceeding_devices_raises():
    """feature > device count used to compute data = 0 and build an empty
    mesh that failed far downstream (review finding r5)."""
    with pytest.raises(ValueError, match="devices"):
        mesh_mod.make_mesh(mesh_mod.MeshConfig(feature=16))


def test_sharded_ann_packed4_alignment_guard(rng):
    """sharded_ann_topk validates 4-bit feature alignment like its
    siblings (review finding r5): dim % (2*feature) != 0 must raise the
    explicit error, not an opaque shard_map divisibility failure."""
    m = mesh_mod.make_mesh(mesh_mod.MeshConfig(data=2, feature=2),
                           jax.devices()[:4])
    d = 18  # d % (2*2) != 0
    db, codes, norms, valid, queries = _setup(rng, n=512, d=d, bits=4)
    index = SignHashIndex(d, "euclidean", MyRandom(5))
    hashes = index.encode_batch(np.float32(db))
    qcodes = index.encode_np(queries)
    with pytest.raises(ValueError, match="4-bit"):
        psearch.sharded_ann_topk(
            m, jnp.asarray(qcodes), jnp.asarray(queries),
            jnp.asarray(codes), jnp.asarray(norms), jnp.asarray(hashes),
            jnp.asarray(valid), bits=4, metric="euclidean", k=5,
            local_budget=64, words=index.words)


def test_mesh_exact_interpret_runs_ilv_kernel(rng, monkeypatch):
    """will_use_ilv says exact+interpret rides the kernel; the mesh local
    path used to silently take the XLA surface instead (review finding
    r5 — false parity coverage).  Pin that segment_min_scan_ilv actually
    runs with exact=True and the results still match the oracle."""
    from syzgydb_tpu.ops import pallas_scan

    m = mesh_mod.make_mesh(mesh_mod.MeshConfig(data=2, feature=1),
                           jax.devices()[:2])
    n, d, bits, k = 2 * 128 * 64, 32, 8, 5  # ilv_ok_mesh alignment
    db, codes, norms, valid, queries = _setup(rng, n=n, d=d, bits=bits)
    ilv = psearch.sharded_ilv_codes(m, jnp.asarray(codes))

    calls = []
    real = pallas_scan.segment_min_scan_ilv

    def spy(*a, **kw):
        calls.append(kw.get("exact"))
        return real(*a, **kw)

    monkeypatch.setattr(pallas_scan, "segment_min_scan_ilv", spy)
    dist, rows, ok = psearch.sharded_exact_topk(
        m, jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(norms),
        jnp.asarray(valid), None, ilv, bits=bits, metric="euclidean", k=k,
        exact=True, with_ties=True, kernel_interpret=True)
    assert calls == [True]  # the exact kernel ran, in exact mode
    ref = dist_ops.score_block(jnp.asarray(queries), jnp.asarray(codes),
                               jnp.asarray(norms), jnp.asarray(valid),
                               bits, "euclidean", exact=True)
    rd, ri = dist_ops.top_k_smallest(ref, k)
    np.testing.assert_allclose(np.asarray(dist), np.asarray(rd), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(rows), np.asarray(ri))


def test_rerank_wide_codes_use_highest_precision():
    """'Exact distances on gathered candidates' must not ride the TPU
    default one-bf16-pass matmul for >8-bit codes (review finding r5):
    pin the HIGHEST precision attribute in the lowered jaxpr."""
    from syzgydb_tpu.index import hamming

    d, n, c = 16, 64, 8
    for bits in (16, 32):
        codes = qz.codes_to_device_repr(
            np.random.default_rng(0).uniform(-1, 1, (n, d)), bits)
        jaxpr = jax.make_jaxpr(
            lambda q, cd, nr, v, ca: hamming.rerank_topk(
                q, cd, nr, v, ca, bits, "cosine", 3))(
            jnp.zeros((2, d), jnp.float32), jnp.asarray(codes),
            jnp.ones(n, jnp.float32), jnp.ones(n, bool),
            jnp.zeros((2, c), jnp.int32))
        assert "HIGHEST" in str(jaxpr).upper(), bits
