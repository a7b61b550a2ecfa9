"""Lean device placement (>2 GB codes: drop the matmul-layout buffer,
serve every consumer from slab+ilv — core/collection._LEAN_CODE_BYTES).

CPU strategy: pallas_scan.supported is patched True, the lean threshold is
patched tiny, and Collection._kernel_interpret routes the fused kernel
through Pallas interpret mode — so the whole lean stack (streamed
placement, fused surface, slab rerank, slab-served ANN rerank, lean
scatter sync, codes_from_slab reconstruction) runs through the REAL
Collection code paths and is pinned for parity against a classic
(codes-resident) collection on identical data."""

import json

import numpy as np
import pytest

from syzgydb_tpu import (COSINE, EUCLIDEAN, Collection, CollectionOptions,
                         SearchArgs)
from syzgydb_tpu.core import collection as coll_mod
from syzgydb_tpu.ops import pallas_scan

N, DIMS = 3000, 128


def _make(tmp_path, name, metric=COSINE, quant=8, n=N):
    rng = np.random.default_rng(7)
    c = Collection(CollectionOptions(
        name=str(tmp_path / name), distance_method=metric,
        dimension_count=DIMS, quantization=quant,
        create_and_overwrite=True, index_seed=11))
    vecs = rng.uniform(-1, 1, size=(n, DIMS))
    c.add_documents(list(range(n)), vecs,
                    [json.dumps({"i": i}).encode() for i in range(n)])
    return c, vecs


@pytest.fixture
def lean_env(monkeypatch):
    monkeypatch.setattr(pallas_scan, "supported", lambda: True)
    monkeypatch.setattr(coll_mod, "HOST_SCAN_MAX_ELEMS", 0)
    monkeypatch.setattr(Collection, "_kernel_interpret", True)
    return monkeypatch


def _lean_on(monkeypatch):
    monkeypatch.setattr(coll_mod, "_LEAN_CODE_BYTES", 1)
    monkeypatch.setattr(coll_mod, "_LEAN_CHUNK_ROWS", 4096)


def test_lean_engages_and_matches_classic(tmp_path, lean_env):
    classic, vecs = _make(tmp_path, "classic.dat")
    classic._device_state()
    assert "codes" in classic._dev and "ilv" in classic._dev

    _lean_on(lean_env)
    lean, _ = _make(tmp_path, "lean.dat")
    dev = lean._device_state()
    assert "codes" not in dev, "lean placement must drop the matmul buffer"
    assert "slab" in dev and "ilv" in dev and "hashes" in dev

    # streamed placement builds the SAME derived state as the classic path
    np.testing.assert_array_equal(np.asarray(dev["hashes"]),
                                  np.asarray(classic._dev["hashes"]))
    np.testing.assert_array_equal(np.asarray(dev["slab"]),
                                  np.asarray(classic._dev["slab"]))
    np.testing.assert_array_equal(np.asarray(dev["ilv"]),
                                  np.asarray(classic._dev["ilv"]))

    rng = np.random.default_rng(3)
    queries = rng.uniform(-1, 1, size=(5, DIMS))
    for precision in ("high", "exact"):
        for q in queries:
            a = classic.search(SearchArgs(vector=q, k=10,
                                          precision=precision))
            b = lean.search(SearchArgs(vector=q, k=10,
                                       precision=precision))
            assert [r.id for r in a.results] == [r.id for r in b.results], \
                precision
            np.testing.assert_allclose(
                [r.distance for r in a.results],
                [r.distance for r in b.results], rtol=1e-5, atol=1e-6)
    classic.close()
    lean.close()


def test_lean_ann_rerank_recall(tmp_path, lean_env):
    """medium precision rides the slab-served ANN rerank in lean mode;
    its candidate set is identical (hamming over the same hashes) and the
    f32 lane rerank must agree with the exact oracle on (nearly) every
    top-10 — identical modulo sub-bf16 ties."""
    _lean_on(lean_env)
    # the adaptive router would (correctly) route this tiny corpus to the
    # exhaustive scan; pin it to the index so the slab rerank is exercised
    lean_env.setattr(coll_mod, "ANN_BATCH_CROSSOVER", 0)
    lean, vecs = _make(tmp_path, "lean.dat")
    assert "codes" not in lean._device_state()
    rng = np.random.default_rng(4)
    for q in rng.uniform(-1, 1, size=(5, DIMS)):
        exact = lean.search(SearchArgs(vector=q, k=10, precision="exact"))
        med = lean.search(SearchArgs(vector=q, k=10))
        assert med.percent_searched < 100.0  # the index path actually ran
        overlap = len({r.id for r in exact.results} &
                      {r.id for r in med.results})
        assert overlap >= 9, overlap
    lean.close()


def test_lean_scatter_sync_and_mutation(tmp_path, lean_env):
    _lean_on(lean_env)
    lean, vecs = _make(tmp_path, "lean.dat")
    lean._device_state()
    full0 = lean.sync_stats["full"]
    # mutate: rewrite some rows, remove one, add new ones
    lean.add_documents([1, 2], np.ones((2, DIMS)) * 0.5,
                       [b'{"m": 1}', b'{"m": 2}'])
    lean.remove_document(3)
    target = np.tile([0.25, -0.25], DIMS // 2)  # not collinear with ones
    lean.add_document(N + 1, target, b'{"new": true}')
    res = lean.search(SearchArgs(vector=target, k=3, precision="high"))
    assert res.results[0].id == N + 1
    assert 3 not in {r.id for r in res.results}
    assert lean.sync_stats["scatter"] >= 1
    assert lean.sync_stats["full"] == full0  # no full re-placement
    assert "codes" not in lean._dev
    # rewritten rows are served from the scattered slab/ilv
    res = lean.search(SearchArgs(vector=np.ones(DIMS), k=2,
                                 precision="high"))
    assert {r.id for r in res.results} <= {1, 2, N + 1}
    lean.close()


def test_lean_xla_surface_reconstructs_codes(tmp_path, lean_env,
                                             monkeypatch):
    """When a codes-needing surface runs under lean placement (exact-mode
    XLA / oversized Q), the matmul layout is reconstructed from the slab
    (pallas_scan.codes_from_slab) — forced here by disabling the ilv
    predicate."""
    _lean_on(lean_env)
    monkeypatch.setattr(pallas_scan, "will_use_ilv",
                        lambda *a, **k: False)
    lean, vecs = _make(tmp_path, "lean.dat")
    q = np.asarray(vecs[17])
    res = lean.search(SearchArgs(vector=q, k=5, precision="high"))
    assert res.results[0].id == 17
    lean.close()


def test_lean_large_k_radius_falls_back_via_slab(tmp_path, lean_env):
    """A radius search that escalates k past the fused budget rides the
    two-dispatch score_block path on codes reconstructed from the slab."""
    _lean_on(lean_env)
    lean, vecs = _make(tmp_path, "lean.dat", metric=EUCLIDEAN)
    q = np.zeros(DIMS)
    res = lean.search(SearchArgs(vector=q, radius=100.0, precision="high"))
    assert len(res.results) == N  # everything is within radius 100
    d = [r.distance for r in res.results]
    assert d == sorted(d)
    lean.close()


def test_codes_from_slab_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 255, size=(4096, 384), dtype=np.uint8)
    import jax.numpy as jnp
    slab = pallas_scan.make_lane_slab(jnp.asarray(codes))
    back = np.asarray(pallas_scan.codes_from_slab(slab))
    np.testing.assert_array_equal(back, codes)


def test_lean_capacity_estimate_smaller(tmp_path):
    from syzgydb_tpu.core import capacity as cap
    base = dict(capacity=1 << 20, code_row_bytes_host=384,
                code_row_bytes_dev=384, hash_words=5, meta_row_bytes=20,
                slab=True, ilv=True)
    fat = cap.estimate(**base)
    lean = cap.estimate(**base, lean=True)
    assert lean["device_bytes"] < fat["device_bytes"]
    assert lean["device_peak"] < fat["device_peak"]
    # lean steady drops exactly one codes-sized buffer
    assert fat["device_bytes"] - lean["device_bytes"] == (1 << 20) * 384
