"""Collection integration tests, mirroring the reference's collection_test.go
coverage: CRUD + persistence + reopen, exact-vs-medium recall comparison with
seeded RNG (collection_test.go:23-103), exhaustive-search completeness
(collection_test.go:549-612), and 4-bit end-to-end search
(collection_test.go:614-667)."""

import json

import numpy as np
import pytest

from syzgydb_tpu import (Collection, CollectionOptions, SearchArgs, COSINE,
                         EUCLIDEAN)


def make_collection(path, dims=4, metric=EUCLIDEAN, quant=64, **kw):
    return Collection(CollectionOptions(
        name=path, distance_method=metric, dimension_count=dims,
        quantization=quant, create_and_overwrite=True, index_seed=12345, **kw))


def test_add_get_update_remove(tmp_collection_path):
    c = make_collection(tmp_collection_path)
    vec = [0.1, 0.2, 0.3, 0.4]
    c.add_document(7, vec, b'{"tag":"a"}')
    doc = c.get_document(7)
    assert doc.id == 7
    np.testing.assert_array_equal(doc.vector, np.array(vec))
    assert doc.metadata == b'{"tag":"a"}'

    c.update_document(7, b'{"tag":"b"}')
    assert c.get_document(7).metadata == b'{"tag":"b"}'
    np.testing.assert_array_equal(c.get_document(7).vector, np.array(vec))

    c.remove_document(7)
    with pytest.raises(KeyError):
        c.get_document(7)
    assert c.get_document_count() == 0
    c.close()


def test_dimension_mismatch_rejected(tmp_collection_path):
    c = make_collection(tmp_collection_path, dims=4)
    with pytest.raises(ValueError):
        c.add_document(1, [1.0, 2.0], b"{}")
    c.close()


def test_persistence_and_reopen(tmp_collection_path, rng):
    c = make_collection(tmp_collection_path, dims=8, quant=32)
    vecs = rng.uniform(-1, 1, size=(20, 8))
    for i in range(20):
        c.add_document(i, vecs[i], json.dumps({"i": i}).encode())
    c.remove_document(3)
    c.update_document(5, b'{"i": 555}')
    c.close()

    c2 = Collection(CollectionOptions(name=tmp_collection_path,
                                      dimension_count=8))
    # stored options override caller's (collection.go:241-252)
    assert c2.quantization == 32
    assert c2.get_document_count() == 19
    assert 3 not in c2.columns
    assert c2.get_document(5).metadata == b'{"i": 555}'
    np.testing.assert_array_equal(c2.get_document(5).vector,
                                  np.float64(np.float32(vecs[5])))
    c2.close()


def test_exhaustive_search_complete(tmp_collection_path, rng):
    """Exhaustive search returns true top-k with PercentSearched == 100."""
    c = make_collection(tmp_collection_path, dims=16, metric=EUCLIDEAN)
    vecs = rng.uniform(-1, 1, size=(300, 16))
    c.add_documents(list(range(300)), vecs, [b"{}"] * 300)
    q = rng.uniform(-1, 1, size=16)
    res = c.search(SearchArgs(vector=q, k=10, precision="exact"))
    assert res.percent_searched == pytest.approx(100.0)
    d = np.sqrt(((vecs - q) ** 2).sum(axis=1))
    want = set(np.argsort(d)[:10])
    got = {r.id for r in res.results}
    assert got == want
    # ascending distance order
    dists = [r.distance for r in res.results]
    assert dists == sorted(dists)
    c.close()


def test_medium_vs_exact_recall(tmp_collection_path, rng):
    """Seeded exact-vs-approx comparison (collection_test.go:23-103 analog):
    medium search must find most of the true top-10 while scanning <100%."""
    n, d = 5000, 32
    # budget small enough that a lone medium query stays on the index
    # (the adaptive router sends nq*budget*16 >= n to the exact scan)
    c = make_collection(tmp_collection_path, dims=d, metric=COSINE, quant=32,
                        search_budget=256)
    vecs = rng.standard_normal((n, d))
    c.add_documents(list(range(n)), vecs, [b"{}"] * n)
    recalls = []
    for t in range(5):
        q = rng.standard_normal(d)
        exact = c.search(SearchArgs(vector=q, k=10, precision="exact"))
        approx = c.search(SearchArgs(vector=q, k=10))
        assert approx.percent_searched < 100.0
        exact_ids = {r.id for r in exact.results}
        approx_ids = {r.id for r in approx.results}
        recalls.append(len(exact_ids & approx_ids) / 10)
    assert np.mean(recalls) >= 0.8, recalls


def test_euclidean_medium_recall(tmp_collection_path, rng):
    n, d = 4000, 16
    c = make_collection(tmp_collection_path, dims=d, metric=EUCLIDEAN, quant=32)
    vecs = rng.standard_normal((n, d))
    c.add_documents(list(range(n)), vecs, [b"{}"] * n)
    recalls = []
    for t in range(5):
        q = rng.standard_normal(d)
        exact = c.search(SearchArgs(vector=q, k=10, precision="exact"))
        approx = c.search(SearchArgs(vector=q, k=10))
        recalls.append(len({r.id for r in exact.results} &
                           {r.id for r in approx.results}) / 10)
    assert np.mean(recalls) >= 0.7, recalls
    c.close()


def test_4bit_quantization_search(tmp_collection_path, rng):
    """4-bit end-to-end search (collection_test.go:614-667 analog)."""
    n, d = 500, 8
    c = make_collection(tmp_collection_path, dims=d, metric=EUCLIDEAN, quant=4)
    vecs = rng.uniform(-1, 1, size=(n, d))
    c.add_documents(list(range(n)), vecs, [b"{}"] * n)
    q = vecs[42]
    res = c.search(SearchArgs(vector=q, k=5, precision="exact"))
    assert 42 in {r.id for r in res.results}
    c.close()


def test_radius_search(tmp_collection_path):
    c = make_collection(tmp_collection_path, dims=2, metric=EUCLIDEAN)
    pts = [(0.0, 0.0), (0.1, 0.0), (0.0, 0.2), (0.5, 0.5), (0.9, 0.9)]
    for i, p in enumerate(pts):
        c.add_document(i, list(p), b"{}")
    res = c.search(SearchArgs(vector=[0.0, 0.0], radius=0.25,
                              precision="exact"))
    assert {r.id for r in res.results} == {0, 1, 2}
    dists = [r.distance for r in res.results]
    assert dists == sorted(dists)
    c.close()


def test_list_mode_pagination(tmp_collection_path):
    """K=0, Radius=0 lists IDs in lexicographic decimal-string order with
    offset/limit (collection.go:633-668; spanfile.go:541-547 quirk)."""
    c = make_collection(tmp_collection_path, dims=2)
    for i in [1, 2, 10, 100, 20]:
        c.add_document(i, [0.0, 0.0], json.dumps({"id": i}).encode())
    res = c.search(SearchArgs())
    assert [r.id for r in res.results] == [1, 10, 100, 2, 20]
    res = c.search(SearchArgs(offset=1, limit=2))
    assert [r.id for r in res.results] == [10, 100]
    c.close()


def test_filtered_search(tmp_collection_path, rng):
    c = make_collection(tmp_collection_path, dims=4)
    for i in range(50):
        c.add_document(i, rng.uniform(-1, 1, 4),
                       json.dumps({"even": i % 2 == 0}).encode())

    def only_even(doc_id, md):
        return json.loads(md)["even"]

    res = c.search(SearchArgs(vector=[0.0] * 4, k=10, filter=only_even,
                              precision="exact"))
    assert len(res.results) == 10
    assert all(r.id % 2 == 0 for r in res.results)
    # filtered docs are not counted as searched (PointIgnored semantics)
    assert res.percent_searched == pytest.approx(50.0)
    c.close()


def test_stats(tmp_collection_path, rng):
    c = make_collection(tmp_collection_path, dims=4, metric=COSINE, quant=8)
    for i in range(10):
        c.add_document(i, rng.uniform(-1, 1, 4), b"{}")
    st = c.compute_stats()
    assert st.document_count == 10
    assert st.dimension_count == 4
    assert st.quantization == 8
    assert st.distance_method == "cosine"
    assert st.storage_size > 0
    assert 0.0 < st.average_distance <= 1.0
    c.close()


def test_get_all_ids(tmp_collection_path):
    c = make_collection(tmp_collection_path, dims=2)
    for i in [5, 1, 3]:
        c.add_document(i, [0.0, 0.0], b"{}")
    assert c.get_all_ids() == [1, 3, 5]
    c.close()


def test_reopen_rebuilds_index_deterministically(tmp_collection_path, rng):
    """Index is derived data rebuilt on open (collection.go:297-311); with a
    stored index seed, medium search gives identical results after reopen."""
    n, d = 1000, 16
    c = make_collection(tmp_collection_path, dims=d, metric=COSINE, quant=32)
    vecs = rng.standard_normal((n, d))
    c.add_documents(list(range(n)), vecs, [b"{}"] * n)
    q = rng.standard_normal(d)
    before = [(r.id, r.distance) for r in
              c.search(SearchArgs(vector=q, k=10)).results]
    c.close()
    c2 = Collection(CollectionOptions(name=tmp_collection_path,
                                      dimension_count=d))
    after = [(r.id, r.distance) for r in
             c2.search(SearchArgs(vector=q, k=10)).results]
    assert [i for i, _ in before] == [i for i, _ in after]
    c2.close()


def test_empty_collection_search(tmp_collection_path):
    c = make_collection(tmp_collection_path, dims=2)
    res = c.search(SearchArgs(vector=[0.0, 0.0], k=5))
    assert res.results == []
    assert res.percent_searched == 0.0
    c.close()


def test_batch_insert_equivalent(tmp_collection_path, rng):
    """add_documents and add_document produce identical persisted state."""
    c = make_collection(tmp_collection_path, dims=4, quant=8)
    vecs = rng.uniform(-1, 1, size=(20, 4))
    c.add_documents(list(range(10)), vecs[:10],
                    [json.dumps({"i": i}).encode() for i in range(10)])
    for i in range(10, 20):
        c.add_document(i, vecs[i], json.dumps({"i": i}).encode())
    c.close()
    c2 = Collection(CollectionOptions(name=tmp_collection_path,
                                      dimension_count=4))
    assert c2.get_document_count() == 20
    for i in range(20):
        doc = c2.get_document(i)
        assert json.loads(doc.metadata)["i"] == i
    c2.close()


def test_filter_query_mask_cache(tmp_collection_path, rng):
    """filter_query caches the evaluated mask until the data mutates."""
    c = make_collection(tmp_collection_path, dims=4)
    for i in range(40):
        c.add_document(i, rng.uniform(-1, 1, 4),
                       json.dumps({"even": i % 2 == 0}).encode())
    q = "even == true"
    r1 = c.search(SearchArgs(vector=[0.0] * 4, k=50, filter_query=q,
                             precision="exact"))
    assert all(r.id % 2 == 0 for r in r1.results)
    assert q in c._filter_cache
    ver = c._filter_cache[q][0]
    # cache hit: same version
    c.search(SearchArgs(vector=[0.0] * 4, k=5, filter_query=q,
                        precision="exact"))
    assert c._filter_cache[q][0] == ver
    # mutation invalidates
    c.add_document(100, [0.1] * 4, b'{"even": true}')
    r2 = c.search(SearchArgs(vector=[0.1] * 4, k=50, filter_query=q,
                             precision="exact"))
    assert 100 in {r.id for r in r2.results}
    assert c._filter_cache[q][0] != ver
    # list mode honors filter_query too
    r3 = c.search(SearchArgs(filter_query="even == false"))
    assert all(r.id % 2 == 1 for r in r3.results)
    c.close()


def test_host_fast_path_matches_device(tmp_collection_path, rng):
    """Small-collection exact searches take the host BLAS path; results must
    match the device scan bit-for-bit at 4..32-bit quantization."""
    from syzgydb_tpu.ops import distance as dist_ops
    from syzgydb_tpu.ops import quantize as qz
    import jax.numpy as jnp

    c = make_collection(tmp_collection_path, dims=8, metric=COSINE, quant=8)
    vecs = rng.uniform(-1, 1, size=(500, 8))
    c.add_documents(list(range(500)), vecs, [b"{}"] * 500)
    q = rng.uniform(-1, 1, 8)
    res = c.search(SearchArgs(vector=q, k=10, precision="exact"))
    # device-path oracle
    dev = c._device_state()
    d = np.asarray(dist_ops.score_block(
        jnp.asarray(np.float32(q)[None, :]), dev["codes"], dev["norms"],
        jnp.asarray(c.columns.valid), 8, "cosine", exact=True))[0]
    want = np.argsort(d, kind="stable")[:10]
    got_rows = [c.columns.row(r.id) for r in res.results]
    assert set(got_rows) == set(int(w) for w in want)
    c.close()


def test_duplicate_ids_in_batch_last_wins(tmp_collection_path, rng):
    """Re-adding an existing id replaces the document (superseding write),
    both within one batch and across batches."""
    c = make_collection(tmp_collection_path, dims=4, quant=32)
    c.add_documents([1, 2, 1], [[0.1] * 4, [0.2] * 4, [0.9] * 4],
                    [b'{"v":"a"}', b'{"v":"b"}', b'{"v":"c"}'])
    assert c.get_document_count() == 2
    np.testing.assert_allclose(c.get_document(1).vector, [0.9] * 4,
                               atol=1e-6)
    assert c.get_document(1).metadata == b'{"v":"c"}'
    c.add_document(2, [0.5] * 4, b'{"v":"d"}')
    np.testing.assert_allclose(c.get_document(2).vector, [0.5] * 4,
                               atol=1e-6)
    c.close()


def test_seeded_stats_deterministic(tmp_collection_path, rng):
    """random_seed determinism: average_distance over sampled pairs is
    reproducible for equal seeds (settings.go:42-78 analog)."""
    from syzgydb_tpu.utils.rng import MyRandom
    vecs = rng.uniform(-1, 1, size=(50, 4))
    vals = []
    for trial in range(2):
        c = Collection(CollectionOptions(
            name=tmp_collection_path, dimension_count=4, quantization=32,
            create_and_overwrite=True, index_seed=5), rng=MyRandom(99))
        c.add_documents(list(range(50)), vecs, [b"{}"] * 50)
        vals.append(c.compute_average_distance(20))
        c.close()
    assert vals[0] == vals[1]


def test_knn_with_k_exceeding_count(tmp_collection_path, rng):
    c = make_collection(tmp_collection_path, dims=4)
    c.add_documents([1, 2, 3], rng.uniform(-1, 1, (3, 4)), [b"{}"] * 3)
    res = c.search(SearchArgs(vector=[0.0] * 4, k=50, precision="exact"))
    assert len(res.results) == 3
    c.close()


def test_bad_options_leave_no_file(tmp_collection_path):
    """ADVICE r1 (high): a failed create must not poison the path — the
    stored options record would otherwise override every valid retry."""
    import os
    with pytest.raises(ValueError):
        Collection(CollectionOptions(name=tmp_collection_path,
                                     dimension_count=0))
    assert not os.path.exists(tmp_collection_path)
    # bad index knobs rejected before file creation too
    with pytest.raises(ValueError):
        Collection(CollectionOptions(name=tmp_collection_path,
                                     dimension_count=4, index_tables=8,
                                     index_bits_per_table=32))  # 256 bits
    with pytest.raises(ValueError):
        Collection(CollectionOptions(name=tmp_collection_path,
                                     dimension_count=4,
                                     index_bits_per_table=31))  # not %32
    with pytest.raises(ValueError):
        Collection(CollectionOptions(name=tmp_collection_path,
                                     dimension_count=4, quantization=7))
    assert not os.path.exists(tmp_collection_path)
    # a corrected retry on the same path now succeeds
    c = Collection(CollectionOptions(name=tmp_collection_path,
                                     dimension_count=4))
    c.add_document(1, [0.1, 0.2, 0.3, 0.4], b"{}")
    assert c.get_document_count() == 1
    c.close()


def test_list_mode_percent_searched(tmp_collection_path):
    """List mode reports filter-passing records considered / total * 100
    (pointsSearched parity, collection.go:643-668; ADVICE r1)."""
    c = make_collection(tmp_collection_path)
    for i in range(10):
        c.add_document(i, [0.1 * i, 0, 0, 0],
                       json.dumps({"even": i % 2 == 0}).encode())
    res = c.search(SearchArgs())  # no filter, no limit: all considered
    assert res.percent_searched == 100.0
    res = c.search(SearchArgs(filter_query="even == true"))
    assert len(res.results) == 5
    assert res.percent_searched == 50.0
    # limit stops counting early, like the reference's loop break
    res = c.search(SearchArgs(limit=3))
    assert res.percent_searched == 30.0
    c.close()


def test_radius_medium_escalates_past_budget(tmp_collection_path, rng):
    """Dense in-radius sets come back complete through the ANN path:
    the candidate budget escalates instead of truncating (VERDICT r1 #8,
    lshtree.go:311-313 accept-reset semantics)."""
    n, d = 2000, 8
    base = rng.normal(size=(d,))
    base /= np.linalg.norm(base)
    # 1500 points in a tight cone around base (all within small radius),
    # 500 far away
    near = base[None, :] + 0.001 * rng.normal(size=(1500, d))
    far = rng.normal(size=(500, d)) + 5.0
    vecs = np.vstack([near, far])
    vecs = np.clip(vecs / np.abs(vecs).max(), -1, 1)
    c = make_collection(tmp_collection_path, dims=d, metric=COSINE, quant=32,
                        search_budget=256)
    c.add_documents(list(range(n)), vecs, [b"{}"] * n)
    # choose radius capturing the whole near-cluster
    exact = c.search(SearchArgs(vector=vecs[0], radius=0.2,
                                precision="exact"))
    assert len(exact.results) >= 1400
    med = c.search(SearchArgs(vector=vecs[0], radius=0.2,
                              precision="medium"))
    got = {r.id for r in med.results}
    want = {r.id for r in exact.results}
    # escalation must blow well past the 256 budget
    assert len(med.results) > 256
    assert len(got & want) / len(want) > 0.98
    c.close()


def test_rejects_corrupt_dat_without_poisoning_server(tmp_path):
    """make_server keeps serving when one .dat is unloadable (ADVICE r1)."""
    from syzgydb_tpu.server.rest import make_server
    good = make_collection(str(tmp_path / "good.dat"))
    good.add_document(1, [0.1, 0.2, 0.3, 0.4], b"{}")
    good.close()
    # a poisoned options record: dimension_count 0 written by hand
    bad = Collection(CollectionOptions(name=str(tmp_path / "bad.dat"),
                                       dimension_count=4))
    bad.spanlog.write("", [b'{"dimension_count": 0, "quantization": 64}'])
    bad.close()
    srv = make_server(data_folder=str(tmp_path))
    assert "good" in srv.collections
    assert "bad" not in srv.collections


def test_precision_high_matches_exact(tmp_path, rng, monkeypatch):
    """precision='high' (TPU-native mode: exhaustive segment-min scan) must
    return the same documents as 'exact' — off-TPU it dispatches through the
    same exhaustive paths; on TPU it rides fused_scan_topk."""
    from syzgydb_tpu.core import collection as coll_mod
    from syzgydb_tpu import Collection, CollectionOptions, SearchArgs, COSINE

    c = Collection(CollectionOptions(
        name=str(tmp_path / "hi.dat"), distance_method=COSINE,
        dimension_count=12, quantization=8, create_and_overwrite=True,
        index_seed=21))
    n = 800
    vecs = rng.uniform(-1, 1, size=(n, 12))
    c.add_documents(list(range(n)), vecs, [b"{}"] * n)
    q = rng.uniform(-1, 1, size=12)
    for force_device in (False, True):
        if force_device:
            monkeypatch.setattr(coll_mod, "HOST_SCAN_MAX_ELEMS", 0)
            c._dev = None
            c._dev_version = -1
        hi = c.search(SearchArgs(vector=q, k=7, precision="high"))
        ex = c.search(SearchArgs(vector=q, k=7, precision="exact"))
        assert [r.id for r in hi.results] == [r.id for r in ex.results]
        assert hi.percent_searched == 100.0
    # batched path too
    qs = rng.uniform(-1, 1, size=(5, 12))
    batch = c.search_many([SearchArgs(vector=v, k=4, precision="high")
                           for v in qs])
    for v, b in zip(qs, batch):
        ex = c.search(SearchArgs(vector=v, k=4, precision="exact"))
        assert [r.id for r in b.results] == [r.id for r in ex.results]
    c.close()


def test_put_many_duplicate_ids_fresh_store(tmp_path, rng):
    """A fresh-store bulk insert containing duplicate ids must keep the
    per-row later-wins semantics (the bulk id->row fast path falls back)."""
    from syzgydb_tpu import Collection, CollectionOptions, SearchArgs
    c = Collection(CollectionOptions(
        name=str(tmp_path / "dup.dat"), dimension_count=4, quantization=8,
        create_and_overwrite=True, index_seed=1))
    vecs = rng.uniform(-1, 1, (4, 4))
    c.add_documents([7, 8, 7, 9], vecs,
                    [b'{"v": 0}', b'{"v": 1}', b'{"v": 2}', b'{"v": 3}'])
    assert c.get_document_count() == 3
    doc = c.get_document(7)
    assert doc.metadata == b'{"v": 2}'  # later duplicate wins
    import numpy as np
    np.testing.assert_allclose(doc.vector, np.clip(vecs[2], -1, 1),
                               atol=1 / 127)
    c.close()
