"""Streaming-workload tests (BASELINE config 5 semantics): interleaved
insert/update/delete + queries with incremental device sync, plus threaded
concurrency (the reference serializes with an RWMutex, collection.go:199; we
serialize at batch boundaries with scatter-updated device columns)."""

import threading

import numpy as np

from syzgydb_tpu import Collection, CollectionOptions, SearchArgs, EUCLIDEAN


def exact_ids(c, q, k):
    return [r.id for r in
            c.search(SearchArgs(vector=q, k=k, precision="exact")).results]


def test_interleaved_mutations_and_queries(tmp_path, rng):
    c = Collection(CollectionOptions(
        name=str(tmp_path / "s.dat"), distance_method=EUCLIDEAN,
        dimension_count=8, quantization=8, create_and_overwrite=True,
        index_seed=11))
    live = {}
    next_id = 0
    for step in range(30):
        op = step % 3
        if op in (0, 1) or not live:  # insert a small batch
            vecs = rng.uniform(-1, 1, size=(20, 8))
            ids = list(range(next_id, next_id + 20))
            next_id += 20
            c.add_documents(ids, vecs, [b"{}"] * 20)
            for i, v in zip(ids, vecs):
                live[i] = v
        else:  # remove a few
            for doc_id in list(live)[:5]:
                c.remove_document(doc_id)
                del live[doc_id]
        # query after every mutation batch; compare to numpy oracle over the
        # quantized values the device sees
        q = rng.uniform(-1, 1, size=8)
        got = exact_ids(c, q, 5)
        from syzgydb_tpu.ops import quantize as qz
        ids_arr = np.array(list(live.keys()))
        seen = qz.quantization_roundtrip(np.array(list(live.values())), 8)
        d = np.sqrt(((seen - q) ** 2).sum(axis=1))
        want = set(ids_arr[np.argsort(d)[:5]].tolist())
        assert set(got) == want, f"step {step}"
    c.close()


def test_incremental_sync_uses_scatter(tmp_path, rng, monkeypatch):
    """After the first full upload, small mutations must not re-place the
    whole columns (verify via the device buffer identity of untouched state
    and correctness of results)."""
    from syzgydb_tpu.core import collection as coll_mod
    monkeypatch.setattr(coll_mod, "HOST_SCAN_MAX_ELEMS", 0)  # force device
    c = Collection(CollectionOptions(
        name=str(tmp_path / "i.dat"), dimension_count=4, quantization=32,
        create_and_overwrite=True, index_seed=11))
    vecs = rng.uniform(-1, 1, size=(512, 4))
    c.add_documents(list(range(512)), vecs, [b"{}"] * 512)
    c.search(SearchArgs(vector=[0.0] * 4, k=1))  # initial full upload
    v0 = c._dev_version
    c.add_document(1000, [0.5, 0.5, 0.5, 0.5], b"{}")
    res = c.search(SearchArgs(vector=[0.5, 0.5, 0.5, 0.5], k=1,
                              precision="exact"))
    assert res.results[0].id == 1000
    assert c._dev_version != v0
    c.remove_document(1000)
    res = c.search(SearchArgs(vector=[0.5, 0.5, 0.5, 0.5], k=1,
                              precision="exact"))
    assert res.results[0].id != 1000
    c.close()


def test_threaded_concurrent_insert_and_search(tmp_path, rng):
    """Writer thread streams batches while reader threads query; every search
    must return internally consistent results (no crashes, k results, sorted
    distances)."""
    c = Collection(CollectionOptions(
        name=str(tmp_path / "t.dat"), dimension_count=8, quantization=8,
        create_and_overwrite=True, index_seed=11))
    c.add_documents(list(range(100)), rng.uniform(-1, 1, (100, 8)),
                    [b"{}"] * 100)
    stop = threading.Event()
    errors = []

    def writer():
        i = 1000
        w_rng = np.random.default_rng(1)
        try:
            while not stop.is_set():
                c.add_documents(list(range(i, i + 10)),
                                w_rng.uniform(-1, 1, (10, 8)), [b"{}"] * 10)
                i += 10
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    def reader():
        r_rng = np.random.default_rng(2)
        try:
            for _ in range(15):
                q = r_rng.uniform(-1, 1, 8)
                res = c.search(SearchArgs(vector=q, k=5, precision="exact"))
                assert len(res.results) == 5
                d = [r.distance for r in res.results]
                assert d == sorted(d)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    wt = threading.Thread(target=writer)
    readers = [threading.Thread(target=reader) for _ in range(2)]
    wt.start()
    for r in readers:
        r.start()
    for r in readers:
        r.join()
    stop.set()
    wt.join()
    assert not errors, errors
    c.close()


def test_bulk_then_small_insert_hash_consistency(tmp_path, rng):
    """Bulk inserts defer sketches to device; small inserts host-encode.
    Mixed history must still give correct medium-search results."""
    from syzgydb_tpu import CollectionOptions, Collection, SearchArgs, COSINE

    c = Collection(CollectionOptions(
        name=str(tmp_path / "h.dat"), distance_method=COSINE,
        dimension_count=16, quantization=8, create_and_overwrite=True,
        index_seed=21))
    vecs = rng.standard_normal((3000, 16))
    c.add_documents(list(range(3000)), vecs, [b"{}"] * 3000)  # bulk path
    # trigger calibration + device sketch build
    c.search(SearchArgs(vector=vecs[0], k=1))
    # small inserts take the host-encode + scatter path
    extra = rng.standard_normal((5, 16))
    for i, v in enumerate(extra):
        c.add_document(5000 + i, v, b"{}")
    for i, v in enumerate(extra):
        res = c.search(SearchArgs(vector=v, k=1))
        assert res.results[0].id == 5000 + i, (i, res.results[0].id)
    # bulk rows still findable after the scatter updates
    res = c.search(SearchArgs(vector=vecs[1234], k=1))
    assert res.results[0].id == 1234
    c.close()


def test_query_during_mutation_old_or_new_never_torn(tmp_path, rng,
                                                     monkeypatch):
    """Batch-boundary consistency under the r4 lock split (mutation host
    prep and search fetches run OFF the collection lock): a query racing a
    mutation batch must see the batch either fully applied or not at all.
    16 marker docs are always rewritten TOGETHER to one shared vector; a
    torn device state would surface as a mixed distance set."""
    import time

    from syzgydb_tpu import COSINE
    from syzgydb_tpu.core import collection as coll_mod
    monkeypatch.setattr(coll_mod, "HOST_SCAN_MAX_ELEMS", 0)  # device path

    n, d, k = 2048, 16, 16
    c = Collection(CollectionOptions(
        name=str(tmp_path / "torn.dat"), distance_method=COSINE,
        dimension_count=d, quantization=8, create_and_overwrite=True,
        index_seed=7))
    fill = rng.uniform(-1, 1, size=(n, d))
    c.add_documents(list(range(n)), fill, [b"{}"] * n)

    v_a = np.zeros(d); v_a[0] = 1.0
    v_b = np.zeros(d); v_b[1] = 1.0  # orthogonal: angular distance 0.5
    markers = list(range(16))
    c.add_documents(markers, np.tile(v_a, (16, 1)), [b"{}"] * 16)

    stop = threading.Event()
    errors = []

    def mutator():
        try:
            state = False
            while not stop.is_set():
                v = v_b if state else v_a
                c.add_documents(markers, np.tile(v, (16, 1)), [b"{}"] * 16)
                state = not state
        except BaseException as exc:  # pragma: no cover
            errors.append(exc)

    def reader():
        try:
            while not stop.is_set():
                res = c.search(SearchArgs(vector=v_a, k=k,
                                          precision="high"))
                near = sum(1 for r in res.results if r.distance < 0.1)
                # all markers moved together: 16 near (state a) or 0
                # (state b) — anything else is a torn snapshot
                assert near in (0, 16), [
                    (r.id, round(r.distance, 3)) for r in res.results]
        except BaseException as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=mutator)] + \
        [threading.Thread(target=reader) for _ in range(2)]
    for t in threads:
        t.start()
    time.sleep(2.0)
    stop.set()
    for t in threads:
        t.join()
    c.close()
    assert not errors, errors[:2]


def test_inflight_fetch_never_sees_recycled_row(tmp_path, rng):
    """Between a search's locked dispatch and its lock-free result fetch, a
    remove+add pair must NOT recycle a row the in-flight assembly can still
    reference (review finding r4: the recycled row would pair the new
    document's id/metadata with the old document's distance)."""
    from syzgydb_tpu import Collection, CollectionOptions, SearchArgs
    from syzgydb_tpu.core import collection as cmod
    import numpy as np
    d = 16
    n = cmod.HOST_SCAN_MAX_ELEMS // d + 64  # above the host-scan threshold
    c = Collection(CollectionOptions(
        name=str(tmp_path / "lease.dat"), dimension_count=d, quantization=8,
        create_and_overwrite=True, index_seed=7))
    vecs = rng.uniform(-1, 1, (n, d))
    target = vecs[5] / np.linalg.norm(vecs[5])
    c.add_documents(list(range(n)), vecs, [b'{"gen": 0}'] * n)

    fin = c.search_many_async(
        [SearchArgs(vector=target, k=3, precision="high")])
    # doc 5 is the top hit; remove it and insert a replacement while the
    # fetch is notionally in flight — without the lease the replacement
    # reuses row 5 and the assembled result claims the NEW id at the OLD
    # document's distance
    row5 = c.columns._row_of[5]
    c.remove_document(5)
    c.add_documents([10_000_000], rng.uniform(-1, 1, (1, d)),
                    [b'{"gen": 1}'])
    assert c.columns._row_of[10_000_000] != row5  # quarantined, not reused
    (res,) = fin()
    ids = [r.id for r in res.results]
    assert 10_000_000 not in ids
    for r in res.results:
        if r.id == 5:  # stale pre-remove snapshot is allowed...
            assert r.metadata in (b'{"gen": 0}', b"", None)  # ...torn isn't
    # lease released: the quarantined row is reusable again
    assert c.columns._leases == 0
    c.add_documents([10_000_001], rng.uniform(-1, 1, (1, d)), [b"{}"])
    assert c.columns._row_of[10_000_001] == row5
    c.close()


def test_fair_lock_unit():
    """FairRLock: FIFO handoff, reentrancy, and error on foreign release."""
    import pytest
    from syzgydb_tpu.utils.locks import FairRLock
    lk = FairRLock()
    with lk:
        with lk:  # reentrant
            pass
    # deterministic FIFO handoff: with B already queued, the releasing
    # thread's immediate re-acquire must go BEHIND B (the exact shape of
    # the starvation bug: CPython's RLock lets the releaser win)
    import time
    order = []
    lk.acquire()

    def b():
        with lk:
            order.append("b")

    tb = threading.Thread(target=b)
    tb.start()
    for _ in range(1000):
        with lk._cv:
            queued = len(lk._queue)
        if queued:
            break
        time.sleep(0.001)
    assert queued == 1
    lk.release()
    with lk:  # must wait for B even though B hasn't been scheduled yet
        order.append("main")
    tb.join()
    assert order == ["b", "main"]
    with pytest.raises(RuntimeError):
        lk.release()


def test_reader_not_starved_by_tight_mutation_loop(tmp_path, rng):
    """A free-running mutator (the config5 shape: bulk insert + singular
    remove/update, ~70 lock ops per iteration) must not starve concurrent
    searches: with CPython's unfair RLock the reader measured 2.17 QPS at
    19k mutations/s (r5 probe); the FairRLock interleaves them FIFO."""
    d = 16
    c = Collection(CollectionOptions(
        name=str(tmp_path / "fair.dat"), dimension_count=d, quantization=8,
        create_and_overwrite=True, index_seed=3))
    n0 = 2000
    c.add_documents(list(range(n0)), rng.uniform(-1, 1, (n0, d)),
                    [b"{}"] * n0)
    q = rng.uniform(-1, 1, d)
    c.search(SearchArgs(vector=q, k=5))  # warm
    stop = threading.Event()
    queries = [0]

    def mutator():
        m_rng = np.random.default_rng(50)
        nid = n0
        while not stop.is_set():
            c.add_documents(list(range(nid, nid + 100)),
                            m_rng.uniform(-1, 1, (100, d)), [b"{}"] * 100)
            for doc in m_rng.integers(0, n0, 20):
                try:
                    c.remove_document(int(doc))
                except KeyError:
                    pass
            nid += 100

    th = threading.Thread(target=mutator)
    th.start()
    import time
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 2.0:
        c.search(SearchArgs(vector=q, k=5))
        queries[0] += 1
    stop.set()
    th.join()
    c.close()
    # unfair RLock: ~0-4 queries in 2s; fair lock: hundreds on CPU
    assert queries[0] >= 20, f"reader starved: {queries[0]} queries in 2s"
