"""Search micro-batching: Collection.search_many parity with sequential
search, and the REST SearchBatcher coalescing concurrent requests into one
device dispatch (server/batcher.py — the TPU answer to rest.go:371-487's
per-request serving)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from syzgydb_tpu import Collection, CollectionOptions, SearchArgs, COSINE
from syzgydb_tpu.server.batcher import SearchBatcher


def make_coll(tmp_path, rng, n=600, dims=16, **kw):
    c = Collection(CollectionOptions(
        name=str(tmp_path / "b.dat"), distance_method=COSINE,
        dimension_count=dims, quantization=8, create_and_overwrite=True,
        index_seed=13, **kw))
    vecs = rng.uniform(-1, 1, size=(n, dims))
    c.add_documents(list(range(n)), vecs, [
        json.dumps({"i": i}).encode() for i in range(n)])
    return c, vecs


@pytest.mark.parametrize("precision", ["exact", "medium"])
@pytest.mark.parametrize("force_device", [False, True])
def test_search_many_matches_sequential(tmp_path, rng, monkeypatch,
                                        precision, force_device):
    if force_device:
        from syzgydb_tpu.core import collection as coll_mod
        monkeypatch.setattr(coll_mod, "HOST_SCAN_MAX_ELEMS", 0)
    c, vecs = make_coll(tmp_path, rng)
    queries = rng.uniform(-1, 1, size=(7, 16))
    args = [SearchArgs(vector=q, k=5, precision=precision) for q in queries]
    batch = c.search_many(args)
    seq = [c.search(SearchArgs(vector=q, k=5, precision=precision))
           for q in queries]
    assert len(batch) == len(seq)
    for b, s in zip(batch, seq):
        assert [r.id for r in b.results] == [r.id for r in s.results]
        np.testing.assert_allclose([r.distance for r in b.results],
                                   [r.distance for r in s.results],
                                   rtol=1e-5, atol=1e-6)
        assert b.percent_searched == s.percent_searched
    c.close()


def test_search_many_with_filter_query(tmp_path, rng):
    c, _ = make_coll(tmp_path, rng)
    queries = rng.uniform(-1, 1, size=(4, 16))
    fq = "i < 100"
    batch = c.search_many([SearchArgs(vector=q, k=3, filter_query=fq)
                           for q in queries])
    for q, b in zip(queries, batch):
        s = c.search(SearchArgs(vector=q, k=3, filter_query=fq))
        assert [r.id for r in b.results] == [r.id for r in s.results]
        assert all(r.id < 100 for r in b.results)
    c.close()


def test_search_many_rejects_heterogeneous(tmp_path, rng):
    c, _ = make_coll(tmp_path, rng, n=20)
    q = rng.uniform(-1, 1, size=16)
    with pytest.raises(ValueError):
        c.search_many([SearchArgs(vector=q, k=3),
                       SearchArgs(vector=q, k=4)])
    with pytest.raises(ValueError):
        c.search_many([SearchArgs(vector=q, k=3),
                       SearchArgs(vector=q, k=3, radius=0.5)])
    with pytest.raises(ValueError):
        c.search_many([SearchArgs(vector=q, k=3, precision="exact"),
                       SearchArgs(vector=q, k=3, precision="medium")])
    c.close()


def test_batcher_coalesces_concurrent_searches(tmp_path, rng):
    c, _ = make_coll(tmp_path, rng)
    batcher = SearchBatcher(window_s=0.05)
    queries = rng.uniform(-1, 1, size=(16, 16))
    seq = [c.search(SearchArgs(vector=q, k=5)) for q in queries]

    results = [None] * len(queries)
    errors = []

    def worker(i):
        try:
            results[i] = batcher.search(
                c, SearchArgs(vector=queries[i], k=5))
        except BaseException as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(queries))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    for got, want in zip(results, seq):
        assert [r.id for r in got.results] == [r.id for r in want.results]
    # the whole burst must NOT have run one dispatch per query
    assert batcher.dispatches < batcher.queries == len(queries)
    c.close()


@pytest.mark.parametrize("precision", ["exact", "high", "medium"])
@pytest.mark.parametrize("force_device", [False, True])
def test_radius_many_matches_sequential(tmp_path, rng, monkeypatch,
                                        precision, force_device):
    """Batched radius searches (DIFFERENT radii in one group) must return
    exactly what per-request searches return."""
    if force_device:
        from syzgydb_tpu.core import collection as coll_mod
        monkeypatch.setattr(coll_mod, "HOST_SCAN_MAX_ELEMS", 0)
    c, vecs = make_coll(tmp_path, rng)
    queries = rng.uniform(-1, 1, size=(5, 16))
    radii = [0.2, 0.35, 0.5, 0.2, 0.05]
    args = [SearchArgs(vector=q, radius=r, precision=precision)
            for q, r in zip(queries, radii)]
    batch = c.radius_many(args)
    for a, b in zip(args, batch):
        s = c.search(SearchArgs(vector=a.vector, radius=a.radius,
                                precision=precision))
        assert [r.id for r in b.results] == [r.id for r in s.results]
        np.testing.assert_allclose([r.distance for r in b.results],
                                   [r.distance for r in s.results],
                                   rtol=1e-5, atol=1e-6)
        assert all(r.distance <= a.radius for r in b.results)
    c.close()


def test_radius_many_with_filter_query(tmp_path, rng):
    c, _ = make_coll(tmp_path, rng)
    queries = rng.uniform(-1, 1, size=(3, 16))
    fq = "i >= 200"
    batch = c.radius_many([SearchArgs(vector=q, radius=0.4, filter_query=fq)
                           for q in queries])
    for q, b in zip(queries, batch):
        s = c.search(SearchArgs(vector=q, radius=0.4, filter_query=fq))
        assert [r.id for r in b.results] == [r.id for r in s.results]
        assert all(r.id >= 200 for r in b.results)
    c.close()


def test_radius_many_rejects_heterogeneous(tmp_path, rng):
    c, _ = make_coll(tmp_path, rng, n=20)
    q = rng.uniform(-1, 1, size=16)
    with pytest.raises(ValueError):
        c.radius_many([SearchArgs(vector=q, radius=0.5),
                       SearchArgs(vector=q, k=3)])  # kNN in a radius group
    with pytest.raises(ValueError):
        c.radius_many([SearchArgs(vector=q, radius=0.5, precision="exact"),
                       SearchArgs(vector=q, radius=0.5)])
    c.close()


def test_batcher_coalesces_concurrent_radius_searches(tmp_path, rng):
    """Concurrent radius requests must share device dispatches instead of
    each paying its own (VERDICT r4 weak #4)."""
    c, _ = make_coll(tmp_path, rng)
    batcher = SearchBatcher(window_s=0.05)
    queries = rng.uniform(-1, 1, size=(12, 16))
    radii = [0.15 + 0.05 * (i % 4) for i in range(len(queries))]
    seq = [c.search(SearchArgs(vector=q, radius=r))
           for q, r in zip(queries, radii)]

    results = [None] * len(queries)
    errors = []

    def worker(i):
        try:
            results[i] = batcher.search(
                c, SearchArgs(vector=queries[i], radius=radii[i]))
        except BaseException as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(queries))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    for got, want, r in zip(results, seq, radii):
        assert [x.id for x in got.results] == [x.id for x in want.results]
        assert all(x.distance <= r for x in got.results)
    assert batcher.dispatches < batcher.queries == len(queries)
    c.close()


def test_batcher_lone_query_no_window_wait(tmp_path, rng):
    """A single query on an idle server must not pay the batching window."""
    c, _ = make_coll(tmp_path, rng, n=50)
    batcher = SearchBatcher(window_s=5.0)  # absurd window: would hang if paid
    import time
    q = rng.uniform(-1, 1, size=16)
    t0 = time.perf_counter()
    res = batcher.search(c, SearchArgs(vector=q, k=3))
    assert time.perf_counter() - t0 < 2.0
    assert len(res.results) == 3
    c.close()


def test_rest_concurrent_searches_batched(tmp_path, rng):
    """End-to-end: N threads hit /search concurrently; responses match the
    sequential oracle and the server coalesced at least some of them."""
    from syzgydb_tpu.server import config as cfg_mod
    from syzgydb_tpu.server.rest import Server, make_http_server

    srv = Server(data_folder=str(tmp_path))
    srv.batcher.window_s = 0.05
    c, _ = make_coll(tmp_path, rng, n=400)
    srv.collections["b"] = c
    httpd = make_http_server(srv)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        queries = rng.uniform(-1, 1, size=(12, 16))
        want = [[r.id for r in
                 c.search(SearchArgs(vector=q, k=4)).results]
                for q in queries]

        got = [None] * len(queries)

        def hit(i):
            body = json.dumps({"vector": queries[i].tolist(),
                               "k": 4}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/v1/collections/b/search",
                data=body, headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as resp:
                got[i] = [r["id"] for r in
                          json.loads(resp.read())["results"]]

        threads = [threading.Thread(target=hit, args=(i,))
                   for i in range(len(queries))]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert got == want
        assert srv.batcher.dispatches < srv.batcher.queries
    finally:
        httpd.shutdown()
        c.close()


def test_batcher_dispatch_failure_wakes_all_members(tmp_path, rng, monkeypatch):
    """A failing batched dispatch must propagate the error to every member
    and never wedge the group key for future requests."""
    c, _ = make_coll(tmp_path, rng, n=50)
    batcher = SearchBatcher(window_s=0.05)

    boom = RuntimeError("device fell over")

    def exploding_search_many(args_list):
        raise boom

    monkeypatch.setattr(c, "search_many", exploding_search_many)
    q = rng.uniform(-1, 1, size=16)
    errors = [None] * 8

    def worker(i):
        try:
            batcher.search(c, SearchArgs(vector=q, k=3))
        except BaseException as exc:
            errors[i] = exc

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not any(t.is_alive() for t in threads), "wedged waiters"
    # every member that joined the failed group saw the error (fresh
    # same-type instances chained to the original — raising ONE shared
    # instance from N threads races on its traceback); solo dispatches
    # (group of one) go through coll.search and succeed
    def is_boom(e):
        return isinstance(e, RuntimeError) and str(e) == str(boom) and \
            (e is boom or e.__cause__ is boom)
    assert all(e is None or is_boom(e) for e in errors)
    assert any(is_boom(e) for e in errors)

    # the key is NOT wedged: a fresh (non-batched) search still works
    monkeypatch.undo()
    res = batcher.search(c, SearchArgs(vector=q, k=3))
    assert len(res.results) == 3
    c.close()


def test_search_many_under_mesh(tmp_path, rng):
    """Batched kNN through a sharded collection matches sequential."""
    from syzgydb_tpu.parallel import mesh as mesh_mod
    c, _ = make_coll(tmp_path, rng, n=512)
    c.use_mesh(mesh_mod.make_mesh(mesh_mod.MeshConfig(data=8, feature=1)))
    queries = rng.uniform(-1, 1, size=(5, 16))
    batch = c.search_many([SearchArgs(vector=q, k=4, precision="exact")
                           for q in queries])
    for q, b in zip(queries, batch):
        s = c.search(SearchArgs(vector=q, k=4, precision="exact"))
        assert [r.id for r in b.results] == [r.id for r in s.results]
    c.close()


def test_batcher_overflow_splits_groups(tmp_path, rng):
    """More same-key requests than max_batch must split into multiple
    groups, all served correctly."""
    c, _ = make_coll(tmp_path, rng, n=100)
    batcher = SearchBatcher(window_s=0.05, max_batch=4)
    q = rng.uniform(-1, 1, size=16)
    want = [r.id for r in c.search(SearchArgs(vector=q, k=3)).results]
    results = [None] * 14

    def worker(i):
        results[i] = batcher.search(c, SearchArgs(vector=q, k=3))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(14)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert all(r is not None for r in results)
    assert all([x.id for x in r.results] == want for r in results)
    assert batcher.dispatches >= 4  # 14 queries / max_batch 4
    c.close()


def test_dispatch_fetch_overlap(tmp_path, rng, monkeypatch):
    """Pipelined serving (VERDICT r3 item 1): group N+1's device dispatch
    must start while group N's result fetch is still in flight — the
    collection lock covers the enqueue, not the ~33ms round trip.  The
    fetch is slowed to an artificial 200ms RTT; thread B's dispatch must
    land inside thread A's fetch window."""
    import time

    from syzgydb_tpu.core import collection as coll_mod
    monkeypatch.setattr(coll_mod, "HOST_SCAN_MAX_ELEMS", 0)  # device path
    c, _ = make_coll(tmp_path, rng, n=512, dims=16)

    events = []
    ev_lock = threading.Lock()

    def note(tag):
        with ev_lock:
            events.append((tag, time.monotonic()))

    orig_fetch = Collection._fetch_results

    def slow_fetch(dist, rows, counts=None):
        note("fetch_start")
        time.sleep(0.2)  # simulated tunnel RTT
        out = orig_fetch(dist, rows, counts)
        note("fetch_end")
        return out

    monkeypatch.setattr(Collection, "_fetch_results",
                        staticmethod(slow_fetch))

    orig_topk = Collection._exact_topk_device

    def spying_topk(self, *a, **kw):
        note("dispatch")
        return orig_topk(self, *a, **kw)

    monkeypatch.setattr(Collection, "_exact_topk_device", spying_topk)

    queries = rng.uniform(-1, 1, size=(8, 16))
    args = [SearchArgs(vector=q, k=3, precision="high") for q in queries]
    errs = []

    def run_group():
        try:
            c.search_many(args)
        except BaseException as exc:  # pragma: no cover
            errs.append(exc)

    ta = threading.Thread(target=run_group)
    tb = threading.Thread(target=run_group)
    ta.start()
    time.sleep(0.05)  # let A dispatch and enter its fetch
    tb.start()
    ta.join()
    tb.join()
    assert not errs, errs

    dispatches = [t for tag, t in events if tag == "dispatch"]
    fetch_ends = [t for tag, t in events if tag == "fetch_end"]
    assert len(dispatches) == 2 and len(fetch_ends) == 2, events
    # B dispatched strictly before A's fetch completed: overlap proven
    assert sorted(dispatches)[1] < min(fetch_ends), events
    c.close()


def test_radius_dispatch_fetch_overlap(tmp_path, rng, monkeypatch):
    """Radius groups get the same lock discipline as kNN (r5): the fetch
    runs with the collection lock released, so a concurrent MUTATION must
    complete inside the radius fetch window instead of waiting it out."""
    import time

    from syzgydb_tpu.core import collection as coll_mod
    monkeypatch.setattr(coll_mod, "HOST_SCAN_MAX_ELEMS", 0)  # device path
    c, _ = make_coll(tmp_path, rng, n=512, dims=16)

    events = []
    ev_lock = threading.Lock()

    def note(tag):
        with ev_lock:
            events.append((tag, time.monotonic()))

    orig_fetch = Collection._fetch_results

    def slow_fetch(dist, rows, counts=None):
        note("fetch_start")
        time.sleep(0.3)  # simulated tunnel RTT
        out = orig_fetch(dist, rows, counts)
        note("fetch_end")
        return out

    monkeypatch.setattr(Collection, "_fetch_results",
                        staticmethod(slow_fetch))
    errs = []

    def radius_group():
        try:
            qs = rng.uniform(-1, 1, size=(4, 16))
            c.radius_many([SearchArgs(vector=q, radius=0.5,
                                      precision="high") for q in qs])
        except BaseException as exc:  # pragma: no cover
            errs.append(exc)

    def mutate():
        try:
            time.sleep(0.1)  # land inside the radius fetch window
            c.add_document(9000, np.zeros(16), b"{}")
            note("mutation_done")
        except BaseException as exc:  # pragma: no cover
            errs.append(exc)

    ta = threading.Thread(target=radius_group)
    tb = threading.Thread(target=mutate)
    ta.start()
    tb.start()
    ta.join()
    tb.join()
    assert not errs, errs
    fetch_ends = [t for tag, t in events if tag == "fetch_end"]
    done = [t for tag, t in events if tag == "mutation_done"]
    assert done and fetch_ends, events
    # the mutation finished while the radius fetch was still sleeping
    assert done[0] < min(fetch_ends), events
    c.close()


def test_batcher_groups_overlap(tmp_path, rng, monkeypatch):
    """Same property end-to-end through the SearchBatcher: a second group
    forms and dispatches while the first group's fetch is in flight."""
    import time

    from syzgydb_tpu.core import collection as coll_mod
    monkeypatch.setattr(coll_mod, "HOST_SCAN_MAX_ELEMS", 0)
    c, _ = make_coll(tmp_path, rng, n=512, dims=16)

    events = []
    ev_lock = threading.Lock()

    def note(tag):
        with ev_lock:
            events.append((tag, time.monotonic()))

    orig_fetch = Collection._fetch_results

    def slow_fetch(dist, rows, counts=None):
        note("fetch_start")
        time.sleep(0.25)
        out = orig_fetch(dist, rows, counts)
        note("fetch_end")
        return out

    monkeypatch.setattr(Collection, "_fetch_results",
                        staticmethod(slow_fetch))
    orig_topk = Collection._exact_topk_device

    def spying_topk(self, *a, **kw):
        note("dispatch")
        return orig_topk(self, *a, **kw)

    monkeypatch.setattr(Collection, "_exact_topk_device", spying_topk)

    batcher = SearchBatcher(window_s=0.03, max_batch=4)
    q = rng.uniform(-1, 1, size=16)
    errs = []

    def one_query():
        try:
            batcher.search(c, SearchArgs(vector=q, k=3, precision="high"))
        except BaseException as exc:  # pragma: no cover
            errs.append(exc)

    # wave 1 fills a group; wave 2 arrives while wave 1's fetch is in
    # flight and must dispatch before it completes
    wave1 = [threading.Thread(target=one_query) for _ in range(4)]
    wave2 = [threading.Thread(target=one_query) for _ in range(4)]
    for t in wave1:
        t.start()
    time.sleep(0.15)  # wave 1 dispatched, inside its 250ms fetch
    for t in wave2:
        t.start()
    for t in wave1 + wave2:
        t.join()
    assert not errs, errs

    dispatches = sorted(t for tag, t in events if tag == "dispatch")
    fetch_ends = sorted(t for tag, t in events if tag == "fetch_end")
    assert len(dispatches) >= 2, events
    assert dispatches[1] < fetch_ends[0], events
    c.close()


def test_batcher_grow_gap_close(tmp_path, rng):
    """A formed group whose arrivals stop must dispatch after grow_gap_s,
    not sit out the full window (the r4 lock-step fix): with an absurd
    window, a 4-query wave must come back in well under it."""
    import time
    c, _ = make_coll(tmp_path, rng, n=50)
    batcher = SearchBatcher(window_s=30.0, grow_gap_s=0.05)
    queries = rng.uniform(-1, 1, size=(4, 16))
    results = [None] * 4
    errors = []

    def worker(i):
        try:
            results[i] = batcher.search(
                c, SearchArgs(vector=queries[i], k=3))
        except BaseException as exc:  # pragma: no cover
            errors.append(exc)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    took = time.perf_counter() - t0
    assert not errors
    assert all(r is not None for r in results)
    assert took < 10.0, took  # window is 30s: proves the gap close fired
    # ...and they still coalesced rather than dispatching one-by-one
    assert batcher.dispatches < 4
    c.close()


def test_rest_http11_keepalive_reuse(tmp_path, rng):
    """The server speaks HTTP/1.1 with Content-Length on every response:
    one client connection must serve several requests back-to-back."""
    import http.client
    from syzgydb_tpu.server.rest import Server, make_http_server

    srv = Server(data_folder=str(tmp_path))
    c, vecs = make_coll(tmp_path, rng, n=40)
    srv.collections["ka"] = c
    httpd = make_http_server(srv)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port)
        for i in range(3):
            conn.request(
                "POST", "/api/v1/collections/ka/search",
                body=json.dumps({"vector": vecs[i].tolist(), "k": 2}),
                headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            assert resp.version == 11
            out = json.loads(resp.read())
            assert len(out["results"]) == 2
            assert out["results"][0]["id"] == i  # nearest to itself
        conn.close()
    finally:
        httpd.shutdown()
        c.close()


def test_dead_leader_group_is_retired(tmp_path, rng):
    """A follower that detects a dead leader must retire the zombie group
    so later requests start fresh instead of joining it and failing for a
    full member-cap's worth of traffic (review finding r5)."""
    import time
    from syzgydb_tpu.server import batcher as b_mod

    c, vecs = make_coll(tmp_path, rng, n=64)
    batcher = SearchBatcher(window_s=0.005)
    dead = threading.Thread(target=lambda: None)
    dead.start()
    dead.join()
    key = (c.batch_token, "knn", 3, "medium", "")
    zombie = b_mod._Group()
    zombie.leader_thread = dead
    with batcher._lock:
        batcher._groups[key] = zombie

    args = SearchArgs(vector=vecs[0], k=3, precision="medium")
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="leader thread died"):
        batcher.search(c, args)
    assert time.monotonic() - t0 < 5.0  # detected in ~1s, not the timeout
    with batcher._lock:  # the zombie is gone
        assert batcher._groups.get(key) is not zombie
    res = batcher.search(c, args)  # fresh group: serves normally
    assert [r.id for r in res.results]
    c.close()
