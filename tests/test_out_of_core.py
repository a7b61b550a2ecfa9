"""Out-of-core metadata mode (CollectionOptions.metadata_on_demand): no
metadata bytes stay resident — every read fetches from the span log, the
reference's mmap envelope for metadata-heavy collections (spanfile.go:241-262,
ReadRecord spanfile.go:513).  Codes stay resident by design (search is
HBM-bound, SURVEY.md §7)."""

import json

import numpy as np
import pytest

from syzgydb_tpu import Collection, CollectionOptions, SearchArgs, COSINE
from syzgydb_tpu.core.columns import _LazyMetadata


def make_pair(tmp_path, rng, n=300, d=16):
    """The same data in a resident and a lazy collection."""
    vecs = rng.uniform(-1, 1, (n, d))
    metas = [json.dumps({"i": i, "tag": "even" if i % 2 == 0 else "odd",
                         "blob": "x" * 50}).encode() for i in range(n)]
    colls = []
    for lazy in (False, True):
        c = Collection(CollectionOptions(
            name=str(tmp_path / f"oc_{lazy}.dat"), distance_method=COSINE,
            dimension_count=d, quantization=8, create_and_overwrite=True,
            index_seed=9, metadata_on_demand=lazy))
        c.add_documents(list(range(n)), vecs, metas)
        colls.append(c)
    return colls[0], colls[1], vecs, metas


def test_nothing_resident_and_reads_match(tmp_path, rng):
    res, lazy, vecs, metas = make_pair(tmp_path, rng)
    assert isinstance(lazy.columns.metadata, _LazyMetadata)
    assert not lazy.columns.metadata_resident
    for i in (0, 7, 299):
        assert lazy.get_document(i).metadata == metas[i]
        assert lazy.columns.get_metadata(i) == metas[i]
    res.close()
    lazy.close()


def test_crud_and_search_parity(tmp_path, rng):
    res, lazy, vecs, metas = make_pair(tmp_path, rng)
    q = vecs[3]
    for c in (res, lazy):
        c.update_document(5, b'{"i": 5, "tag": "updated"}')
        c.remove_document(6)
    for args in (
        SearchArgs(vector=q, k=5),
        SearchArgs(vector=q, k=5, precision="exact"),
        SearchArgs(vector=q, k=5, filter_query='tag == "even"'),
        SearchArgs(vector=q, k=5, filter_query="i >= 100 AND i < 200"),
    ):
        a = res.search(args)
        b = lazy.search(args)
        assert [(r.id, r.metadata) for r in a.results] == \
            [(r.id, r.metadata) for r in b.results]
    # list mode with a filter walks metadata through the lazy column
    largs = SearchArgs(vector=None, k=0, filter_query='tag == "updated"',
                       limit=10)
    ids_a = [r.id for r in res.search(largs).results]
    ids_b = [r.id for r in lazy.search(largs).results]
    assert ids_a == ids_b == [5]
    res.close()
    lazy.close()


def test_reopen_keeps_mode_and_bytes(tmp_path, rng):
    _, lazy, vecs, metas = make_pair(tmp_path, rng)
    path = lazy.options.name
    lazy.close()
    # reopen WITHOUT asking for the mode: stored options win
    c = Collection(CollectionOptions(name=path, dimension_count=16,
                                     quantization=8))
    assert c.options.metadata_on_demand
    assert isinstance(c.columns.metadata, _LazyMetadata)
    assert c.get_document(42).metadata == metas[42]
    got = c.search(SearchArgs(vector=vecs[42], k=1))
    assert got.results[0].id == 42
    assert got.results[0].metadata == metas[42]
    c.close()


def test_remove_under_lease_returns_none(tmp_path, rng):
    """A row quarantined by an in-flight snapshot lease has no span-log
    entry anymore: the lazy column must yield None, not raise."""
    _, lazy, vecs, metas = make_pair(tmp_path, rng)
    row = lazy.columns._row_of[8]
    lazy.columns.begin_lease()
    try:
        lazy.remove_document(8)
        assert lazy.columns.metadata[row] is None
    finally:
        lazy.columns.end_lease()
    lazy.close()


def test_json_ok_validates_without_memo(tmp_path, rng):
    _, lazy, vecs, metas = make_pair(tmp_path, rng)
    r = lazy.search(SearchArgs(vector=vecs[0], k=1)).results[0]
    assert lazy.metadata_json_ok(r)
    assert not lazy.columns.meta_ok[lazy.columns._row_of[r.id]]  # no memo
    from syzgydb_tpu.core.collection import SearchResult
    assert not lazy.metadata_json_ok(SearchResult(0, b"not json", 0.0))
    lazy.close()


def test_rest_create_accepts_flag(tmp_path, monkeypatch):
    from syzgydb_tpu.server import config as cfg_mod
    from syzgydb_tpu.server import rest as rest_mod
    import threading
    import urllib.request

    monkeypatch.setattr(
        cfg_mod, "global_config",
        cfg_mod.Config(data_folder=str(tmp_path), html_root=""))
    srv = rest_mod.make_server(str(tmp_path))
    httpd = rest_mod.make_http_server(srv)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}/api/v1"

    def req(method, path, body=None):
        data = json.dumps(body).encode() if body is not None else None
        r = urllib.request.Request(base + path, data=data, method=method,
                                   headers={"Content-Type":
                                            "application/json"})
        with urllib.request.urlopen(r) as resp:
            return resp.status, json.loads(resp.read() or b"{}")

    try:
        st, _ = req("POST", "/collections", {
            "name": "oc", "vector_size": 4, "quantization": 8,
            "distance_function": "cosine", "metadata_on_demand": True})
        assert st in (200, 201)
        assert srv.collections["oc"].options.metadata_on_demand
        st, _ = req("POST", "/collections/oc/records", [
            {"id": 1, "vector": [0.1, 0.2, 0.3, 0.4],
             "metadata": {"a": "1"}}])
        assert st in (200, 201)
        st, out = req("POST", "/collections/oc/search",
                      {"vector": [0.1, 0.2, 0.3, 0.4], "k": 1})
        assert st == 200
        assert out["results"][0]["metadata"] == {"a": "1"}
    finally:
        httpd.shutdown()
        for c in srv.collections.values():
            c.close()


def test_lazy_metadata_iteration_terminates(tmp_path, rng):
    _, lazy, vecs, metas = make_pair(tmp_path, rng, n=10)
    got = list(lazy.columns.metadata)
    assert len(got) == lazy.columns.capacity
    live = [m for m in got if m is not None]
    assert sorted(live) == sorted(metas)
    lazy.close()


def test_read_stream0_matches_full_read(tmp_path):
    from syzgydb_tpu.core.storage import SpanLog
    p = str(tmp_path / "s0.dat")
    log = SpanLog(p)
    small = b'{"k": 1}'
    big = b'{"blob": "' + b"y" * 10_000 + b'"}'  # spills past the 4KB pread
    log.write("1", [small, b"\x01\x02\x03"])
    log.write("2", [big, b"\x04" * 400])
    assert log.read_stream0("1") == small == log.read("1")[0]
    assert log.read_stream0("2") == big == log.read("2")[0]
    log.write("1", [b'{"k": 2}', b"\x05"])  # superseding write
    assert log.read_stream0("1") == b'{"k": 2}'
    import pytest as _pytest
    with _pytest.raises(KeyError):
        log.read_stream0("missing")
    log.close()


def test_bulk_rows_streamed_parity(tmp_path, rng):
    """want_metas=False (bounded chunks, pread) must produce the same
    ids/vectors as the whole-image path, including multi-chunk splits."""
    from syzgydb_tpu.core.storage import SpanLog
    p = str(tmp_path / "bk.dat")
    log = SpanLog(p)
    n = 64
    vals = [bytes([i] * 24) for i in range(n)]
    for i in range(n):
        log.write(str(i), [b'{"i": %d}' % i, vals[i]])
    ids_a, metas_a, vec_a = log.bulk_rows()
    ids_b, metas_b, vec_b = log.bulk_rows(want_metas=False,
                                          chunk_bytes=256)  # many chunks
    assert metas_b is None
    assert dict(zip(ids_a, map(bytes, vec_a))) == \
        dict(zip(ids_b, map(bytes, vec_b)))
    log.close()


def test_out_of_core_reopen_uses_streamed_replay(tmp_path, rng,
                                                 monkeypatch):
    """Reopen of a lazy collection must not read the whole file image."""
    from syzgydb_tpu.core import storage as st_mod
    _, lazy, vecs, metas = make_pair(tmp_path, rng, n=120)
    path = lazy.options.name
    lazy.close()
    seen = {}
    orig = st_mod.SpanLog.bulk_rows

    def spy(self, want_metas=True, chunk_bytes=64 << 20):
        seen["want_metas"] = want_metas
        return orig(self, want_metas, chunk_bytes)

    monkeypatch.setattr(st_mod.SpanLog, "bulk_rows", spy)
    c = Collection(CollectionOptions(name=path, dimension_count=16,
                                     quantization=8))
    assert seen["want_metas"] is False
    assert c.search(SearchArgs(vector=vecs[7], k=1)).results[0].id == 7
    c.close()


def test_native_projection_chunked_when_lazy(tmp_path, rng, monkeypatch):
    """Filters on out-of-core collections fetch metadata in bounded
    chunks; results must match the resident engine."""
    from syzgydb_tpu.query import columnar
    monkeypatch.setattr(columnar, "_OOC_PROJECT_CHUNK", 16)
    res, lazy, vecs, metas = make_pair(tmp_path, rng)
    for fq in ('tag == "even"', "i >= 42 AND i < 77"):
        args = SearchArgs(vector=vecs[0], k=8, filter_query=fq)
        a = [r.id for r in res.search(args).results]
        b = [r.id for r in lazy.search(args).results]
        assert a == b
    res.close()
    lazy.close()


def test_fair_lock_acquire_exception_cleans_ticket():
    """An exception inside the blocked wait must not leave an orphaned
    ticket deadlocking later acquirers."""
    import threading
    from syzgydb_tpu.utils.locks import FairRLock
    lk = FairRLock()
    lk.acquire()  # main holds

    boom = {"n": 0}
    orig_wait = lk._cv.wait

    def exploding_wait(timeout=None):
        boom["n"] += 1
        raise RuntimeError("interrupted")

    lk._cv.wait = exploding_wait
    err = []

    def b():
        try:
            lk.acquire()
        except RuntimeError as e:
            err.append(e)

    t = threading.Thread(target=b)
    t.start()
    t.join(5)
    assert err and boom["n"] == 1
    lk._cv.wait = orig_wait
    assert not lk._queue  # ticket cleaned up
    lk.release()
    got = []

    def c():
        with lk:
            got.append(True)

    t2 = threading.Thread(target=c)
    t2.start()
    t2.join(5)
    assert got == [True]  # no deadlock


def test_export_streams_metadata_not_resident(tmp_path, rng):
    """Export of a metadata_on_demand collection must run at bounded RSS
    (review finding r5): the codes ride the streamed want_metas=False
    bulk_rows path and metadata is pread per chunk — never the
    whole-file-image want_metas=True path whose transient is exactly what
    the mode exists to avoid.  Output stays byte-identical to the
    resident collection's export."""
    import io
    from syzgydb_tpu.tools.dump import export_json

    res, lazy, vecs, metas = make_pair(tmp_path, rng, n=120)
    calls = []
    orig = lazy.spanlog.bulk_rows
    lazy.spanlog.bulk_rows = lambda want_metas=True, **kw: (
        calls.append(want_metas) or orig(want_metas=want_metas, **kw))
    for compact in (False, True):
        a, b = io.StringIO(), io.StringIO()
        export_json(res, a, compact=compact)
        export_json(lazy, b, compact=compact)
        # identical except the collection header (name/metadata_on_demand)
        a_recs = a.getvalue().split('"records"')[1]
        b_recs = b.getvalue().split('"records"')[1]
        assert a_recs == b_recs
    assert calls and all(c is False for c in calls)
    res.close()
    lazy.close()
