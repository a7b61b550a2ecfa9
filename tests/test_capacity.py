"""Capacity preflight (core/capacity.py): over-capacity ingests and reopens
must fail with a clean CapacityError BEFORE anything is written, and the
estimate arithmetic must mirror ColumnStore's actual growth policy."""

import json

import numpy as np
import pytest

from syzgydb_tpu import Collection, CollectionOptions, SearchArgs, COSINE
from syzgydb_tpu.core import capacity as cap
from syzgydb_tpu.core.columns import ColumnStore


def make(tmp_path, n=0, dims=8, **kw):
    c = Collection(CollectionOptions(
        name=str(tmp_path / "cap.dat"), distance_method=COSINE,
        dimension_count=dims, quantization=8, create_and_overwrite=True,
        index_seed=3, **kw))
    if n:
        vecs = np.random.default_rng(0).uniform(-1, 1, size=(n, dims))
        c.add_documents(list(range(n)), vecs,
                        [json.dumps({"i": i}).encode() for i in range(n)])
    return c


def test_grown_capacity_mirrors_column_store():
    cs = ColumnStore(4, 8)
    for want in (1, 1000, 1025, 5000, 300_000):
        cs._grow(want)
        assert cs.capacity == cap.grown_capacity(0, want), want
    # linear-growth regime stays 8192-aligned
    big = cap.grown_capacity(1 << 22, (1 << 22) + 1)
    assert big % 8192 == 0 and big > (1 << 22)


def test_over_capacity_ingest_raises_cleanly(tmp_path, monkeypatch):
    c = make(tmp_path, n=10)
    monkeypatch.setattr(cap, "host_available", lambda: 1 << 17)  # 128 KiB
    vecs = np.zeros((5000, 8))
    before = c.get_document_count()
    with pytest.raises(cap.CapacityError, match="host RAM"):
        c.add_documents(list(range(100, 5100)), vecs, [b"{}"] * 5000)
    # nothing was written: count unchanged, collection still serves
    assert c.get_document_count() == before
    res = c.search(SearchArgs(vector=np.zeros(8), k=3))
    assert len(res.results) == 3
    c.close()


def test_within_capacity_ingest_unaffected(tmp_path, monkeypatch):
    monkeypatch.setattr(cap, "host_available", lambda: 8 << 30)
    c = make(tmp_path, n=10)
    c.add_documents([100, 101], np.zeros((2, 8)), [b"{}", b"{}"])
    assert c.get_document_count() == 12
    c.close()


def test_single_add_over_capacity_raises(tmp_path, monkeypatch):
    c = make(tmp_path, n=10)
    monkeypatch.setattr(cap, "host_available", lambda: 1 << 16)  # 64 KiB
    # the next add that would GROW capacity must raise; rewrites of an
    # existing id never grow and must pass
    c.add_document(5, np.zeros(8), b"{}")  # rewrite: no growth check
    with pytest.raises(cap.CapacityError):
        for i in range(2000):  # crosses the 1024 initial capacity
            c.add_document(10_000 + i, np.zeros(8), b"{}")
    c.close()


def test_over_capacity_reopen_raises(tmp_path, monkeypatch):
    c = make(tmp_path, n=50)
    name = c.options.name
    c.close()
    monkeypatch.setattr(cap, "host_available", lambda: 1 << 12)  # 4 KiB
    with pytest.raises(cap.CapacityError):
        Collection(CollectionOptions(name=name, dimension_count=8,
                                     quantization=8))


def test_device_budget_check(tmp_path, monkeypatch):
    monkeypatch.setattr(cap, "host_available", lambda: 64 << 30)
    monkeypatch.setattr(cap, "device_budget", lambda: 1 << 20)  # 1 MiB HBM
    c = make(tmp_path, n=10)
    with pytest.raises(cap.CapacityError, match="HBM"):
        c.add_documents(list(range(100, 40_100)),
                        np.zeros((40_000, 8)), [b"{}"] * 40_000)
    c.close()


def test_update_batches_never_trip_preflight(tmp_path, monkeypatch):
    """Re-ingesting EXISTING ids (and filling free-list rows) allocates
    nothing, so it must pass even when the next growth rung would not fit
    (review finding r5: n_new used to count every batch row)."""
    c = make(tmp_path, n=100)
    monkeypatch.setattr(cap, "host_available", lambda: 1)  # nothing fits
    # pure update batch: same ids, new data
    c.add_documents(list(range(100)), np.zeros((100, 8)),
                    [b'{"u": 1}'] * 100)
    assert c.get_document_count() == 100
    # free-list reuse: remove then re-add different ids, same row count
    c.remove_document(7)
    c.add_document(5007, np.zeros(8), b"{}")
    # packed path takes the same accounting
    from syzgydb_tpu.ops import quantize as qz
    packed = qz.pack_vectors(np.zeros((100, 8)), 8)
    c.add_documents_packed(list(range(100)), packed, [b"{}"] * 100)
    c.close()


def test_meta_memo_reset_on_rewrite(tmp_path):
    """A row rewritten with invalid metadata after its valid bytes were
    memoized must NOT splice raw (review finding r5: the identity check
    alone passed for post-rewrite results)."""
    from syzgydb_tpu.core.collection import SearchResult
    c = make(tmp_path, n=4)
    r1 = c.search(SearchArgs(vector=np.zeros(8), k=1)).results[0]
    assert c.metadata_json_ok(r1)  # memoizes the row
    # rewrite the same id (same row) with NON-JSON metadata
    c.add_document(r1.id, np.zeros(8), b"not json")
    r2 = c.search(SearchArgs(vector=np.zeros(8), k=4))
    bad = [r for r in r2.results if r.id == r1.id][0]
    assert bad.metadata == b"not json"
    assert not c.metadata_json_ok(bad)
    # row reuse via remove + re-add must also revalidate
    c.remove_document(r1.id)
    c.add_document(9001, np.zeros(8), b"also not json")
    res = SearchResult(9001, c.columns.metadata[c.columns._row_of[9001]],
                       0.0)
    assert not c.metadata_json_ok(res)
    # update_document path
    c.add_document(9002, np.zeros(8), b'{"ok": 1}')
    r = SearchResult(9002, c.columns.metadata[c.columns._row_of[9002]], 0.0)
    assert c.metadata_json_ok(r)
    c.update_document(9002, b"nope")
    r = SearchResult(9002, c.columns.metadata[c.columns._row_of[9002]], 0.0)
    assert not c.metadata_json_ok(r)
    c.close()


def test_rest_insert_maps_capacity_error_to_507(tmp_path, monkeypatch):
    import threading
    from syzgydb_tpu.server import rest as rest_mod
    from tests.test_rest import make_coll, req

    monkeypatch.setattr(cap, "host_available", lambda: 1 << 16)  # 64 KiB
    srv = rest_mod.make_server(str(tmp_path))
    httpd = rest_mod.make_http_server(srv)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        code, _ = make_coll(base, dims=4)
        assert code == 201
        code, body = req(base, "POST", "/api/v1/collections/test/records",
                         [{"id": i, "vector": [0, 0, 0, 0.1]}
                          for i in range(3000)])
        assert code == 507
        assert "host RAM" in str(body)
    finally:
        httpd.shutdown()
        for c in srv.collections.values():
            c.close()


def test_put_many_installs_bytes_before_memo_reset(tmp_path):
    """Write-ordering pin (review finding r5): the memo reset must FOLLOW
    the metadata bytes install, as in put/set_metadata.  Reset-first
    reopens the stale-True race — a reader that validated the old bytes
    after the reset would memoize True, pass its identity re-check
    (bytes not yet swapped), and the new unvalidated bytes would then be
    spliced verbatim into REST responses."""
    c = make(tmp_path, n=8)
    cols = c.columns
    events = []

    class TraceList(list):
        def __setitem__(self, i, v):
            events.append("md")
            super().__setitem__(i, v)

    class TraceOk(np.ndarray):
        def __setitem__(self, idx, v):
            events.append("ok")
            super().__setitem__(idx, v)

    cols.metadata = TraceList(cols.metadata)
    cols.meta_ok = cols.meta_ok.view(TraceOk)
    ids = np.array([1, 2, 3], dtype=np.uint64)  # existing rows: no grow
    cols.put_many(ids, np.zeros((3, 8)), [b"{}"] * 3)
    ok_pos = [i for i, e in enumerate(events) if e == "ok"]
    md_pos = [i for i, e in enumerate(events) if e == "md"]
    assert md_pos and ok_pos, events
    assert min(ok_pos) > max(md_pos), events  # bytes first, reset last
    c.close()
