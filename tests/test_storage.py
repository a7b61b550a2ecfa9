"""Span log durability tests, modeled on the reference's spanfile suite
(spanfile_test.go) including the randomized shadow-model batch test with
close/reopen after every batch (spanfile_test.go:327-429)."""

import os

import numpy as np
import pytest

from syzgydb_tpu.core.storage import SpanLog


def test_create_write_read(tmp_path):
    p = str(tmp_path / "log.dat")
    log = SpanLog(p)
    log.write("a", [b"meta", b"vec"])
    assert log.read("a") == [b"meta", b"vec"]
    assert "a" in log
    log.close()


def test_persistence_across_reopen(tmp_path):
    p = str(tmp_path / "log.dat")
    log = SpanLog(p)
    log.write("1", [b"m1", b"v1"])
    log.write("2", [b"m2", b"v2"])
    log.write("1", [b"m1b", b"v1b"])  # superseding update
    log.close()
    log2 = SpanLog(p)
    assert log2.read("1") == [b"m1b", b"v1b"]
    assert log2.read("2") == [b"m2", b"v2"]
    assert len(log2) == 2
    log2.close()


def test_remove_is_durable(tmp_path):
    p = str(tmp_path / "log.dat")
    log = SpanLog(p)
    log.write("1", [b"x"])
    log.write("2", [b"y"])
    log.remove("1")
    log.close()
    log2 = SpanLog(p)
    assert "1" not in log2
    assert log2.read("2") == [b"y"]
    log2.close()


def test_invalid_magic_rejected(tmp_path):
    p = str(tmp_path / "bad.dat")
    with open(p, "wb") as f:
        f.write(b"XXXX" + b"\x00" * 100)
    with pytest.raises(ValueError):
        SpanLog(p)


def test_corrupted_record_skipped(tmp_path):
    """Flip a byte inside a record body; recovery must skip just that record
    (spanfile_test.go:66-115 analog)."""
    p = str(tmp_path / "log.dat")
    log = SpanLog(p)
    log.write("1", [b"payload-one-000000000"])
    off_2 = os.path.getsize(p)
    log.write("2", [b"payload-two-111111111"])
    log.close()
    data = bytearray(open(p, "rb").read())
    data[off_2 + 20] ^= 0xFF  # corrupt record 2's body
    open(p, "wb").write(bytes(data))
    log2 = SpanLog(p)
    assert log2.read("1") == [b"payload-one-000000000"]
    assert "2" not in log2
    log2.close()


def test_truncated_tail_tolerated(tmp_path):
    p = str(tmp_path / "log.dat")
    log = SpanLog(p)
    log.write("1", [b"aaaa"])
    log.write("2", [b"bbbb"])
    log.close()
    size = os.path.getsize(p)
    with open(p, "r+b") as f:
        f.truncate(size - 3)  # crash mid-write of record 2
    log2 = SpanLog(p)
    assert log2.read("1") == [b"aaaa"]
    assert "2" not in log2
    log2.close()


def test_sorted_iteration_is_lexicographic(tmp_path):
    """IterateSortedRecords sorts on the ID *string* (spanfile.go:541-547)."""
    p = str(tmp_path / "log.dat")
    log = SpanLog(p)
    for i in [2, 10, 1, 100]:
        log.write(str(i), [b"x"])
    ids = [rec_id for rec_id, _ in log.iterate(sorted_ids=True)]
    assert ids == ["1", "10", "100", "2"]
    log.close()


def test_compaction_preserves_data(tmp_path):
    p = str(tmp_path / "log.dat")
    log = SpanLog(p, compact_min_garbage=1)
    for i in range(50):
        log.write("k", [b"v%d" % i])  # forces many superseded entries
    log.compact()
    assert log.read("k") == [b"v49"]
    log.close()
    log2 = SpanLog(p)
    assert log2.read("k") == [b"v49"]
    log2.close()


def test_batch_operations_shadow_model(tmp_path):
    """10k randomized ops in batches of 100 against a shadow dict, reopening
    the file after every batch — the strongest reference storage test
    (spanfile_test.go:327-429)."""
    p = str(tmp_path / "log.dat")
    rng = np.random.default_rng(7)
    shadow: dict[str, bytes] = {}
    log = SpanLog(p)
    n_ops = 10_000
    batch = 100
    for start in range(0, n_ops, batch):
        for _ in range(batch):
            op = rng.integers(0, 3)
            key = str(rng.integers(0, 500))
            if op == 0 or key not in shadow:  # create/update
                val = rng.integers(0, 256, size=int(rng.integers(1, 64))) \
                    .astype(np.uint8).tobytes()
                log.write(key, [val])
                shadow[key] = val
            elif op == 1:  # update
                val = rng.integers(0, 256, size=32).astype(np.uint8).tobytes()
                log.write(key, [val])
                shadow[key] = val
            else:  # delete
                log.remove(key)
                del shadow[key]
        # the incremental live-byte counter (O(1) _maybe_compact) must
        # track the O(records) oracle through every mutation kind
        assert log._live_bytes == _live_bytes_oracle(log)
        log.close()
        log = SpanLog(p)
        assert log._live_bytes == _live_bytes_oracle(log)  # recovery path
        assert set(log.ids()) == set(shadow.keys())
        for k, v in shadow.items():
            assert log.read(k) == [v]
    log.close()


def _live_bytes_oracle(log: SpanLog) -> int:
    from syzgydb_tpu.core.storage import _HDR
    return _HDR.size + sum(e.length for e in log._index.values())


def test_stats(tmp_path):
    p = str(tmp_path / "log.dat")
    log = SpanLog(p)
    log.write("", [b"options"])  # reserved options record not counted
    log.write("1", [b"x"])
    log.write("2", [b"y"])
    size, n = log.stats()
    assert n == 2
    assert size == os.path.getsize(p)
    log.close()


def test_background_compaction_with_concurrent_mutations(tmp_path):
    """Compaction must not stall mutations (VERDICT r2 weak #4): the bulk
    copy runs unlocked, and records written/updated/removed DURING the copy
    survive the swap and a reopen.  The _compact_hook seam interleaves
    mutations deterministically mid-copy from another thread's viewpoint."""
    import threading
    import time as _t

    p = str(tmp_path / "log.dat")
    log = SpanLog(p, compact_min_garbage=1 << 30)  # no auto-compaction
    shadow: dict[str, bytes] = {}
    for i in range(2000):
        val = b"v%d" % i
        log.write(str(i % 500), [val])
        shadow[str(i % 500)] = val

    write_latencies: list[float] = []
    done = threading.Event()

    def mutate():
        i = 0
        while not done.is_set():
            key = "m%d" % (i % 50)
            val = b"mut%d" % i
            t0 = _t.perf_counter()
            log.write(key, [val])
            write_latencies.append(_t.perf_counter() - t0)
            shadow[key] = val
            if i % 7 == 0 and str(i % 500) in shadow:
                log.remove(str(i % 500))
                del shadow[str(i % 500)]
            i += 1
            _t.sleep(0.0005)

    # slow the copy down so mutations demonstrably overlap it
    log._compact_hook = lambda: _t.sleep(0.001)
    mut = threading.Thread(target=mutate)
    mut.start()
    _t.sleep(0.01)
    t0 = _t.perf_counter()
    log.compact()  # synchronous here, but copy phase holds no lock
    compact_s = _t.perf_counter() - t0
    done.set()
    mut.join()

    assert compact_s > 0.3, "hook failed to slow the copy; test is vacuous"
    assert write_latencies, "no mutations overlapped the compaction"
    # bounded writer latency: no O(file) stall (generous bound for CI noise)
    assert max(write_latencies) < min(1.0, compact_s / 2), (
        max(write_latencies), compact_s)

    # everything the shadow says is live must survive swap + reopen
    for key, val in shadow.items():
        assert log.read(key) == [val]
    assert log._live_bytes == _live_bytes_oracle(log)  # compaction path
    log.close()
    log2 = SpanLog(p)
    assert {k for k in log2.ids()} == set(shadow)
    for key, val in shadow.items():
        assert log2.read(key) == [val]
    log2.close()


def test_background_compaction_triggered_by_garbage(tmp_path):
    """_maybe_compact schedules compaction off the mutation path; the file
    shrinks once it completes, with no explicit compact() call."""
    import time as _t

    p = str(tmp_path / "log.dat")
    log = SpanLog(p, compact_min_garbage=1024)
    payload = b"x" * 256
    rec = len(payload) + 64  # payload + record framing upper bound
    for i in range(400):
        log.write("k", [payload])  # 399 superseded versions = garbage
    # a handful of writes can land after the last compaction finished (each
    # leaves < compact_min_garbage behind, so no new run triggers); wait on
    # the observable — the file shrinking from ~125KB to a few records
    # generous: the compaction thread can starve for tens of seconds when
    # the full suite saturates the single shared core (observed flake)
    deadline = _t.monotonic() + 120.0
    while _t.monotonic() < deadline:
        size, n = log.stats()
        if size < 6 * rec:
            break
        _t.sleep(0.02)
    size, n = log.stats()
    assert n == 1
    assert size < 6 * rec, size
    assert log.read("k") == [payload]
    log.close()


def test_compaction_rearms_for_writes_during_worker_exit(tmp_path):
    """Writes landing after a compaction's swap but while the worker thread
    is still alive must still get compacted.  With the old bare is_alive()
    skip they were silently dropped and nothing re-armed (the missed-trigger
    race behind the test_background_compaction flake under GIL contention);
    the wanted-flag protocol guarantees the worker's exit-path re-check
    sees them."""
    import threading
    import time as _t

    p = str(tmp_path / "log.dat")
    log = SpanLog(p, compact_min_garbage=1024)
    payload = b"x" * 256
    rec = len(payload) + 64
    gate = threading.Event()
    first_done = threading.Event()
    orig = log.compact

    def slow_exit_compact():
        log.compact = orig  # later runs (the re-arm) behave normally
        orig()
        first_done.set()
        gate.wait(30.0)  # swap complete; worker stays alive in-window

    log.compact = slow_exit_compact
    for _ in range(20):
        log.write("k", [payload])  # triggers the first compaction
    assert first_done.wait(30.0), "first compaction never ran"
    # the race window: worker alive, its work already finished
    for _ in range(20):
        log.write("k", [payload])
    gate.set()
    deadline = _t.monotonic() + 60.0
    while _t.monotonic() < deadline:
        size, n = log.stats()
        if size < 6 * rec:
            break
        _t.sleep(0.01)
    size, n = log.stats()
    assert n == 1
    assert size < 6 * rec, size
    assert log.read("k") == [payload]
    log.close()


def test_compaction_tombstones_removed_during_copy(tmp_path):
    """An id removed WHILE its snapshot copy already landed in the new file
    must not resurrect after a reopen (the tombstone-superseding path)."""
    p = str(tmp_path / "log.dat")
    log = SpanLog(p, compact_min_garbage=1 << 30)
    for i in range(50):
        log.write(str(i), [b"v%d" % i])

    removed = []

    def hook():
        if not removed:
            log.remove("25")
            removed.append(True)
    log._compact_hook = hook
    log.compact()
    assert "25" not in log
    log.close()
    log2 = SpanLog(p)
    assert "25" not in log2
    assert log2.read("24") == [b"v24"]
    assert log2.record_count() == 49
    log2.close()


def test_write_many_columns_matches_write_many(tmp_path):
    """The columnar bulk append (contiguous vector-stream array, native
    split-stream encoder) must produce a byte-identical log to the
    per-record write_many path, and recover identically on reopen."""
    rng = np.random.default_rng(7)
    n, b = 64, 12
    ids = [str(i * 3) for i in range(n)]
    metas = [f'{{"i": {i}}}'.encode() for i in range(n)]
    metas[5] = b""  # empty metadata row
    rows = rng.integers(0, 256, size=(n, b)).astype(np.uint8)

    p1, p2 = str(tmp_path / "a.dat"), str(tmp_path / "b.dat")
    s1 = SpanLog(p1)
    s1.write_many_columns(ids, metas, rows)
    s1.close()
    s2 = SpanLog(p2)
    s2.write_many([(ids[i], [metas[i], rows[i].tobytes()])
                   for i in range(n)])
    s2.close()
    with open(p1, "rb") as f1, open(p2, "rb") as f2:
        assert f1.read() == f2.read()

    re = SpanLog(p1)
    for i in range(n):
        streams = re.read(ids[i])
        assert streams[0] == metas[i]
        assert streams[1] == rows[i].tobytes()
    re.close()


def test_write_many_columns_python_fallback(tmp_path, monkeypatch):
    """Without the native library the columnar path must fall back to
    write_many with identical results."""
    import syzgydb_tpu.native as native_mod
    monkeypatch.setattr(native_mod, "encode_batch_split",
                        lambda *a, **k: None)
    n, b = 8, 4
    ids = [str(i) for i in range(n)]
    metas = [b"{}"] * n
    rows = np.arange(n * b, dtype=np.uint8).reshape(n, b)
    s = SpanLog(str(tmp_path / "c.dat"))
    s.write_many_columns(ids, metas, rows)
    for i in range(n):
        assert s.read(ids[i])[1] == rows[i].tobytes()
    s.close()


def test_bulk_rows_matches_iterate(tmp_path):
    """The vectorized reopen fast path must agree record-for-record with
    iterate() after interleaved writes/updates/removes, and skip ''."""
    s = SpanLog(str(tmp_path / "bulk.dat"))
    s.write("", [b'{"options": 1}'])  # options record: excluded
    rng = np.random.default_rng(3)
    for i in range(200):
        s.write(str(i), [f'{{"i":{i}}}'.encode(),
                         rng.integers(0, 256, 24).astype(np.uint8).tobytes()])
    for i in range(0, 200, 7):
        s.remove(str(i))
    for i in range(1, 200, 11):  # supersede with new vector bytes
        s.write(str(i), [b"", rng.integers(0, 256, 24).astype(
            np.uint8).tobytes()])
    got = s.bulk_rows()
    assert got is not None
    ids, metas, vec = got
    want = {rid: streams for rid, streams in s.iterate() if rid != ""}
    assert set(ids) == set(want) and len(ids) == len(want)
    for j, rid in enumerate(ids):
        assert metas[j] == want[rid][0], rid
        assert vec[j].tobytes() == want[rid][1], rid
    s.close()


def test_bulk_rows_mixed_shapes_fall_back(tmp_path):
    s = SpanLog(str(tmp_path / "mixed.dat"))
    s.write("1", [b"{}", b"abcd"])
    s.write("2", [b"{}", b"abcdefgh"])  # different stream-1 width
    assert s.bulk_rows() is None
    s.write("2", [b"{}", b"wxyz"])  # now uniform again
    ids, metas, vec = s.bulk_rows()
    assert sorted(ids) == ["1", "2"] and vec.shape == (2, 4)
    s2 = SpanLog(str(tmp_path / "three.dat"))
    s2.write("1", [b"{}", b"abcd", b"extra"])  # 3 streams
    assert s2.bulk_rows() is None
    s.close(); s2.close()


def test_oversized_fields_rejected_loudly(tmp_path):
    """The native encoder's u16 id_len would silently truncate a 70000-byte
    id into a CRC-valid but corrupt record (review finding r5, confirmed);
    oversized fields must instead take the python path, which raises."""
    log = SpanLog(str(tmp_path / "log.dat"))
    with pytest.raises(Exception):
        log.write_many([("i" * 70000, [b"meta", b"vec"])])
    # nothing half-written: the log is still consistent
    log.write("ok", [b"m", b"v"])
    assert log.read("ok") == [b"m", b"v"]
    log.close()
    log2 = SpanLog(str(tmp_path / "log.dat"))
    assert log2.read("ok") == [b"m", b"v"]
    assert len(log2) == 1
    log2.close()


def test_read_stream0_long_id(tmp_path):
    """Ids longer than the fixed 4096-byte head pread must not crash the
    metadata-only read (review finding r5, confirmed struct.error)."""
    log = SpanLog(str(tmp_path / "log.dat"))
    long_id = "j" * 5000
    log.write(long_id, [b"METABYTES", b"\x00" * 100])
    assert log.read_stream0(long_id) == b"METABYTES"
    log.close()


def test_recover_skips_crc_colliding_malformed_record(tmp_path):
    """A corrupt region that passes CRC (adversarial or 1-in-2^32) with a
    too-short body or a non-UTF-8 id must resync like any other corruption
    — not crash the open (review finding r5)."""
    import struct
    import zlib
    from syzgydb_tpu.core import storage as st

    p = str(tmp_path / "log.dat")
    log = SpanLog(p)
    log.write("keep", [b"m", b"v"])
    log.close()
    # append two CRC-VALID but malformed records: a 3-byte body (too short
    # to hold seq+flags+id_len) and one whose id bytes are invalid UTF-8
    with open(p, "ab") as f:
        body = b"\x01\x02\x03"
        f.write(st._REC_HDR.pack(st.REC_MAGIC, len(body)) + body +
                struct.pack("<I", zlib.crc32(body)))
        bad_id = b"\xff\xfe"
        body = struct.pack("<QBH", 99, 0, len(bad_id)) + bad_id + b"\x00"
        f.write(st._REC_HDR.pack(st.REC_MAGIC, len(body)) + body +
                struct.pack("<I", zlib.crc32(body)))
    log2 = SpanLog(p)  # must not raise
    assert log2.read("keep") == [b"m", b"v"]
    assert len(log2) == 1
    log2.close()


def test_failed_write_leaves_no_phantom_entries(tmp_path):
    """An I/O failure mid-batch (ENOSPC) must not leave index entries
    pointing past EOF (review finding r5): write/flush happen BEFORE the
    index install on every bulk path."""
    log = SpanLog(str(tmp_path / "log.dat"))
    log.write_many([("1", [b"m1", b"v1"])])
    real_write = log._f.write

    def failing_write(buf):
        raise OSError(28, "No space left on device")

    log._f.write = failing_write
    with pytest.raises(OSError):
        log.write_many([("2", [b"m2", b"v2"]), ("1", [b"m1x", b"v1x"])])
    log._f.write = real_write
    # the failed batch is invisible; the old record is intact
    assert "2" not in log
    assert log.read("1") == [b"m1", b"v1"]
    # remove() must also append the tombstone before dropping the entry
    log._f.write = failing_write
    with pytest.raises(OSError):
        log.remove("1")
    log._f.write = real_write
    assert log.read("1") == [b"m1", b"v1"]  # still present after failure
    log.close()


def test_bulk_rows_streamed_survives_concurrent_compact(tmp_path,
                                                        monkeypatch):
    """The streamed bulk_rows path snapshots index entries, then preads
    OUTSIDE the lock; a background compaction swapping the file mid-stream
    must not redirect the reads to the new file at stale offsets (review
    finding r5 — the dup'd fd pins the old inode)."""
    import os as os_mod
    from syzgydb_tpu.core import storage as st

    log = SpanLog(str(tmp_path / "log.dat"))
    n, width = 64, 16
    rows = np.arange(n * width, dtype=np.uint8).reshape(n, width)
    items = [(str(i), [b"M%03d" % i, rows[i].tobytes()]) for i in range(n)]
    log.write_many(items)
    # rewrite half the records so compaction has garbage to drop and
    # every surviving record MOVES to a new offset in the compacted file
    log.write_many([(str(i), [b"M%03d" % i, rows[i].tobytes()])
                    for i in range(0, n, 2)])

    fired = []
    real_pread = os_mod.pread

    def pread_then_compact(fd, nbytes, off):
        if not fired:
            fired.append(1)
            log.compact()  # swap the log under the in-flight stream
        return real_pread(fd, nbytes, off)

    monkeypatch.setattr(st.os, "pread", pread_then_compact)
    out = log.bulk_rows(want_metas=False, chunk_bytes=1)
    monkeypatch.undo()
    assert fired and out is not None
    rec_ids, _, vec = out
    got = {rid: vec[i].tobytes() for i, rid in enumerate(rec_ids)}
    assert got == {str(i): rows[i].tobytes() for i in range(n)}
    log.close()
