"""Native span-log core tests: byte-for-byte interop between the C++ and
pure-Python encoder/scanner paths."""

import ctypes
import zlib

import numpy as np
import pytest

from syzgydb_tpu import native
from syzgydb_tpu.core import storage


requires_native = pytest.mark.skipif(native.get_lib() is None,
                                     reason="native lib unavailable")


@requires_native
def test_crc32_matches_zlib(rng):
    lib = native.get_lib()
    for size in [0, 1, 7, 8, 9, 1000, 65537]:
        data = rng.integers(0, 256, size=size).astype(np.uint8).tobytes()
        arr = np.frombuffer(data, dtype=np.uint8) if data else \
            np.zeros(0, np.uint8)
        got = lib.slc_crc32(arr.ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)), len(data))
        assert got == zlib.crc32(data)


@requires_native
def test_native_encode_matches_python():
    ids = [b"", b"1", b"4294967295", "ünicode".encode()]
    streams = [[b"m0", b"v0"], [b"m1", b"v1"], [b"", b"x"], [b"a" * 100, b"b"]]
    buf, offs, lens = native.encode_batch(7, 0, ids, streams)
    # python encodes the same records
    py = b""
    import struct
    for i, (rid, st) in enumerate(zip(ids, streams)):
        body = storage._encode_body(7 + i, 0, rid.decode(), st)
        py += storage._REC_HDR.pack(storage.REC_MAGIC, len(body)) + body + \
            struct.pack("<I", zlib.crc32(body))
    assert buf == py


@requires_native
def test_native_scan_reads_python_written_file(tmp_path):
    """File written record-by-record (python path) recovers via native scan."""
    p = str(tmp_path / "log.dat")
    log = storage.SpanLog(p)
    log.write("a", [b"x", b"y"])
    log.write("b", [b"z"])
    log.write("a", [b"x2", b"y2"])  # supersede
    log.remove("b")
    log.close()
    data = open(p, "rb").read()
    entries = native.scan(data[storage._HDR.size:])
    assert entries is not None
    assert [e[4] for e in entries] == ["a", "b", "a", "b"]
    assert entries[-1][3] & 1  # tombstone flag

    # full reopen (uses native scan internally) sees the same state
    log2 = storage.SpanLog(p)
    assert log2.read("a") == [b"x2", b"y2"]
    assert "b" not in log2
    log2.close()


@requires_native
def test_native_scan_resyncs_after_corruption(tmp_path):
    p = str(tmp_path / "log.dat")
    log = storage.SpanLog(p)
    log.write_many([(str(i), [b"payload-%d" % i]) for i in range(10)])
    log.close()
    data = bytearray(open(p, "rb").read())
    # corrupt the 3rd record's body
    entries = native.scan(bytes(data[storage._HDR.size:]))
    off = entries[3][0] + storage._HDR.size + 12
    data[off] ^= 0xFF
    open(p, "wb").write(bytes(data))
    log2 = storage.SpanLog(p)
    ids = set(log2.ids())
    assert "3" not in ids
    assert ids == {str(i) for i in range(10)} - {"3"}
    log2.close()


@requires_native
def test_bulk_write_native_read_python(tmp_path, rng):
    p = str(tmp_path / "log.dat")
    log = storage.SpanLog(p)
    items = [(str(i), [rng.integers(0, 256, size=20).astype(np.uint8)
                       .tobytes()]) for i in range(500)]
    log.write_many(items)
    for rec_id, streams in items:
        assert log.read(rec_id) == streams
    log.close()
    log2 = storage.SpanLog(p)
    assert len(log2) == 500
    log2.close()
