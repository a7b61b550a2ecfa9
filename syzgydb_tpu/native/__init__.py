"""ctypes bindings for the native span-log core (native/spanlog_core.cpp).

Loads libspanlog_core.so when present (built via `make -C native`, and
auto-built on first import when a compiler is available); storage.py falls
back to the pure-Python implementation otherwise, so the native library is an
accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libspanlog_core.so")
_SRC_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")

_lib = None


def _try_build() -> None:
    src = os.path.join(_SRC_DIR, "spanlog_core.cpp")
    if not os.path.exists(src):
        return
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-D_GNU_SOURCE",
             src, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
    except Exception:
        pass


def get_lib():
    """Returns the loaded library or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _try_build()
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.slc_crc32.restype = ctypes.c_uint32
    lib.slc_crc32.argtypes = [u8p, ctypes.c_uint64]
    lib.slc_encoded_size.restype = ctypes.c_uint64
    lib.slc_encoded_size.argtypes = [ctypes.c_uint64, u32p, ctypes.c_uint32,
                                     u32p]
    lib.slc_encode_batch.restype = ctypes.c_uint64
    lib.slc_encode_batch.argtypes = [
        ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint8, u8p, u32p,
        ctypes.c_uint32, u8p, u32p, u8p, u64p, u64p]
    lib.slc_scan.restype = ctypes.c_uint64
    lib.slc_scan.argtypes = [u8p, ctypes.c_uint64, ctypes.c_uint64, u64p,
                             u64p, u64p, u8p, u64p, u32p]
    _lib = lib
    return _lib


def _as_u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def encode_batch(first_seq: int, flags: int, rec_ids: list[bytes],
                 streams_per_record: list[list[bytes]]):
    """-> (buffer bytes, offsets np.uint64, lengths np.uint64) or None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(rec_ids)
    if n == 0:
        return b"", np.zeros(0, np.uint64), np.zeros(0, np.uint64)
    nstreams = len(streams_per_record[0])
    if any(len(s) != nstreams for s in streams_per_record):
        return None  # mixed stream counts: python fallback
    ids_cat = np.frombuffer(b"".join(rec_ids), dtype=np.uint8) \
        if any(rec_ids) else np.zeros(0, np.uint8)
    id_lens = np.array([len(r) for r in rec_ids], dtype=np.uint32)
    stream_lens = np.array(
        [len(s) for rec in streams_per_record for s in rec],
        dtype=np.uint32).reshape(n, max(nstreams, 1))
    payload = b"".join(s for rec in streams_per_record for s in rec)
    payload_arr = np.frombuffer(payload, dtype=np.uint8) if payload \
        else np.zeros(0, np.uint8)

    total = lib.slc_encoded_size(
        n, id_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), nstreams,
        stream_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    out = np.empty(int(total), dtype=np.uint8)
    offsets = np.empty(n, dtype=np.uint64)
    lengths = np.empty(n, dtype=np.uint64)
    written = lib.slc_encode_batch(
        n, first_seq, flags, _as_u8p(np.ascontiguousarray(ids_cat)),
        id_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), nstreams,
        _as_u8p(np.ascontiguousarray(payload_arr)),
        stream_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        _as_u8p(out),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    assert written == total
    return out.tobytes(), offsets, lengths


def scan(data: bytes):
    """Recovery scan -> list of (offset, length, seq, flags, rec_id) or None."""
    lib = get_lib()
    if lib is None:
        return None
    arr = np.frombuffer(data, dtype=np.uint8)
    # minimum syntactically valid record is 24 bytes (8B header + 12B empty
    # body + 4B crc), so len//24 bounds the entry count exactly (ADVICE r1)
    max_entries = max(1, len(data) // 24) + 1
    offsets = np.empty(max_entries, np.uint64)
    lengths = np.empty(max_entries, np.uint64)
    seqs = np.empty(max_entries, np.uint64)
    flags = np.empty(max_entries, np.uint8)
    id_offs = np.empty(max_entries, np.uint64)
    id_lens = np.empty(max_entries, np.uint32)
    count = lib.slc_scan(
        _as_u8p(np.ascontiguousarray(arr)), len(data), max_entries,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        seqs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        id_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        id_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    if int(count) >= max_entries:
        # table filled to capacity: the C scan stops early rather than
        # overflow, so trailing records may be missing — use the pure-Python
        # scan instead of silently truncating recovery (ADVICE r1)
        return None
    out = []
    for i in range(int(count)):
        s, l = int(id_offs[i]), int(id_lens[i])
        out.append((int(offsets[i]), int(lengths[i]), int(seqs[i]),
                    int(flags[i]), data[s:s + l].decode("utf-8")))
    return out
