"""Durable host-side record log ("span log").

Provides the same durability semantics as the reference's span file
(/root/reference/spanfile.go) with a layout redesigned for a scan engine:

* The reference uses a first-fit allocated, mmap'd file of checksummed spans so
  it can serve *random reads* from disk (spanfile.go:398-497).  A TPU scan
  engine instead rebuilds columnar in-memory/HBM arrays on open, so the disk
  format here is a simple append-only log of checksummed records — sequential
  writes, sequential recovery scan, periodic compaction.

Durability semantics preserved from the reference:
* Atomic superseding updates: a rewrite appends a new record with a higher
  sequence number; recovery keeps the highest-sequence entry per record ID
  (spanfile.go:333-341).
* CRC32 per record; corrupted or truncated entries are skipped with a log line
  and the scan resynchronizes on the next magic (spanfile.go:315-321).
* Deletes are tombstone records (the reference marks spans FREE,
  spanfile.go:364-396); compaction reclaims the space.
* Flushing is OS-page-cache-level by default, matching the reference's no-op
  msync (spanfile.go:868-872); pass ``sync=True`` for fsync-per-write.

Record ID "" is reserved for collection options, as in the reference
(collection.go:258-272).

Binary layout (little-endian):
    file   := "SYZL" u32(version=1) record*
    record := "RC01" u32(body_len) body u32(crc32(body))
    body   := u64(seq) u8(flags) u16(id_len) id u8(nstreams) (u32(len) bytes)*
    flags  := bit0 = tombstone
"""

from __future__ import annotations

import logging
import os
import struct
import threading
import zlib
from dataclasses import dataclass
from typing import Iterator

log = logging.getLogger("syzgydb.storage")


def _native_scan(data: bytes):
    """Native recovery scan; None -> pure-Python fallback."""
    try:
        from ..native import scan
        return scan(data)
    except Exception:
        return None


def _native_encode_batch(first_seq: int, flags: int, ids: list[bytes],
                         streams: list[list[bytes]]):
    try:
        from ..native import encode_batch
        return encode_batch(first_seq, flags, ids, streams)
    except Exception:
        return None

FILE_MAGIC = b"SYZL"
REC_MAGIC = b"RC01"
VERSION = 1
_HDR = struct.Struct("<4sI")
_REC_HDR = struct.Struct("<4sI")
_FLAG_TOMBSTONE = 1


@dataclass
class _Entry:
    seq: int
    offset: int  # offset of record magic
    length: int  # total record length on disk
    live_bytes: int  # == length (for garbage accounting)


def _encode_body(seq: int, flags: int, rec_id: str, streams: list[bytes]) -> bytes:
    idb = rec_id.encode("utf-8")
    parts = [struct.pack("<QBH", seq, flags, len(idb)), idb,
             struct.pack("<B", len(streams))]
    for s in streams:
        parts.append(struct.pack("<I", len(s)))
        parts.append(s)
    return b"".join(parts)


def _decode_body(body: bytes) -> tuple[int, int, str, list[bytes]]:
    seq, flags, id_len = struct.unpack_from("<QBH", body, 0)
    off = 11
    rec_id = body[off:off + id_len].decode("utf-8")
    off += id_len
    (nstreams,) = struct.unpack_from("<B", body, off)
    off += 1
    streams = []
    for _ in range(nstreams):
        (slen,) = struct.unpack_from("<I", body, off)
        off += 4
        streams.append(body[off:off + slen])
        off += slen
    return seq, flags, rec_id, streams


class SpanLog:
    """Append-only durable record log with superseding-write recovery."""

    def __init__(self, path: str, *, sync: bool = False,
                 compact_min_garbage: int = 1 << 20):
        self.path = path
        self.sync = sync
        self.compact_min_garbage = compact_min_garbage
        self._lock = threading.RLock()
        self._index: dict[str, _Entry] = {}
        self._max_seq = 0
        self._garbage = 0
        # live-record byte total, maintained incrementally at every index
        # mutation: _maybe_compact runs on EVERY write batch, and summing
        # the index there was an O(records) pass that dominated streaming
        # ingest at 10M rows (645 ms of the measured 645 ms/500-doc batch,
        # tools_dev/r11_ingest_scaling.py)
        self._live_bytes = _HDR.size
        self._closed = False
        # background compaction: mutations must never stall behind an
        # O(file) rewrite (VERDICT r2: the inline compact held the span-log
        # lock inside the collection lock for minutes at 10M-row scale)
        self._compact_mutex = threading.Lock()  # one compaction at a time
        self._compact_thread: threading.Thread | None = None
        self._compact_wanted = False  # set under _lock; consumed by worker
        self._compact_hook = None  # test seam: called once per copied record
        new = not os.path.exists(path) or os.path.getsize(path) == 0
        self._f = open(path, "a+b")
        if new:
            self._f.write(_HDR.pack(FILE_MAGIC, VERSION))
            self._f.flush()
        else:
            self._recover()
        self._f.seek(0, os.SEEK_END)

    # -- recovery ----------------------------------------------------------

    def _recover(self) -> None:
        self._f.seek(0)
        data = self._f.read()
        if len(data) < _HDR.size or data[:4] != FILE_MAGIC:
            raise ValueError(f"{self.path}: not a syzgydb-tpu span log")
        entries = _native_scan(data[_HDR.size:])
        if entries is not None:
            best: dict[str, tuple[int, int, int, bool]] = {}
            for off, length, seq, flags, rec_id in entries:
                off += _HDR.size
                prev = best.get(rec_id)
                if prev is None or seq > prev[0]:
                    if prev is not None:
                        self._garbage += prev[2]
                    best[rec_id] = (seq, off, length,
                                    bool(flags & _FLAG_TOMBSTONE))
                else:
                    self._garbage += length
                self._max_seq = max(self._max_seq, seq)
            for rec_id, (seq, off, length, dead) in best.items():
                if dead:
                    self._garbage += length
                else:
                    self._index[rec_id] = _Entry(seq, off, length, length)
                    self._live_bytes += length
            return
        pos = _HDR.size
        best: dict[str, tuple[int, int, int, bool]] = {}  # id -> (seq, off, len, dead)
        total = len(data)
        while pos + _REC_HDR.size <= total:
            magic, body_len = _REC_HDR.unpack_from(data, pos)
            end = pos + _REC_HDR.size + body_len + 4
            ok = magic == REC_MAGIC and end <= total
            if ok:
                body = data[pos + _REC_HDR.size:end - 4]
                (crc,) = struct.unpack_from("<I", data, end - 4)
                ok = zlib.crc32(body) == crc
            if ok:
                try:
                    # a CRC-colliding malformed body (too short, or a
                    # non-UTF-8 id) must resync like any other corruption,
                    # not crash the open — the recover-from-arbitrary-
                    # corruption invariant (review finding r5)
                    seq, flags, rec_id, _ = _decode_body(body)
                except Exception:
                    ok = False
            if not ok:
                # corrupted/truncated: resync on next record magic
                nxt = data.find(REC_MAGIC, pos + 1)
                log.warning("span log %s: skipping corrupt entry at offset %d",
                            self.path, pos)
                if nxt == -1:
                    break
                pos = nxt
                continue
            prev = best.get(rec_id)
            if prev is None or seq > prev[0]:
                if prev is not None:
                    self._garbage += prev[2]
                best[rec_id] = (seq, pos, end - pos, bool(flags & _FLAG_TOMBSTONE))
            else:
                self._garbage += end - pos
            self._max_seq = max(self._max_seq, seq)
            pos = end
        for rec_id, (seq, off, length, dead) in best.items():
            if dead:
                self._garbage += length
            else:
                self._index[rec_id] = _Entry(seq, off, length, length)
                self._live_bytes += length

    # -- primitives --------------------------------------------------------

    def _append(self, flags: int, rec_id: str, streams: list[bytes]) -> _Entry:
        self._max_seq += 1
        body = _encode_body(self._max_seq, flags, rec_id, streams)
        rec = _REC_HDR.pack(REC_MAGIC, len(body)) + body + struct.pack(
            "<I", zlib.crc32(body))
        self._f.seek(0, os.SEEK_END)
        offset = self._f.tell()
        self._f.write(rec)
        self._f.flush()
        if self.sync:
            os.fsync(self._f.fileno())
        return _Entry(self._max_seq, offset, len(rec), len(rec))

    # -- public API --------------------------------------------------------

    def write(self, rec_id: str, streams: list[bytes]) -> None:
        with self._lock:
            old = self._index.get(rec_id)
            entry = self._append(0, rec_id, streams)
            self._index[rec_id] = entry
            self._live_bytes += entry.length
            if old is not None:
                self._garbage += old.length
                self._live_bytes -= old.length
            self._maybe_compact()

    def write_many_columns(self, rec_ids: list[str], metas: list[bytes],
                           vec_rows) -> None:
        """Bulk append with the vector stream as one contiguous (N, B)
        uint8 array — the ingest hot path.  The native split-stream encoder
        (slc_encode_batch_split) reads the vector bytes straight out of the
        array, skipping N per-row tobytes() slices; falls back to
        write_many when the C library is unavailable."""
        import numpy as np
        n = len(rec_ids)

        def fallback_items():
            return [(rec_ids[i], [metas[i], vec_rows[i].tobytes()])
                    for i in range(n)]

        try:
            from ..native import encode_batch_split
        except Exception:
            encode_batch_split = None
        if encode_batch_split is None or n == 0:
            self.write_many(fallback_items())
            return
        with self._lock:
            self._f.seek(0, os.SEEK_END)
            offset = self._f.tell()
            stream_lens = np.empty((n, 2), dtype=np.uint32)
            stream_lens[:, 0] = [len(m) for m in metas]
            stream_lens[:, 1] = vec_rows.shape[1]
            # the encode bakes in seq numbers, so it must run under the
            # lock alongside the index update
            native = encode_batch_split(
                self._max_seq + 1, 0, [r.encode("utf-8") for r in rec_ids],
                [b"".join(metas), vec_rows], stream_lens)
            if native is None:  # RLock: safe to re-enter write_many
                self.write_many(fallback_items())
                return
            buf, offs, lens = native
            # write + flush BEFORE mutating the index: an I/O failure
            # (ENOSPC) must not leave phantom entries pointing past EOF
            # (review finding r5).  _max_seq advances with the encode's
            # baked-in seqs either way, so a retry after a partial durable
            # write always supersedes it.
            self._max_seq += len(rec_ids)
            self._f.write(buf)
            self._f.flush()
            if self.sync:
                os.fsync(self._f.fileno())
            seq0 = self._max_seq - len(rec_ids)
            for i, rec_id in enumerate(rec_ids):
                old = self._index.get(rec_id)
                if old is not None:
                    self._garbage += old.length
                    self._live_bytes -= old.length
                self._index[rec_id] = _Entry(seq0 + 1 + i,
                                             offset + int(offs[i]),
                                             int(lens[i]), int(lens[i]))
                self._live_bytes += int(lens[i])
            self._maybe_compact()

    def write_many(self, items: list[tuple[str, list[bytes]]]) -> None:
        """Bulk append: one buffered write + flush for the whole batch.
        Uses the native C++ encoder when available (native/spanlog_core.cpp)."""
        with self._lock:
            self._f.seek(0, os.SEEK_END)
            offset = self._f.tell()
            native = _native_encode_batch(self._max_seq + 1, 0,
                                          [i.encode("utf-8") for i, _ in items],
                                          [s for _, s in items])
            if native is not None:
                buf, offs, lens = native
                # write before index install (ENOSPC must not leave
                # phantom entries — review finding r5, see
                # write_many_columns)
                self._max_seq += len(items)
                self._f.write(buf)
                self._f.flush()
                if self.sync:
                    os.fsync(self._f.fileno())
                seq0 = self._max_seq - len(items)
                for i, (rec_id, _) in enumerate(items):
                    old = self._index.get(rec_id)
                    if old is not None:
                        self._garbage += old.length
                        self._live_bytes -= old.length
                    self._index[rec_id] = _Entry(seq0 + 1 + i,
                                                 offset + int(offs[i]),
                                                 int(lens[i]), int(lens[i]))
                    self._live_bytes += int(lens[i])
                self._maybe_compact()
                return
            chunks = []
            pending = []  # (rec_id, seq, offset, length) — install after IO
            for rec_id, streams in items:
                self._max_seq += 1
                body = _encode_body(self._max_seq, 0, rec_id, streams)
                rec = _REC_HDR.pack(REC_MAGIC, len(body)) + body + struct.pack(
                    "<I", zlib.crc32(body))
                pending.append((rec_id, self._max_seq, offset, len(rec)))
                offset += len(rec)
                chunks.append(rec)
            self._f.write(b"".join(chunks))
            self._f.flush()
            if self.sync:
                os.fsync(self._f.fileno())
            for rec_id, seq, off, length in pending:
                old = self._index.get(rec_id)
                if old is not None:
                    self._garbage += old.length
                    self._live_bytes -= old.length
                self._index[rec_id] = _Entry(seq, off, length, length)
                self._live_bytes += length
            self._maybe_compact()

    def read(self, rec_id: str) -> list[bytes]:
        with self._lock:
            entry = self._index.get(rec_id)
            if entry is None:
                raise KeyError(rec_id)
            self._f.seek(entry.offset)
            rec = self._f.read(entry.length)
            body = rec[_REC_HDR.size:-4]
            _, _, rid, streams = _decode_body(body)
            assert rid == rec_id
            return streams

    def read_stream0(self, rec_id: str) -> bytes:
        """Stream 0 (metadata) only, via bounded preads — the out-of-core
        metadata hot path must not read and decode the record's packed
        vector stream just to return the metadata bytes.  Layout (see
        _encode_body): 8B record header, u64 seq, u8 flags, u16 id_len,
        id, u8 nstreams, u32 s0_len, s0 bytes, ..."""
        with self._lock:
            entry = self._index.get(rec_id)
            if entry is None:
                raise KeyError(rec_id)
            self._f.flush()
            fd = self._f.fileno()
            head = os.pread(fd, min(entry.length, 4096), entry.offset)
            (id_len,) = struct.unpack_from("<H", head, 17)
            p0 = 20 + id_len  # past header+seq+flags+id_len+id+nstreams
            if p0 + 4 > len(head):
                # id longer than the fixed head read (pathological but
                # legal): extend to cover the stream-0 length field
                # (review finding r5 — struct.error crashed the read)
                head += os.pread(fd, min(entry.length, p0 + 4) - len(head),
                                 entry.offset + len(head))
            (m_len,) = struct.unpack_from("<I", head, p0)
            end = p0 + 4 + m_len
            if end <= len(head):
                return head[p0 + 4:end]
            more = os.pread(fd, end - len(head),
                            entry.offset + len(head))
            return head[p0 + 4:] + more

    def remove(self, rec_id: str) -> None:
        with self._lock:
            entry = self._index.get(rec_id)
            if entry is None:
                raise KeyError(rec_id)
            # append the tombstone BEFORE dropping the index entry: a
            # failed write must not make the record vanish from memory
            # while staying live on disk (review finding r5)
            tomb = self._append(_FLAG_TOMBSTONE, rec_id, [])
            del self._index[rec_id]
            self._live_bytes -= entry.length
            self._garbage += entry.length + tomb.length
            self._maybe_compact()

    def __contains__(self, rec_id: str) -> bool:
        with self._lock:
            return rec_id in self._index

    def __len__(self) -> int:
        with self._lock:
            return len(self._index)

    def ids(self) -> list[str]:
        with self._lock:
            return list(self._index.keys())

    def record_count(self) -> int:
        """Number of live records excluding the reserved "" options record."""
        with self._lock:
            n = len(self._index)
            return n - 1 if "" in self._index else n

    def stats(self) -> tuple[int, int]:
        """(file_size_bytes, live_record_count_excluding_options)."""
        with self._lock:
            self._f.seek(0, os.SEEK_END)
            return self._f.tell(), self.record_count()

    def bulk_rows(self, want_metas: bool = True,
                  chunk_bytes: int = 64 << 20):
        """All live two-stream records decoded in one vectorized pass:
        (rec_ids, stream0 list[bytes], stream1 (N, B) uint8 matrix) in
        iterate() order, skipping the options record "".  want_metas=False
        additionally bounds the transient: the file is processed in ~64 MB
        chunks instead of one whole-file image (out-of-core metadata
        replay — a collection whose metadata exceeds host RAM must reopen
        without ever holding it all).

        The reopen-replay fast path: stream spans are computed with numpy
        byte gathers over the file image (the record layout is fixed:
        8B header, u64 seq, u8 flags, u16 id_len, id, u8 nstreams,
        (u32 len + bytes)*), so the ~7s/500k per-record python decode loop
        becomes a handful of array ops.  Returns None when the records
        don't have the uniform shape (mixed stream counts or stream-1
        widths) — callers fall back to iterate()."""
        import numpy as np
        with self._lock:
            entries = [(rid, e) for rid, e in self._index.items()
                       if rid != ""]
            if not entries:
                return [], [], None
            if want_metas:
                self._f.seek(0)
                image = self._f.read()
            else:
                self._f.flush()
                # dup() pins the CURRENT open file description: if a
                # background compaction swaps the log mid-stream
                # (close + os.replace + reopen), the borrowed fileno()
                # would be reused by the NEW file and the remaining preads
                # would silently read the compacted file at stale snapshot
                # offsets (review finding r5).  The dup'd fd keeps the old
                # inode alive — appends never disturb captured offsets, so
                # it stays a consistent snapshot for `entries`.
                fd = os.dup(self._f.fileno())

        def decode_chunk(arr, offs, vec, rows):
            """Gather the vector spans of the records at `offs` (relative
            to `arr`) into vec[rows]; returns False on non-uniform shape."""
            def u32(at):
                return (arr[at].astype(np.int64)
                        | arr[at + 1].astype(np.int64) << 8
                        | arr[at + 2].astype(np.int64) << 16
                        | arr[at + 3].astype(np.int64) << 24)

            idl = arr[offs + 17].astype(np.int64) \
                | arr[offs + 18].astype(np.int64) << 8
            if not (arr[offs + 19 + idl] == 2).all():
                return None  # nstreams != 2 somewhere
            p0 = offs + 20 + idl
            mlen = u32(p0)
            moff = p0 + 4
            vlen = u32(moff + mlen)
            voff = moff + mlen + 4
            if not (vlen == (vec.shape[1] if vec is not None
                             else vlen[0])).all():
                return None
            if vec is None:
                vec = np.empty((n, int(vlen[0])), np.uint8)
            cols = np.arange(vec.shape[1], dtype=np.int64)
            step = 16384
            for s in range(0, len(offs), step):
                vec[rows[s:s + step]] = arr[voff[s:s + step, None] + cols]
            return vec, moff, mlen

        n = len(entries)
        if want_metas:
            arr = np.frombuffer(image, np.uint8)
            offs = np.array([e.offset for _, e in entries], np.int64)
            out = decode_chunk(arr, offs, None, np.arange(n))
            if out is None:
                return None
            vec, moff, mlen = out
            metas = [image[o:o + l]
                     for o, l in zip(moff.tolist(), mlen.tolist())]
            return [rid for rid, _ in entries], metas, vec

        # streamed: records sorted by offset, grouped into chunks that
        # cover whole records (chunk boundary extends to the last record's
        # end), so peak transient = one chunk
        try:
            order = sorted(range(n), key=lambda i: entries[i][1].offset)
            vec = None
            chunk_target = chunk_bytes
            i = 0
            while i < n:
                j = i
                start = entries[order[i]][1].offset
                end = start
                while j < n:
                    e = entries[order[j]][1]
                    if e.offset + e.length - start > chunk_target and j > i:
                        break
                    end = max(end, e.offset + e.length)
                    j += 1
                buf = os.pread(fd, end - start, start)
                arr = np.frombuffer(buf, np.uint8)
                rows = np.array(order[i:j], np.int64)
                offs = np.array([entries[k][1].offset - start
                                 for k in order[i:j]], np.int64)
                if vec is None:
                    out = decode_chunk(arr, offs, None, rows)
                    if out is None:
                        return None
                    vec = out[0]
                else:
                    if decode_chunk(arr, offs, vec, rows) is None:
                        return None
                i = j
            return [rid for rid, _ in entries], None, vec
        finally:
            os.close(fd)

    def iterate(self, sorted_ids: bool = False) -> Iterator[tuple[str, list[bytes]]]:
        """Yield (id, streams) for live records.

        sorted_ids=True sorts lexicographically on the ID *string*, matching
        the reference's IterateSortedRecords (spanfile.go:540-547) — note this
        is decimal-string order for numeric IDs, a documented reference quirk.
        """
        with self._lock:
            keys = self.ids()
        if sorted_ids:
            keys.sort()
        for rec_id in keys:
            try:
                yield rec_id, self.read(rec_id)
            except KeyError:
                continue  # removed concurrently

    # -- compaction --------------------------------------------------------

    def _maybe_compact(self) -> None:
        # _live_bytes is maintained incrementally (see __init__): this
        # runs on every write batch, and an O(records) sum here measured
        # 645 ms/batch at 10M rows — the config5 streaming collapse
        live = self._live_bytes
        if self._garbage >= max(live, self.compact_min_garbage):
            self._start_background_compact()

    def _start_background_compact(self) -> None:
        # Caller holds _lock.  The wanted flag + self-detaching worker close
        # a missed-trigger race: with a bare is_alive() check, writes landing
        # after the worker's swap but before its exit were skipped ("thread
        # alive") yet never re-armed — garbage then sat uncompacted until the
        # next write (observed as a test flake under single-core GIL
        # contention, where that window spans many writes).
        self._compact_wanted = True
        if self._compact_thread is not None or self._closed:
            return
        t = threading.Thread(
            target=self._background_compact, daemon=True,
            name=f"syzgy-compact-{os.path.basename(self.path)}")
        self._compact_thread = t
        t.start()

    def _background_compact(self) -> None:
        while True:
            with self._lock:
                if self._closed or not self._compact_wanted:
                    self._compact_thread = None  # detach under _lock: a
                    return  # concurrent writer now starts a fresh worker
                self._compact_wanted = False
            try:
                self.compact()
            except Exception:
                log.exception("background compaction of %s failed",
                              self.path)
                with self._lock:
                    self._compact_thread = None
                return  # next triggering write re-arms; don't spin on error

    def compact(self) -> None:
        """Rewrite live records into a fresh log; atomic rename over original.

        Copy-then-swap with a SHORT critical section: the bulk copy runs
        WITHOUT the span-log lock against a snapshot of the index (records
        are immutable once appended, so snapshot offsets stay readable via
        an independent fd even as writers append).  Only the tail catch-up
        — records appended/updated/removed during the copy, O(concurrent
        mutations) — and the file swap run under the lock, so writer
        latency stays bounded regardless of log size (the reference's
        freemap reuse never stalls writers either, freemap.go:63-91)."""
        with self._compact_mutex:
            with self._lock:
                if self._closed:
                    return
                snapshot = dict(self._index)
                self._f.flush()
            tmp = self.path + ".compact"
            rfd = os.open(self.path, os.O_RDONLY)
            try:
                with open(tmp, "wb") as out:
                    out.write(_HDR.pack(FILE_MAGIC, VERSION))
                    # phase 1 (unlocked): copy the snapshot's raw records
                    copied: dict[str, tuple[int, int, int]] = {}
                    for rec_id, entry in snapshot.items():
                        rec = os.pread(rfd, entry.length, entry.offset)
                        copied[rec_id] = (entry.seq, out.tell(), entry.length)
                        out.write(rec)
                        hook = self._compact_hook
                        if hook is not None:
                            hook()
                    # phase 2 (locked): tail catch-up + atomic swap
                    with self._lock:
                        if self._closed:
                            return
                        stale = 0
                        new_index: dict[str, _Entry] = {}
                        for rec_id, entry in self._index.items():
                            cop = copied.get(rec_id)
                            if cop is not None and cop[0] == entry.seq:
                                new_index[rec_id] = _Entry(
                                    entry.seq, cop[1], cop[2], cop[2])
                                continue
                            # created/updated during the copy: the current
                            # version supersedes any stale snapshot copy
                            if cop is not None:
                                stale += cop[2]
                            rec = os.pread(rfd, entry.length, entry.offset)
                            new_index[rec_id] = _Entry(
                                entry.seq, out.tell(), entry.length,
                                entry.length)
                            out.write(rec)
                        # ids removed during the copy left stale records in
                        # the new file: supersede them with tombstones or a
                        # crash+reopen would resurrect them
                        for rec_id, cop in copied.items():
                            if rec_id not in self._index:
                                stale += cop[2]
                                self._max_seq += 1
                                body = _encode_body(self._max_seq,
                                                    _FLAG_TOMBSTONE,
                                                    rec_id, [])
                                trec = _REC_HDR.pack(
                                    REC_MAGIC, len(body)) + body + \
                                    struct.pack("<I", zlib.crc32(body))
                                stale += len(trec)
                                out.write(trec)
                        out.flush()
                        os.fsync(out.fileno())
                        self._f.close()
                        os.replace(tmp, self.path)
                        self._f = open(self.path, "a+b")
                        self._index = new_index
                        self._garbage = stale
                        # O(live) once per compaction (already O(file))
                        self._live_bytes = _HDR.size + sum(
                            e.length for e in new_index.values())
            finally:
                os.close(rfd)
                try:  # leftover tmp from an abort path
                    os.remove(tmp)
                except OSError:
                    pass

    def close(self) -> None:
        # mark closed first (aborts any in-flight compaction at its next
        # checkpoint), then join OUTSIDE the lock — the compaction's swap
        # section takes the lock, so joining under it would deadlock
        with self._lock:
            self._closed = True
            t = self._compact_thread
        if t is not None and t.is_alive():
            t.join(timeout=60.0)
        with self._lock:
            if not self._f.closed:
                self._f.flush()
                self._f.close()
