"""Columnar in-memory document store.

The TPU-native replacement for the reference's random-access span reads: all
live vectors sit in flat, padded numpy arrays mirroring the device layout, so
search is a dense scan and adding a document is an O(D) row write.  Rows are
recycled from a free list after removals (the HBM analog of freemap.go's
range reuse); `version` bumps on every mutation so the device cache knows to
refresh.
"""

from __future__ import annotations

import numpy as np

from ..ops import distance as dist_ops
from ..ops import quantize as qz

_INITIAL_CAPACITY = 1024
# above this, grow 25% at a time instead of doubling: at 10M+ rows the
# power-of-two jump wastes multiple GB of HBM.  Capacity stays 8192-aligned:
# 4096 covers the block tiling of every device kernel, and the interleaved
# fused matmul+min surface (ops/pallas_scan.segment_min_scan_ilv) needs
# 128-segment blocks of 64 rows
_LINEAR_GROWTH_ABOVE = 1 << 22
_GROWTH_ALIGN = 8192


class _LazyMetadata:
    """List-like metadata column that keeps NOTHING resident: reads fetch
    the bytes from the span log by doc id (out-of-core metadata mode — the
    analog of the reference serving record reads from the mmapped span
    file on demand, spanfile.go:241-262/513, so collections whose metadata
    exceeds host RAM still work for CRUD/list/filter workloads).

    Writes are no-ops by design: every Collection mutation path writes the
    span log BEFORE touching the columns, so the log is always the
    authoritative byte source by the time a read could happen (all reads
    and writes run under the collection lock; background log compaction
    preserves bytes exactly)."""

    def __init__(self, store: "ColumnStore", fetch):
        self._store = store
        self._fetch = fetch  # doc_id -> bytes (raises KeyError when gone)

    def __getitem__(self, row: int):
        st = self._store
        if row >= st.capacity:
            # real bound, not None: the legacy __getitem__ iteration
            # protocol (list(col), `for m in col`) must terminate
            raise IndexError(row)
        if row >= st.size or not st.valid[row]:
            return None
        try:
            return self._fetch(int(st.ids[row]))
        except KeyError:
            return None  # removed under an active snapshot lease

    def __setitem__(self, row: int, value) -> None:
        pass  # the span log is the store

    def extend(self, items) -> None:
        pass

    def __len__(self) -> int:
        return self._store.capacity


class ColumnStore:
    def __init__(self, dims: int, quantization: int, hash_words: int = 0,
                 metadata_fetch=None):
        self.dims = dims
        self.quantization = quantization
        self.hash_words = hash_words
        self.capacity = 0
        self.size = 0  # high-water mark of used rows (rows < size may be dead)
        self.version = 0
        self._row_of: dict[int, int] = {}  # doc id -> row
        self._free: list[int] = []
        self._free_pending: list[int] = []  # freed under an active lease
        self._leases = 0
        # host_dtype, not device_dtype: 64-bit columns stay f64 host-side
        # so exact searches can rerank in full reference precision; the
        # device upload downcasts to f32 (Collection._device_state)
        dt = qz.host_dtype(quantization)
        self.codes = np.zeros((0, qz.device_width(quantization, dims)),
                              dtype=dt)
        self.norms = np.zeros((0,), dtype=np.float32)
        self.ids = np.zeros((0,), dtype=np.uint64)
        self.valid = np.zeros((0,), dtype=bool)
        self.hashes = np.zeros((0, hash_words), dtype=np.uint32)
        # resident list of bytes, or the lazy span-log view (out-of-core
        # metadata mode): all readers index it the same way either way
        self.metadata_resident = metadata_fetch is None
        self.metadata = [] if metadata_fetch is None \
            else _LazyMetadata(self, metadata_fetch)
        # REST raw-splice memo: meta_ok[row] means "the bytes CURRENTLY in
        # metadata[row] were validated as JSON".  Every metadata write
        # resets the row's bit (put/put_many/set_metadata) — the read-side
        # identity check alone is NOT enough, because a result assembled
        # AFTER a rewrite carries the new bytes and would pass the
        # identity test against a stale True (review finding r5).  The
        # identity check still guards the narrower race of a rewrite
        # BETWEEN validation and memoization.
        self.meta_ok = np.zeros((0,), dtype=bool)
        # incremental-upload support: rows touched since the last device sync
        self._dirty_rows: set[int] = set()
        self.dirty_all = True

    # -- capacity ----------------------------------------------------------

    def _grow(self, min_capacity: int) -> None:
        # ONE sizing policy, shared with the capacity preflight so the
        # two can never drift (capacity.grown_capacity holds the
        # doubling / 25%-linear / 8192-align logic)
        from .capacity import grown_capacity
        new_cap = grown_capacity(self.capacity, min_capacity)
        if new_cap == self.capacity:
            return

        def pad(a: np.ndarray) -> np.ndarray:
            out = np.zeros((new_cap,) + a.shape[1:], dtype=a.dtype)
            out[: a.shape[0]] = a
            return out

        self.codes = pad(self.codes)
        self.norms = pad(self.norms)
        self.ids = pad(self.ids)
        self.valid = pad(self.valid)
        self.hashes = pad(self.hashes)
        self.meta_ok = pad(self.meta_ok)
        self.metadata.extend([None] * (new_cap - self.capacity))
        self.capacity = new_cap
        self.dirty_all = True  # shapes changed; device must re-place fully

    # -- mutation ----------------------------------------------------------

    def put(self, doc_id: int, vector: np.ndarray, metadata: bytes,
            codes: np.ndarray | None = None,
            norm: float | None = None) -> int:
        """Insert or replace the row for doc_id; returns the row index.
        `codes`/`norm` accept the precomputed host representation so
        callers can quantize OUTSIDE their lock (Collection.add_document)."""
        row = self._row_of.get(doc_id)
        if row is None:
            if self._free:
                row = self._free.pop()
            else:
                if self.size >= self.capacity:
                    self._grow(self.size + 1)
                row = self.size
                self.size += 1
            self._row_of[doc_id] = row
        dev = codes if codes is not None else \
            qz.codes_to_host_repr(vector, self.quantization)[0]
        self.codes[row] = dev
        self.norms[row] = norm if norm is not None else \
            dist_ops.db_row_stats(dev[None, :], self.quantization,
                                  self.dims)[0]
        self.ids[row] = doc_id
        self.valid[row] = True
        self.metadata[row] = metadata
        self.meta_ok[row] = False  # memo invalid until re-validated
        self._dirty_rows.add(row)
        self.version += 1
        return row

    def put_many(self, doc_ids: np.ndarray, vectors: np.ndarray,
                 metadatas: list[bytes],
                 codes: np.ndarray | None = None,
                 norms: np.ndarray | None = None) -> np.ndarray:
        """Vectorized bulk insert/replace; returns the row indices.
        `codes`/`norms` accept the precomputed host representation
        (Collection.add_documents quantizes outside its lock)."""
        n = len(doc_ids)
        rows = None
        if not self._row_of and not self._free:
            # fresh store (reopen replay / first bulk load): build the
            # id->row mapping in one C pass — the per-row dict loop was
            # ~18s of a 10M reopen.  Falls back when the batch contains
            # duplicate ids (the loop's later-wins row reuse applies).
            mapping = dict(zip(map(int, doc_ids),
                               range(self.size, self.size + n)))
            if len(mapping) == n:
                if self.size + n > self.capacity:
                    self._grow(self.size + n)
                rows = np.arange(self.size, self.size + n, dtype=np.int64)
                self._row_of.update(mapping)
                self.size += n
        if rows is None:
            rows = np.empty(n, dtype=np.int64)
            for i, doc_id in enumerate(doc_ids):
                doc_id = int(doc_id)
                row = self._row_of.get(doc_id)
                if row is None:
                    if self._free:
                        row = self._free.pop()
                    else:
                        if self.size >= self.capacity:
                            self._grow(self.size + max(1, n - i))
                        row = self.size
                        self.size += 1
                    self._row_of[doc_id] = row
                rows[i] = row
        dev = codes if codes is not None else \
            qz.codes_to_host_repr(vectors, self.quantization)
        self.codes[rows] = dev
        self.norms[rows] = norms if norms is not None else \
            dist_ops.db_row_stats(dev, self.quantization, self.dims)
        self.ids[rows] = np.asarray(doc_ids, dtype=np.uint64)
        self.valid[rows] = True
        for i, row in enumerate(rows):
            self.metadata[row] = metadatas[i]
        # memo reset must FOLLOW the bytes install (as in put/set_metadata):
        # reset-first reopens the stale-True race — a reader that validated
        # the old bytes after our reset would memoize True, its identity
        # re-check would still pass (bytes not yet swapped), and the new
        # unvalidated bytes would then be spliced verbatim by the REST layer
        self.meta_ok[rows] = False
        self._dirty_rows.update(int(r) for r in rows)
        self.version += 1
        return rows

    def set_metadata(self, doc_id: int, metadata: bytes) -> None:
        row = self._row_of[doc_id]
        self.metadata[row] = metadata
        self.meta_ok[row] = False  # memo invalid until re-validated
        self.version += 1

    def set_hash(self, row: int, code_words: np.ndarray) -> None:
        self.hashes[row] = code_words
        self._dirty_rows.add(int(row))

    def remove(self, doc_id: int) -> None:
        row = self._row_of.pop(doc_id)
        self.valid[row] = False
        self.metadata[row] = None
        # while a search snapshot lease is active the row is quarantined:
        # an in-flight result assembly (dispatch/fetch lock split,
        # Collection.search_many_async) may still map device indices to
        # this row, and reusing it for a new document would pair that
        # document's id/metadata with the old document's distance
        (self._free_pending if self._leases else self._free).append(row)
        self._dirty_rows.add(row)
        self.version += 1

    # -- snapshot leases -----------------------------------------------------
    # Callers that assemble results AFTER releasing the collection lock hold
    # a lease across the device round trip; rows freed meanwhile only become
    # reusable once the last lease ends.  Guarded by the collection lock.

    def begin_lease(self) -> None:
        self._leases += 1

    def end_lease(self) -> None:
        self._leases -= 1
        if self._leases == 0 and self._free_pending:
            self._free.extend(self._free_pending)
            self._free_pending.clear()

    # -- access ------------------------------------------------------------

    def __contains__(self, doc_id: int) -> bool:
        return doc_id in self._row_of

    def __len__(self) -> int:
        return len(self._row_of)

    def row(self, doc_id: int) -> int:
        return self._row_of[doc_id]

    def get_metadata(self, doc_id: int) -> bytes:
        md = self.metadata[self._row_of[doc_id]]
        assert md is not None
        return md

    def get_vector(self, doc_id: int) -> np.ndarray:
        """Dequantized vector as the device sees it (f64 for 4..32-bit is
        exact; for 64-bit use the span log for full f64 precision)."""
        row = self._row_of[doc_id]
        return qz.device_repr_to_float(self.codes[row][None, :],
                                       self.quantization, self.dims)[0]

    def doc_ids(self) -> list[int]:
        return list(self._row_of.keys())

    def live_rows(self) -> np.ndarray:
        return np.flatnonzero(self.valid[: self.size])

    def drain_dirty(self):
        """Rows touched since the last device sync, or None if a full
        re-upload is required (capacity change / first sync). Clears state."""
        if self.dirty_all:
            self.dirty_all = False
            self._dirty_rows.clear()
            return None
        rows = np.fromiter(self._dirty_rows, dtype=np.int64,
                           count=len(self._dirty_rows))
        self._dirty_rows.clear()
        return np.sort(rows)
