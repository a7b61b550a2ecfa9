"""Collection — the core DB object.

API parity with the reference's Collection (/root/reference/collection.go):
AddDocument / GetDocument / UpdateDocument / RemoveDocument / Search /
GetAllIDs / ComputeStats / GetDocumentCount / Close, with the same option set
(name, distance_method, dimension_count, quantization — collection.go:31-49)
and the same search modes (collection.go:569-711):

  * K == 0 and Radius == 0  -> paginated ID-ordered listing (lexicographic on
    the decimal ID string — reference quirk, spanfile.go:541-547)
  * precision "exact"       -> exhaustive fused scan in full f32 precision,
                               PercentSearched == 100
  * precision "high"        -> TPU-native extension: exhaustive segment-min
                               scan (bf16x2 MXU surface + HIGHEST-precision
                               rerank of the winning segments,
                               ops/pallas_scan.py) — EXACT f32 top-k,
                               provably: selection is tie-aware and
                               escalates its segment margin whenever bf16
                               minima collisions could hide a winner
                               (fused_scan_topk EXACTNESS note) — at ~5x
                               medium's batched throughput,
                               PercentSearched == 100
  * precision "medium"      -> sketch-prefiltered scan (index/hamming.py);
                               fastest for single queries

TPU-native structure: documents are durable in a host span log
(core/storage.py) and live columnar in numpy arrays (core/columns.py) that
mirror the device layout; searches upload the columns once per mutation
generation and run entirely on device as matmul + top-k.  The reference's
per-candidate disk-read-and-dequantize loop (collection.go:583-596) does not
exist here — distance math never leaves the chip.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import threading
import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..index import hamming
from ..ops import distance as dist_ops
from . import capacity as capacity_mod
from ..ops import quantize as qz
from ..utils.locks import FairRLock
from ..utils.rng import MyRandom, my_random

EUCLIDEAN = 0
COSINE = 1

_METRIC_NAME = {EUCLIDEAN: "euclidean", COSINE: "cosine"}
_METRIC_ID = {v: k for k, v in _METRIC_NAME.items()}

FilterFn = Callable[[int, bytes], bool]

# Minimum live docs before the sketch index calibrates/activates; below this a
# "medium" search just scans (the reference's trees also degenerate to a scan
# below the split threshold, lshtree.go:79-133).
MIN_INDEX_SIZE = 256
# Batch-size crossover between the sketch index and the exhaustive
# segment-min scan for precision="medium" (r3 analysis, BASELINE.md): the
# scan reads the codes ONCE for the whole batch and streams one bf16
# surface, while the index pays an int32 (Q, N) sketch surface (2x the
# scan's surface bytes) PLUS budget*D gathered bytes per query — so the
# index wins only at small batches.  Above Q ~= N/(budget*F) medium routes
# to the scan (exact results as a bonus).  F=16 matches the measured
# crossovers on v5e (ANN ties the scan at batch 64/budget 512 and loses
# at batch 64/budget 2048 — BASELINE.md round-3 table).
ANN_BATCH_CROSSOVER = 16
DEFAULT_SEARCH_BUDGET = 2048
# below this many stored elements (rows x dims) exhaustive searches run on
# the host: a BLAS scan beats the fixed per-RPC device round-trip
HOST_SCAN_MAX_ELEMS = 1 << 21


@dataclasses.dataclass
class CollectionOptions:
    """Mirrors reference CollectionOptions (collection.go:31-49)."""
    name: str
    distance_method: int = EUCLIDEAN
    dimension_count: int = 0
    quantization: int = 64
    create_and_overwrite: bool = False
    # TPU-native knobs (not in reference):
    index_tables: int = hamming.DEFAULT_TABLES
    index_bits_per_table: int = hamming.DEFAULT_BITS_PER_TABLE
    search_budget: int = DEFAULT_SEARCH_BUDGET
    index_seed: int = 0  # 0 = derive from global RNG at creation
    # out-of-core metadata: keep no metadata bytes resident — reads fetch
    # from the span log on demand (the reference's mmap envelope for
    # metadata-heavy collections, spanfile.go:241-262).  Codes stay
    # resident (search is HBM-bound by design, SURVEY.md §7).
    metadata_on_demand: bool = False

    def to_json(self) -> bytes:
        return json.dumps({
            "name": os.path.basename(self.name),
            "distance_method": self.distance_method,
            "dimension_count": self.dimension_count,
            "quantization": self.quantization,
            "index_tables": self.index_tables,
            "index_bits_per_table": self.index_bits_per_table,
            "search_budget": self.search_budget,
            "index_seed": self.index_seed,
            "metadata_on_demand": self.metadata_on_demand,
        }).encode()

    @staticmethod
    def merge_from_json(opts: "CollectionOptions", raw: bytes) -> "CollectionOptions":
        """Stored options override caller options (collection.go:241-252)."""
        d = json.loads(raw)
        out = dataclasses.replace(
            opts,
            distance_method=d.get("distance_method", opts.distance_method),
            dimension_count=d.get("dimension_count", opts.dimension_count),
            quantization=d.get("quantization", opts.quantization),
        )
        for f in ("index_tables", "index_bits_per_table", "search_budget",
                  "index_seed", "metadata_on_demand"):
            if f in d:
                setattr(out, f, d[f])
        return out


@dataclasses.dataclass
class Document:
    id: int
    vector: np.ndarray
    metadata: bytes


@dataclasses.dataclass
class SearchArgs:
    vector: Optional[Sequence[float]] = None
    filter: Optional[FilterFn] = None
    # a query-language string instead of a callable: enables the collection
    # to cache the boolean mask across searches until the data mutates
    filter_query: Optional[str] = None
    k: int = 0
    radius: float = 0.0
    offset: int = 0
    limit: int = 0
    precision: str = ""  # "" -> "medium" (collection.go:573-575)


@dataclasses.dataclass
class SearchResult:
    id: int
    metadata: bytes
    distance: float


@dataclasses.dataclass
class SearchResults:
    results: list[SearchResult]
    percent_searched: float
    search_time_ms: float = 0.0


@dataclasses.dataclass
class CollectionStats:
    document_count: int
    dimension_count: int
    quantization: int
    distance_method: str
    storage_size: int
    average_distance: float

    def to_dict(self) -> dict:
        return {
            "document_count": self.document_count,
            "dimension_count": self.dimension_count,
            "quantization": self.quantization,
            "distance_method": self.distance_method,
            "storage_size": self.storage_size,
            "average_distance": self.average_distance,
        }


def validate_options(options: CollectionOptions) -> None:
    """Reject invalid options BEFORE any file is created or written.

    A bad create must never leave a poisoned .dat behind: stored options
    override caller options on reopen (collection.go:241-252), so persisting
    a zero dimension_count or out-of-range index knobs would make every
    retry and every server restart fail (ADVICE r1, high)."""
    if options.dimension_count <= 0:
        raise ValueError("dimension_count must be positive")
    qz._check_bits(options.quantization)
    if options.distance_method not in _METRIC_NAME:
        raise ValueError(f"invalid distance_method {options.distance_method}")
    hamming.check_index_shape(options.index_tables,
                              options.index_bits_per_table)
    if options.search_budget < 1:
        raise ValueError("search_budget must be >= 1")


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _scatter_apply(codes, norms, valid, hashes, idx, c_new, n_new, v_new,
                   h_new):
    """Donated in-place scatter of a dirty-row batch into the device
    columns.  Donation is the point: an eager .at[].set COPIES the whole
    operand, which at 10M rows is ~4GB of HBM traffic per mutation batch —
    measured to serialize config5's streaming phase behind the collection
    lock.  With donation XLA updates the resident buffers in place."""
    return (codes.at[idx].set(c_new, mode="drop"),
            norms.at[idx].set(n_new, mode="drop"),
            valid.at[idx].set(v_new, mode="drop"),
            hashes.at[idx].set(h_new, mode="drop"))


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _scatter_apply_lean(norms, valid, hashes, idx, n_new, v_new, h_new):
    """_scatter_apply minus the matmul-layout codes buffer (lean
    placements: the code payload scatters into slab+ilv instead)."""
    return (norms.at[idx].set(n_new, mode="drop"),
            valid.at[idx].set(v_new, mode="drop"),
            hashes.at[idx].set(h_new, mode="drop"))


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_slab_apply(slab, idx, c_new):
    """Donated scatter of a dirty-row batch into the tile-aligned lane
    slab (ops/pallas_scan.make_lane_slab).  Row r occupies lane rows
    [r*Lr, (r+1)*Lr) of the (nseg*T, 128) flattening — the slab layout
    was chosen so this identity holds (s*T + (r%seg)*Lr + j == r*Lr + j),
    making the update a plain row scatter.  Out-of-range pad indices
    (idx == capacity) land past the end and are dropped."""
    nseg, t, lane = slab.shape
    lr = c_new.shape[1] // lane
    flat = slab.reshape(nseg * t, lane)
    lanes = (idx[:, None] * lr +
             jnp.arange(lr, dtype=idx.dtype)[None, :]).reshape(-1)
    upd = c_new.astype(slab.dtype).reshape(-1, lane)
    return flat.at[lanes].set(upd, mode="drop").reshape(nseg, t, lane)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("seg",))
def _scatter_ilv_apply(ilv, idx, c_new, seg: Optional[int] = None):
    """Donated scatter into the segment-interleaved TRANSPOSED (D, N)
    matmul operand (ops/pallas_scan.make_ilv_codes): original row
    r = b*blk + s*seg + m lives at column b*blk + m*128 + s (blk =
    128*seg).  Pad indices (idx == capacity, which is blk-aligned whenever
    an ilv operand exists) map past the end and are dropped."""
    if seg is None:  # resolved at trace time; must match the build seg
        from ..ops.pallas_scan import DEFAULT_SEG as seg
    blk = 128 * seg
    o = idx % blk
    p = (idx - o) + (o % seg) * 128 + o // seg
    return ilv.at[:, p].set(jnp.swapaxes(c_new, 0, 1).astype(ilv.dtype),
                            mode="drop")


@functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                   static_argnames=("bits", "dims", "seg"))
def _lean_chunk_update(slab, ilv, hashes, chunk, planes, offsets, start,
                       *, bits: int, dims: int, seg: int):
    """One streamed lean-placement step: write chunk's slab segments, ilv
    columns (the permutation is per-4096-row block, so block-aligned
    chunks map to contiguous column ranges), and sketch hashes.  Donated
    buffers keep the peak at slab + ilv + chunk."""
    from ..index.hamming import _encode_codes_jit
    from ..ops import pallas_scan
    sl = pallas_scan.make_lane_slab(chunk, seg)
    slab = jax.lax.dynamic_update_slice(slab, sl, (start // seg, 0, 0))
    iv = pallas_scan.make_ilv_codes(chunk, seg).astype(ilv.dtype)
    ilv = jax.lax.dynamic_update_slice(ilv, iv, (0, start))
    h = _encode_codes_jit(chunk, planes, offsets, bits=bits, dims=dims)
    hashes = jax.lax.dynamic_update_slice(hashes, h, (start, 0))
    return slab, ilv, hashes


# Placement strategy threshold (r5, VERDICT r4 item 2).  Below this many
# code bytes the device keeps THREE code-sized buffers — matmul-layout
# codes, lane slab, ilv operand — so every consumer has its fastest
# layout resident (the r3.7/r4 headline configuration).  ABOVE it (the
# 10M-scale regime where 3x codes + the relayout transient overflowed
# v5e and the old gate dropped the ilv kernel entirely), placement goes
# LEAN: the matmul-layout buffer is dropped, every production consumer is
# served from slab+ilv (fused surface; lane rerank; slab-based ANN
# rerank), the placement relayout streams in chunks so the peak is
# 2x codes + chunk, and the rare codes-needing dispatches (exact-mode XLA
# surface, Q > _ILV_MAX_Q, non-fused large-k) reconstruct the layout from
# the slab per dispatch (pallas_scan.codes_from_slab).
_LEAN_CODE_BYTES = 2 << 30
# rows per streamed lean-placement chunk: a multiple of the ilv block
# (128*seg = 4096) and the slab segment; ~200 MB of upload at 384-d 8-bit
_LEAN_CHUNK_ROWS = 1 << 19


import itertools

_collection_tokens = itertools.count(1)


class Collection:
    def __init__(self, options: CollectionOptions, rng: Optional[MyRandom] = None):
        from .storage import SpanLog  # local import to keep module load light

        # process-unique identity token for batch grouping: id(coll) can be
        # REUSED by a new collection after this one is garbage-collected,
        # which would let a stale batch key alias across collections
        # (server/batcher.py keys on this instead)
        self.batch_token = next(_collection_tokens)

        if options.quantization == 0:
            options.quantization = 64
        self._rng = rng if rng is not None else my_random.fork()

        if options.create_and_overwrite and os.path.exists(options.name):
            os.remove(options.name)
        existed = os.path.exists(options.name) and os.path.getsize(options.name) > 0
        if not existed:
            # validate before the file exists; nothing to clean up on raise
            validate_options(options)
        self.spanlog = SpanLog(options.name)
        try:
            if existed and "" in self.spanlog:
                raw = self.spanlog.read("")[0]
                options = CollectionOptions.merge_from_json(options, raw)
            else:
                if options.index_seed == 0:
                    options.index_seed = int(self._rng.integers(1, 2**31 - 1))
                self.spanlog.write("", [options.to_json()])
            self.options = options
            # merged (stored-over-caller) options can still be bad when the
            # file pre-existed or was written by an older build — check them
            # too, but leave a pre-existing file untouched
            validate_options(options)

            # fair FIFO lock: CPython's RLock lets a tight mutation loop
            # starve concurrent searches indefinitely (utils/locks.py)
            self._lock = FairRLock()
            self.index = hamming.SignHashIndex(
                options.dimension_count, _METRIC_NAME[options.distance_method],
                MyRandom(options.index_seed), options.index_tables,
                options.index_bits_per_table)
            from .columns import ColumnStore
            # out-of-core metadata: reads fetch stream 0 from the span log
            # via bounded preads (never decoding the vector stream); every
            # mutation path writes the log before the columns, so the log
            # is always current when a read could observe the row
            fetch = (lambda did: self.spanlog.read_stream0(str(did))) \
                if options.metadata_on_demand else None
            self.columns = ColumnStore(options.dimension_count,
                                       options.quantization,
                                       hash_words=self.index.words,
                                       metadata_fetch=fetch)
        except Exception:
            self.spanlog.close()
            if not existed:
                try:
                    os.remove(options.name)
                except OSError:
                    pass
            raise
        self._dev_version = -1
        self._dev: dict | None = None
        self._hashes_stale = False
        self._closed = False
        self._mesh = None
        self._filter_cache: dict = {}
        # Adaptive provable-selection margin: corpora whose distances
        # concentrate (e.g. iid high-D vectors — the whole distribution
        # spans a handful of bf16 bins) defeat the default tie margin on
        # EVERY batch, forcing the same 32 -> 80 -> 176 escalation ladder
        # per search: 3 full scans + 3 synchronized fetches + one compile
        # per new margin shape (measured 15x slowdown on the 1M x 768 iid
        # config-4 corpus).  Remember the margin that proved complete and
        # start there — clustered corpora stay at the default, concentrated
        # ones pay the ladder once per collection instead of per query.
        self._seg_margin_hint: Optional[int] = None
        # consecutive small-batch structural failures (see _note_margin)
        self._hint_fail_streak = 0
        # list-mode pagination cache: (columns.version, ids in lexicographic
        # decimal-string order); _list_sort_count counts rebuilds (test pin)
        self._sorted_ids_cache: tuple[int, list[int]] | None = None
        self._list_sort_count = 0
        from ..query.columnar import ColumnarFilterEngine
        self._columnar_filter = ColumnarFilterEngine()
        # observability: device placements by kind (tests assert streaming
        # mutations ride the scatter path instead of full re-uploads)
        self.sync_stats = {"full": 0, "scatter": 0}

        if existed:
            self._replay()

    # -- properties --------------------------------------------------------

    @property
    def dimension_count(self) -> int:
        return self.options.dimension_count

    @property
    def quantization(self) -> int:
        return self.options.quantization

    @property
    def metric(self) -> str:
        return _METRIC_NAME[self.options.distance_method]

    def get_options(self) -> CollectionOptions:
        """GetOptions parity (collection.go:317-324)."""
        return self.options

    # -- open/replay -------------------------------------------------------

    def _replay(self) -> None:
        """Rebuild columnar store + index from the span log (stack 3.1 analog:
        collection.go:297-311 — the index is derived data, never persisted)."""
        resident = self.columns.metadata_resident
        bulk = self.spanlog.bulk_rows(want_metas=resident)
        if bulk is not None:
            rec_ids, metas, packed = bulk
            ids = [int(r) for r in rec_ids]
        else:  # mixed record shapes: per-record decode
            ids, blobs, metas = [], [], []
            for rec_id, streams in self.spanlog.iterate():
                if rec_id == "":
                    continue
                ids.append(int(rec_id))
                if resident:
                    metas.append(bytes(streams[0]))
                blobs.append(np.frombuffer(streams[1], dtype=np.uint8))
            packed = np.stack(blobs) if ids else None
        if not resident:
            metas = [b""] * len(ids)  # lazy column ignores writes
        if ids:
            # a reopen that cannot fit is the "create" side of the capacity
            # preflight: fail with the actionable error, not an OOM kill
            capacity_mod.preflight(self, len(ids),
                                   sum(len(m) for m in metas))
            # storage bytes -> host codes directly (byte-level transform;
            # the old unpack->requantize f64 round trip made reopen 2.3x
            # slower than the initial load)
            codes = qz.packed_to_host_repr(packed, self.dimension_count,
                                           self.quantization, consume=True)
            norms = dist_ops.db_row_stats(codes, self.quantization,
                                          self.dimension_count)
            self.columns.put_many(np.asarray(ids, dtype=np.uint64), None,
                                  metas, codes=codes, norms=norms)
        self._rebuild_index()

    def _rebuild_index(self) -> None:
        """(Re)calibrate the sketch planes; the sketches themselves are
        recomputed on device from the uploaded codes at the next sync."""
        n = len(self.columns)
        if n == 0:
            return
        live = self.columns.live_rows()
        if not self.index.calibrated and n >= MIN_INDEX_SIZE:
            sample_rows = live if len(live) <= 1024 else \
                self._rng.choice(live, size=1024, replace=False)
            sample = qz.device_repr_to_float(self.columns.codes[sample_rows],
                                             self.quantization,
                                             self.dimension_count)
            self.index.calibrate(sample)
        self.columns.dirty_all = True  # sketches regenerate on device
        self.columns.version += 1
        self._hashes_stale = False

    # -- mutation ----------------------------------------------------------

    def add_document(self, doc_id: int, vector: Sequence[float],
                     metadata: bytes) -> None:
        vector = np.asarray(vector, dtype=np.float64)
        if vector.shape != (self.dimension_count,):
            raise ValueError(
                f"vector size {vector.shape} does not match collection "
                f"dimension count {self.dimension_count}")
        # host prep (quantize/pack/sketch) is pure — keep it OFF the lock
        # so concurrent searches dispatch during ingest preprocessing
        packed_rows, codes, norms = dist_ops.ingest_reprs(
            vector, self.quantization)
        packed = packed_rows[0].tobytes()
        hcode = None
        if self.index.calibrated:  # planes are immutable once calibrated
            seen = qz.device_repr_to_float(codes, self.quantization,
                                           self.dimension_count)
            hcode = self.index.encode_np(np.float32(seen))[0]
        with self._lock:
            n_new = capacity_mod.new_rows_needed(self.columns, [doc_id])
            if n_new:
                capacity_mod.preflight(self, n_new, len(metadata))
            self.spanlog.write(str(doc_id), [bytes(metadata), packed])
            row = self.columns.put(int(doc_id), vector, bytes(metadata),
                                   codes=codes[0], norm=float(norms[0]))
            if hcode is not None:
                self.columns.set_hash(row, hcode)
            elif self.index.calibrated:
                # calibration raced in between: encode under the lock
                seen = qz.device_repr_to_float(
                    self.columns.codes[row][None, :], self.quantization,
                    self.dimension_count)
                self.columns.set_hash(row, self.index.encode_np(
                    np.float32(seen))[0])
            else:
                self._hashes_stale = True

    def add_documents(self, doc_ids: Sequence[int], vectors: np.ndarray,
                      metadatas: Sequence[bytes]) -> None:
        """Vectorized bulk insert — the TPU-native ingest path (packing,
        column writes, and sketch encoding all happen batched; the pure
        quantize/pack/sketch host work runs OUTSIDE the collection lock so
        streaming ingest overlaps with in-flight searches)."""
        vectors = np.atleast_2d(np.asarray(vectors, dtype=np.float64))
        n = vectors.shape[0]
        if vectors.shape[1] != self.dimension_count:
            raise ValueError(
                f"vector size {vectors.shape[1]} does not match collection "
                f"dimension count {self.dimension_count}")
        if not (len(doc_ids) == n == len(metadatas)):
            raise ValueError("ids/vectors/metadatas length mismatch")
        packed, codes, norms = dist_ops.ingest_reprs(vectors,
                                                     self.quantization)
        ids_str = [str(int(i)) for i in doc_ids]
        metas = [bytes(m) for m in metadatas]
        hcodes = None
        if n <= 1024 and self.index.calibrated:
            # small batch: host-encode so the scatter sync stays cheap
            seen = qz.device_repr_to_float(codes, self.quantization,
                                           self.dimension_count)
            hcodes = self.index.encode_np(np.float32(seen))
        with self._lock:
            # fail a too-big ingest cleanly BEFORE any log write (the
            # reference's mmap never hits this; our resident columns do —
            # core/capacity.py); only genuinely NEW rows count as growth
            capacity_mod.preflight(
                self, capacity_mod.new_rows_needed(self.columns, doc_ids),
                sum(len(m) for m in metas))
            self.spanlog.write_many_columns(ids_str, metas, packed)
            rows = self.columns.put_many(np.asarray(doc_ids, dtype=np.uint64),
                                         vectors, metas, codes=codes,
                                         norms=norms)
            if hcodes is not None:
                self.columns.hashes[rows] = hcodes
            elif n <= 1024 and self.index.calibrated:
                # calibration raced in between: encode under the lock
                seen = qz.device_repr_to_float(self.columns.codes[rows],
                                               self.quantization,
                                               self.dimension_count)
                self.columns.hashes[rows] = self.index.encode_np(
                    np.float32(seen))
            else:
                # bulk: sketches are recomputed ON DEVICE from the uploaded
                # codes at the next sync (device hashes are authoritative;
                # a float copy of the batch never crosses the host<->device
                # link in either direction)
                self.columns.dirty_all = True
                if not self.index.calibrated:
                    self._hashes_stale = True

    def add_documents_packed(self, doc_ids: Sequence[int],
                             packed: np.ndarray,
                             metadatas: Sequence[bytes]) -> None:
        """Bulk insert from PACKED storage bytes (the span-log stream-1
        representation: big-endian codes, high-nibble-first 4-bit) — the
        fast-restore path for compact exports (tools/dump.py): no float
        parsing, no requantization, bit-identical storage by construction.
        Mirrors _replay's byte-level transform."""
        packed = np.ascontiguousarray(np.atleast_2d(packed), dtype=np.uint8)
        n = packed.shape[0]
        want = qz.vector_byte_size(self.quantization, self.dimension_count)
        if packed.shape[1] != want:
            raise ValueError(
                f"packed rows are {packed.shape[1]} bytes; a "
                f"{self.dimension_count}-d {self.quantization}-bit "
                f"collection stores {want}")
        if not (len(doc_ids) == n == len(metadatas)):
            raise ValueError("ids/packed/metadatas length mismatch")
        codes = qz.packed_to_host_repr(packed, self.dimension_count,
                                       self.quantization)
        norms = dist_ops.db_row_stats(codes, self.quantization,
                                      self.dimension_count)
        ids_str = [str(int(i)) for i in doc_ids]
        metas = [bytes(m) for m in metadatas]
        with self._lock:
            capacity_mod.preflight(
                self, capacity_mod.new_rows_needed(self.columns, doc_ids),
                sum(len(m) for m in metas))
            self.spanlog.write_many_columns(ids_str, metas, packed)
            self.columns.put_many(np.asarray(doc_ids, dtype=np.uint64),
                                  None, metas, codes=codes, norms=norms)
            # sketches regenerate on device from the uploaded codes
            self.columns.dirty_all = True
            if not self.index.calibrated:
                self._hashes_stale = True

    def get_document(self, doc_id: int) -> Document:
        with self._lock:
            if int(doc_id) not in self.columns:
                raise KeyError(doc_id)
            streams = self.spanlog.read(str(doc_id))
            vector = qz.unpack_vector(streams[1], self.dimension_count,
                                      self.quantization)
            return Document(int(doc_id), vector, bytes(streams[0]))

    def update_document(self, doc_id: int, metadata: bytes) -> None:
        """Metadata-only update; the vector (and index entry) is unchanged
        (collection.go:490-509)."""
        with self._lock:
            if int(doc_id) not in self.columns:
                raise KeyError(doc_id)
            streams = self.spanlog.read(str(doc_id))
            self.spanlog.write(str(doc_id), [bytes(metadata), streams[1]])
            self.columns.set_metadata(int(doc_id), bytes(metadata))

    def remove_document(self, doc_id: int) -> None:
        with self._lock:
            if int(doc_id) not in self.columns:
                raise KeyError(doc_id)
            self.spanlog.remove(str(doc_id))
            self.columns.remove(int(doc_id))

    # -- device cache ------------------------------------------------------

    def use_mesh(self, mesh) -> None:
        """Shard this collection's columns over a jax.sharding.Mesh with a
        'data' axis (vector axis N sharded per-device; searches run as
        shard_map kernels with collective top-k merges — parallel/search.py).
        Pass None to return to single-device placement."""
        if mesh is not None:
            if "data" not in mesh.shape:
                raise ValueError("mesh must have a 'data' axis")
            if mesh.shape.get("feature", 1) != 1:
                raise ValueError(
                    "collection-integrated meshes shard only the N axis; "
                    "use parallel.search directly for feature sharding")
        self._mesh = mesh
        self._dev = None
        self._dev_version = -1

    def _device_state(self) -> dict:
        """Sync columns to HBM if the mutation generation changed.

        Streaming-ingest fast path: when capacity is unchanged and only a
        bounded set of rows mutated since the last sync, apply them as
        on-device scatter updates instead of re-uploading whole columns —
        inserts/deletes interleaved with queries then cost O(dirty) transfer
        per batch boundary (SURVEY.md §2.2, concurrent-workload row).
        """
        if self._hashes_stale and len(self.columns) >= MIN_INDEX_SIZE:
            self._rebuild_index()
        if self._dev is not None and self._dev_version != self.columns.version \
                and self._dev["valid"].shape[0] == self.columns.capacity:
            rows = self.columns.drain_dirty()
            if rows is not None and len(rows) <= max(
                    1024, self.columns.capacity // 8):
                if len(rows):
                    self._dev = self._scatter_rows(rows)
                self.sync_stats["scatter"] += 1
                self._dev_version = self.columns.version
                return self._dev
            # too many dirty rows: fall through to a full re-placement
        if self._dev is None or self._dev_version != self.columns.version:
            self.columns.dirty_all = False
            self.columns._dirty_rows.clear()
            self.sync_stats["full"] += 1
            # 64-bit columns are f64 host-side (exact-rerank source); the
            # device runs f32 — downcast at the upload boundary
            codes_np = self.columns.codes
            if self.quantization == 64:
                codes_np = np.asarray(codes_np, dtype=np.float32)
            if self._mesh is not None:
                import jax
                from ..parallel import mesh as mesh_mod
                row = mesh_mod.row_sharding(self._mesh)
                row1 = mesh_mod.row_only_sharding(self._mesh)
                codes_dev = jax.device_put(codes_np, row)
                self._dev = {
                    "codes": codes_dev,
                    "norms": jax.device_put(self.columns.norms, row1),
                    "valid": jax.device_put(self.columns.valid, row1),
                    # sketches derive from the uploaded codes ON DEVICE —
                    # GSPMD keeps the output row-sharded like its input;
                    # pin the exact sharding so later scatter updates
                    # compare equal and skip the reshard guard
                    "hashes": jax.device_put(self.index.encode_codes_device(
                        codes_dev, self.quantization), row),
                }
                # tile-aligned lane slab per shard for the fused mesh
                # scan's rerank gathers (parallel/search.sharded_lane_slab)
                # — TPU only; the lane contraction loses to the BLAS
                # einsum on CPU meshes
                from ..ops import pallas_scan
                from ..parallel import search as psearch
                if pallas_scan.supported() and psearch.lane_ok_mesh(
                        self._mesh, self.quantization,
                        self.options.dimension_count,
                        self.columns.capacity):
                    self._dev["slab"] = psearch.sharded_lane_slab(
                        self._mesh, codes_dev)
                # per-shard ilv operand for the r3.7 fused surface (same
                # probed-widths gate as the single-device path).  The
                # memory gate is PER-SHARD: each device holds only its own
                # rows' codes/slab/ilv, and sharded_ilv_codes relayouts
                # inside shard_map, so the transient is per-shard too — a
                # 10M collection over 8 data shards (~480 MB/device) stays
                # on the fused kernel where the single-device path must go
                # lean.  (Collection meshes pin feature=1, use_mesh above.)
                per_shard_bytes = (codes_dev.size *
                                   codes_dev.dtype.itemsize
                                   ) // self._mesh.shape["data"]
                if pallas_scan.supported() and psearch.ilv_ok_mesh(
                        self._mesh, self.quantization,
                        self.columns.capacity) and \
                        per_shard_bytes <= _LEAN_CODE_BYTES:
                    self._dev["ilv"] = psearch.sharded_ilv_codes(
                        self._mesh, codes_dev)
            elif self._lean_ok(codes_np):
                # LEAN placement (>2 GB codes): slab + ilv only, streamed
                # in chunks so the relayout peak is 2x codes + chunk — the
                # 10M-scale workload now runs the flagship fused kernel
                # (VERDICT r4 item 2; the old gate kept it on the slower
                # XLA surface because 3x codes + transient overflowed v5e)
                self._dev = self._place_lean(codes_np)
            else:
                codes_dev = jnp.asarray(codes_np)
                self._dev = {
                    "codes": codes_dev,
                    "norms": jnp.asarray(self.columns.norms),
                    "valid": jnp.asarray(self.columns.valid),
                    "hashes": self.index.encode_codes_device(
                        codes_dev, self.quantization),
                }
                # tile-aligned lane slab for the fused rerank's segment
                # gathers (~2.7x the 2-D-layout gather bandwidth on TPU,
                # ops/pallas_scan.make_lane_slab).  Derived ON DEVICE from
                # the uploaded codes — one HBM relayout pass instead of a
                # second 250MB/s host upload.  Costs one extra codes-sized
                # buffer; skipped off-TPU (the lane contraction is slower
                # than the BLAS einsum there) and for packed 4-bit.
                from ..ops import pallas_scan
                if pallas_scan.supported() and \
                        pallas_scan.lane_slab_supported(
                            self.quantization,
                            self.options.dimension_count):
                    self._dev["slab"] = pallas_scan.make_lane_slab(
                        codes_dev)
                # segment-interleaved matmul operand: the fused matmul+min
                # kernel runs the exhaustive surface without ever
                # materializing the (Q, N) transient (segment_min_scan_ilv)
                # — 18.3 -> 10.4 ms of the headline batch.  TPU-probed at
                # every width: 8-bit bf16 dot (r7_ilv_probe), 16-bit
                # exact hi/lo byte split (14.8 vs 30.7 ms XLA-HIGH, r7e),
                # 32/64-bit bf16x2 code split (13.8 vs 27.2 ms, r7h),
                # 4-bit dual-nibble (r7j — needed query deinterleave
                # outside the kernel + int32-widened shifts).
                # the byte cap only matters when LEAN couldn't engage
                # (e.g. packed 4-bit has no lane slab): there the third
                # buffer + transient must still not blow past the old
                # envelope
                if pallas_scan.supported() and \
                        pallas_scan.ilv_supported(self.columns.capacity) and \
                        codes_dev.size * codes_dev.dtype.itemsize <= \
                        _LEAN_CODE_BYTES:
                    self._dev["ilv"] = pallas_scan.make_ilv_codes(codes_dev)
            self._dev_version = self.columns.version
            # prewarm the scatter program (a no-op update): its first
            # compile costs ~0.7s at 10M rows and would otherwise land on
            # the first query after the first mutation
            self._dev = self._scatter_rows(np.empty(0, dtype=np.int64))
        return self._dev

    # tests flip this on (with pallas_scan.supported patched) to exercise
    # the fused-kernel paths through the whole Collection stack on CPU
    _kernel_interpret = False

    def _lean_ok(self, codes_np: np.ndarray) -> bool:
        """Whether this placement should go lean (see _LEAN_CODE_BYTES):
        big enough to matter, and both derived surfaces available so no
        production path needs the dropped matmul buffer resident."""
        from ..ops import pallas_scan
        itemsize = 4 if self.quantization == 64 else codes_np.dtype.itemsize
        return (pallas_scan.supported()
                and codes_np.size * itemsize > _LEAN_CODE_BYTES
                and pallas_scan.lane_slab_supported(
                    self.quantization, self.options.dimension_count)
                and pallas_scan.ilv_supported(self.columns.capacity))

    def _place_lean(self, codes_np: np.ndarray) -> dict:
        """Streamed lean placement: upload the codes in _LEAN_CHUNK_ROWS
        chunks and build the lane slab, ilv operand, and sketch hashes
        incrementally with donated updates — HBM peak is slab + ilv + one
        chunk (~2x codes + 200 MB) instead of the 3x-codes + full relayout
        transient that kept 10M collections off the fused kernel."""
        from ..ops import pallas_scan
        n, w = codes_np.shape
        seg = pallas_scan.DEFAULT_SEG
        lane = pallas_scan._LANE
        dt = jnp.float32 if self.quantization == 64 else codes_np.dtype
        slab = jnp.zeros((n // seg, (seg * w) // lane, lane), dtype=dt)
        ilv = jnp.zeros((w, n), dtype=dt)
        hashes = jnp.zeros((n, self.index.words), dtype=jnp.uint32)
        planes = jnp.asarray(self.index.planes)
        offsets = jnp.asarray(self.index.offsets)
        step = _LEAN_CHUNK_ROWS
        for a in range(0, n, step):
            chunk = np.asarray(codes_np[a:a + step])
            if self.quantization == 64:
                chunk = np.float32(chunk)
            slab, ilv, hashes = _lean_chunk_update(
                slab, ilv, hashes, jnp.asarray(chunk),
                planes, offsets, a,
                bits=self.quantization, dims=self.dimension_count,
                seg=seg)
        return {
            "norms": jnp.asarray(self.columns.norms),
            "valid": jnp.asarray(self.columns.valid),
            "hashes": hashes,
            "slab": slab,
            "ilv": ilv,
        }

    def _scatter_rows(self, rows: np.ndarray) -> dict:
        """Apply a bounded set of mutated rows to the device columns as
        scatter updates — O(dirty) transfer instead of a full re-upload,
        under both single-device and mesh placements (SURVEY.md §2.2,
        concurrent-workload row).

        The row-index set is padded to a bucket of at least 1024 rows
        (padding aims one past the end and is dropped by the scatter) so XLA
        compiles ONE scatter shape per capacity in the common case — on
        tunneled backends every new shape costs seconds of remote compile,
        which dominated config5's streaming medians when buckets tracked
        the dirty-count.  Under a mesh
        XLA keeps scatter output sharded like its operand; the device_put
        below is a no-op guard that reshards (device-to-device over ICI)
        only if that ever changes."""
        m = len(rows)
        bucket = max(1024, 1 << (m - 1).bit_length())
        bucket = min(bucket, max(1024, self.columns.capacity))
        idx_np = np.full(bucket, self.columns.capacity, dtype=np.int32)
        idx_np[:m] = rows
        idx = jnp.asarray(idx_np)

        def take(col):
            dt = col.dtype
            if dt == np.float64:  # 64-bit host columns: device runs f32
                dt = np.float32
            out = np.zeros((bucket,) + col.shape[1:], dtype=dt)
            out[:m] = col[rows]
            return jnp.asarray(out)

        dev = self._dev
        c_new = take(self.columns.codes)
        if "codes" in dev:
            out = _scatter_apply(dev["codes"], dev["norms"], dev["valid"],
                                 dev["hashes"], idx, c_new,
                                 take(self.columns.norms),
                                 take(self.columns.valid),
                                 take(self.columns.hashes))
            new = dict(zip(("codes", "norms", "valid", "hashes"), out))
        else:  # lean placement: no resident matmul-layout buffer
            out = _scatter_apply_lean(dev["norms"], dev["valid"],
                                      dev["hashes"], idx,
                                      take(self.columns.norms),
                                      take(self.columns.valid),
                                      take(self.columns.hashes))
            new = dict(zip(("norms", "valid", "hashes"), out))
        if self._mesh is not None:
            from ..parallel import mesh as mesh_mod
            want = {"codes": mesh_mod.row_sharding(self._mesh),
                    "norms": mesh_mod.row_only_sharding(self._mesh),
                    "valid": mesh_mod.row_only_sharding(self._mesh),
                    "hashes": mesh_mod.row_sharding(self._mesh)}
            new = {k: v if v.sharding == want[k]
                   else jax.device_put(v, want[k]) for k, v in new.items()}
        if "slab" in dev:
            if self._mesh is not None:
                # the mesh slab is feature-blocked per segment (opaque
                # layout, parallel/search.sharded_lane_slab): rebuild from
                # the scattered codes — one sharded relayout pass, cheaper
                # than a cross-layout scatter program
                from ..parallel import search as psearch
                new["slab"] = psearch.sharded_lane_slab(self._mesh,
                                                        new["codes"])
            else:
                new["slab"] = _scatter_slab_apply(dev["slab"], idx, c_new)
        if "ilv" in dev:
            if self._mesh is not None:
                # per-shard-permuted layout: rebuild from the scattered
                # codes (one sharded relayout pass, like the mesh slab)
                from ..parallel import search as psearch
                new["ilv"] = psearch.sharded_ilv_codes(self._mesh,
                                                       new["codes"])
            else:
                from ..ops import pallas_scan
                # seg passed explicitly: the scatter permutation must
                # match make_ilv_codes' build permutation, and the (W, N)
                # operand shape cannot encode seg for an assert to catch
                new["ilv"] = _scatter_ilv_apply(dev["ilv"], idx, c_new,
                                                pallas_scan.DEFAULT_SEG)
        return new

    # -- filters -----------------------------------------------------------

    _FILTER_CACHE_SIZE = 16

    def _filter_mask(self, args: "SearchArgs") -> tuple[np.ndarray, int]:
        """(bool mask over capacity rows, live-passing count).

        Query-string filters evaluate in two tiers, both far from the
        reference's per-candidate re-unmarshal loop (collection.go:583-596):

        1. vectorized: common predicate shapes run as numpy mask algebra
           over columnar field projections (query/columnar.py) — the JSON
           parse happens once per (fields, mutation generation), each new
           query is microseconds over 1M rows;
        2. fallback: one compiled-closure pass per row.

        Either way the resulting mask is cached keyed on (query, mutation
        generation)."""
        flt = args.filter
        cache_key = None
        if flt is None and not args.filter_query:
            # unfiltered: no copy, no recount — callers with a device cache
            # use the HBM-resident validity column directly (at 10M rows the
            # per-query host copy + upload alone cost >100ms)
            return self.columns.valid, len(self.columns)
        if flt is None and args.filter_query:
            cache_key = args.filter_query
            hit = self._filter_cache.get(cache_key)
            if hit is not None and hit[0] == self.columns.version:
                return hit[1], hit[2]
            vec = self._columnar_filter.evaluate(args.filter_query,
                                                 self.columns)
            if vec is not None:
                valid = self.columns.valid.copy()
                valid[: self.columns.size] &= vec
                return self._cache_mask(cache_key, valid)
            from .. import build_filter
            flt = build_filter(args.filter_query)
        valid = self.columns.valid.copy()
        if flt is None:
            return valid, int(valid.sum())
        for row in self.columns.live_rows():
            md = self.columns.metadata[row]
            if not flt(int(self.columns.ids[row]), md if md is not None else b""):
                valid[row] = False
        if cache_key is not None:
            return self._cache_mask(cache_key, valid)
        return valid, int(valid.sum())

    def _cache_mask(self, cache_key: str, valid: np.ndarray):
        count = int(valid.sum())
        self._filter_cache[cache_key] = (self.columns.version, valid, count)
        while len(self._filter_cache) > self._FILTER_CACHE_SIZE:
            self._filter_cache.pop(next(iter(self._filter_cache)))
        return valid, count

    # -- search ------------------------------------------------------------

    def search(self, args: SearchArgs) -> SearchResults:
        t0 = time.perf_counter()
        with self._lock:
            fin = self._search_locked(args)
        # kNN device path: the result fetch (~33ms tunnel RTT) runs with
        # the lock RELEASED so concurrent mutations (and other searches)
        # proceed during the round trip — the config5 streaming overlap
        # (reference analog: RWMutex shared reads, collection.go:569-571)
        res = fin() if callable(fin) else fin
        res.search_time_ms = (time.perf_counter() - t0) * 1000.0
        return res

    def search_many(self, args_list: Sequence[SearchArgs]) -> list[SearchResults]:
        """Batched kNN: one device dispatch answers the whole query group.

        All searches must be homogeneous kNN (k > 0, radius == 0, vector set,
        same precision and filter) — the REST layer's SearchBatcher groups
        concurrent requests this way (server/batcher.py).  On tunneled TPU
        setups a single query pays one fixed ~30 ms result-fetch RPC;
        batching amortizes that RPC (and the kernel dispatch) across the
        group, which is what makes concurrent single-query REST serving
        throughput approach the chip's batched QPS.
        """
        return self.search_many_async(args_list)()

    def search_many_async(self, args_list: Sequence[SearchArgs]
                          ) -> Callable[[], list[SearchResults]]:
        """Pipelined search_many: DISPATCH the group's device program now
        (under the collection lock, ~1 ms) and return a finish() callable
        that blocks on the result fetch (~33 ms tunnel RTT) WITHOUT the
        lock.  Concurrent serving overlaps group N+1's dispatch with group
        N's in-flight fetch — the device never idles on a group boundary
        (reference analog: concurrent searches under RWMutex,
        collection.go:569-571; here the exclusive section is the enqueue,
        not the round trip)."""
        if not args_list:
            return lambda: []
        t0 = time.perf_counter()
        a0 = args_list[0]
        p0 = a0.precision or "medium"
        for a in args_list:
            if (a.k != a0.k or a.k <= 0 or a.radius != 0
                    or a.vector is None or a.filter is not None
                    or (a.precision or "medium") != p0
                    or (a.filter_query or "") != (a0.filter_query or "")):
                raise ValueError(
                    "search_many requires homogeneous kNN searches (same "
                    "k/precision/filter_query, no radius, no callable filter)")
        qvecs = np.stack([np.asarray(a.vector, dtype=np.float64)
                          for a in args_list])
        if qvecs.shape[1] != self.dimension_count:
            raise ValueError("query vector dimension mismatch")
        # pad the batch to a power-of-two row count: concurrent serving
        # produces arbitrary group sizes, and every distinct Q shape is a
        # separate XLA compile (seconds each through a remote compiler) —
        # bucketing caps the shape set at {8,16,32,64,...}
        b0 = qvecs.shape[0]
        bucket = max(8, 1 << (b0 - 1).bit_length())
        if bucket != b0:
            # pad with COPIES of the first query, not zeros: pad members
            # ride the provable-selection flag like everyone else, and a
            # zero cosine query's error bound is degenerate — zero pads
            # would spuriously fail the flag and escalate every bucketed
            # high-precision dispatch to a full gather (and poison the
            # margin hint).  Copies fail exactly iff the real query fails.
            qvecs = np.concatenate(
                [qvecs, np.repeat(qvecs[:1], bucket - b0, axis=0)])
        with self._lock:
            n_records = len(self.columns)
            if n_records == 0:
                fin = None
            else:
                fin = self._knn_many_async(qvecs, a0, n_records, n_real=b0)

        def finish() -> list[SearchResults]:
            if fin is None:
                out = [SearchResults([], 0.0) for _ in args_list]
            else:
                out = fin()[:b0]
            dt = (time.perf_counter() - t0) * 1000.0
            # every member reports the group's shared dispatch wall time:
            # one device dispatch served them all, and that dispatch IS the
            # search time (reference semantics, rest.go:450-452).
            # Queue/coalescing wait is NOT in here — the REST layer reports
            # it separately as queue_wait_time.
            for r in out:
                r.search_time_ms = dt
            return out

        return finish

    def radius_many(self, args_list: Sequence[SearchArgs]
                    ) -> list[SearchResults]:
        """Batched radius search: one shared device escalation loop answers
        the whole group.  Searches must share precision and filter_query
        (no callable filters) but may carry DIFFERENT radii — the group
        dispatches at the shared top-k shape and escalates k until every
        member's worst returned distance clears its own radius, then each
        member post-filters to its radius (reference accept-reset
        semantics, collection.go:598-604, at one dispatch for the group —
        previously every concurrent radius request paid its own ~33 ms
        tunnel round trip, the exact pathology the kNN batcher removes).

        Like the kNN path, the device DISPATCH runs under the collection
        lock and the result FETCH with it released (escalation
        re-dispatches re-acquire it briefly and re-read device state), so
        radius traffic overlaps with mutations and other searches."""
        if not args_list:
            return []
        t0 = time.perf_counter()
        a0 = args_list[0]
        p0 = a0.precision or "medium"
        for a in args_list:
            if (a.radius <= 0 or a.vector is None or a.filter is not None
                    or (a.precision or "medium") != p0
                    or (a.filter_query or "") != (a0.filter_query or "")):
                raise ValueError(
                    "radius_many requires homogeneous radius searches "
                    "(radius > 0, same precision/filter_query, no callable "
                    "filter)")
        qvecs = np.stack([np.asarray(a.vector, dtype=np.float64)
                          for a in args_list])
        if qvecs.shape[1] != self.dimension_count:
            raise ValueError("query vector dimension mismatch")
        radii = np.array([float(a.radius) for a in args_list])
        # power-of-two bucket (same compile-shape bounding as search_many);
        # pads are copies of query 0 and share its radius
        b0 = qvecs.shape[0]
        bucket = max(8, 1 << (b0 - 1).bit_length())
        if bucket != b0:
            qvecs = np.concatenate(
                [qvecs, np.repeat(qvecs[:1], bucket - b0, axis=0)])
            radii = np.concatenate(
                [radii, np.repeat(radii[:1], bucket - b0)])
        with self._lock:
            fin = self._radius_many_async(a0, qvecs, radii, n_real=b0)
        out = fin() if callable(fin) else fin
        dt = (time.perf_counter() - t0) * 1000.0
        for r in out:
            r.search_time_ms = dt
        return out

    def _radius_many_async(self, args: SearchArgs, qvecs: np.ndarray,
                           radii: np.ndarray, n_real: int):
        """(Q, D)-batched radius search, split into a DISPATCH phase
        (caller holds the lock) and a finish() callable that fetches with
        the lock RELEASED; escalation rounds re-acquire it and re-read
        device state (a donated scatter sync may have replaced the
        dispatched buffers).  Returns results for the first n_real
        queries directly for the host path, else the finish callable."""
        n_records = len(self.columns)
        if n_records == 0:
            return [SearchResults([], 0.0) for _ in range(n_real)]
        precision = args.precision or "medium"
        mask, n_passing = self._filter_mask(args)

        use_index = (precision not in ("exact", "high")
                     and self.index.calibrated
                     and n_records >= MIN_INDEX_SIZE)
        if self._small() and not use_index:
            return [self._host_scan(
                dataclasses.replace(args, radius=float(radii[i])),
                qvecs[i], mask, n_passing, n_records)
                for i in range(n_real)]

        queries = jnp.asarray(np.float32(qvecs))
        dev = self._device_state()
        unfiltered = args.filter is None and not args.filter_query

        def cur_valid(dev_now):
            if unfiltered:
                return dev_now["valid"]
            m, _ = self._filter_mask(args)
            return jnp.asarray(m)

        valid = cur_valid(dev)

        if use_index:
            budget = min(max(self.options.search_budget,
                             4 * max(args.k, 1)), self.columns.capacity)
            qcode = jnp.asarray(self.index.encode_np(np.float32(qvecs)))
            cap = min(n_passing, self.columns.capacity)

            def ann_dispatch(dev_now, valid_now, b):
                if self._mesh is not None:
                    from ..parallel import search as psearch
                    shards = self._mesh.shape["data"]
                    return psearch.sharded_ann_topk(
                        self._mesh, qcode, queries, dev_now["codes"],
                        dev_now["norms"], dev_now["hashes"], valid_now,
                        bits=self.quantization, metric=self.metric, k=b,
                        local_budget=max(1, b // shards),
                        words=self.index.words, with_counts=True)
                _, cand = hamming.hamming_candidates(
                    qcode, dev_now["hashes"], valid_now, b,
                    self.index.words)
                return self._ann_rerank(queries, dev_now, valid_now,
                                        cand, b)

            b = budget
            dist, rows, nsc = ann_dispatch(dev, valid, b)

            def finish_ann() -> list[SearchResults]:
                bb, d, r, c = b, dist, rows, nsc
                while True:
                    dist_np, rows_np, cnt = self._fetch_results(d, r, c)
                    if bb >= cap or all(
                            self._radius_done(dist_np[i], bb, radii[i], 0.0)
                            for i in range(n_real)):
                        break
                    bb = min(bb * 4, cap)
                    with self._lock:  # escalation re-dispatch
                        dev2 = self._device_state()
                        d, r, c = ann_dispatch(dev2, cur_valid(dev2), bb)
                searched = min(bb, n_passing)
                with self._lock:  # result assembly reads host columns
                    return [self._radius_results_np(
                        dist_np[i], rows_np[i], float(radii[i]),
                        int(cnt[i]) if cnt is not None else searched,
                        n_records) for i in range(n_real)]

            return self._leased_finish(finish_ann)

        # exhaustive: shared bounded top-k with escalation (one device
        # program per iteration serves the whole group)
        searched = n_passing
        exact = precision == "exact"
        eps = self._F32_EPS_REL * np.maximum(1.0, radii) if exact \
            else np.zeros_like(radii)
        kk0 = min(1024, n_passing)
        tmargin0 = self._seg_margin_hint
        dispatched = self._exact_topk_device(queries, dev, valid, kk0,
                                             exact, tie_margin=tmargin0)

        def finish_exh() -> list[SearchResults]:
            kk, tm = kk0, tmargin0
            dist, rows, ties, s_used, nseg = dispatched
            first_fail = None
            while True:
                dist_np, rows_np, tie_np = self._fetch_results(dist, rows,
                                                               ties)
                if ties is not None and s_used < nseg:
                    if first_fail is None:
                        first_fail = 1.0 - float(tie_np[:n_real].mean())
                    if int(tie_np.min()) == 0:
                        with self._lock:  # margin escalation re-dispatch
                            tm = self._escalate_margin(tm)
                            dev2 = self._device_state()
                            dist, rows, ties, s_used, nseg = \
                                self._exact_topk_device(
                                    queries, dev2, cur_valid(dev2), kk,
                                    exact, tie_margin=tm)
                        continue
                    with self._lock:
                        self._note_margin(tm, first_fail, kk=kk,
                                          n_real=n_real)
                if kk >= n_passing or all(
                        self._radius_done(dist_np[i], kk, radii[i], eps[i])
                        for i in range(n_real)):
                    break
                kk = min(kk * 4, n_passing)
                with self._lock:  # k escalation re-dispatch
                    dev2 = self._device_state()
                    dist, rows, ties, s_used, nseg = \
                        self._exact_topk_device(queries, dev2,
                                                cur_valid(dev2), kk,
                                                exact, tie_margin=tm)
            out = []
            with self._lock:  # result assembly reads host columns
                for i in range(n_real):
                    if exact:
                        rows_i = rows_np[i][np.isfinite(dist_np[i])]
                        out.append(self._radius_results_f64(
                            qvecs[i], rows_i, float(radii[i]), searched,
                            n_records))
                    else:
                        out.append(self._radius_results_np(
                            dist_np[i], rows_np[i], float(radii[i]),
                            searched, n_records))
            return out

        return self._leased_finish(finish_exh)

    @staticmethod
    def _radius_done(dist_row: np.ndarray, kk: int, radius: float,
                     eps: float) -> bool:
        """One query's escalation stop test: its candidate set is complete
        when fewer than kk rows came back finite or the worst returned
        distance already exceeds its radius (+ the exact-mode f32 cushion)."""
        finite = dist_row[np.isfinite(dist_row)]
        return len(finite) < kk or \
            (len(finite) > 0 and finite[-1] > radius + eps)

    def _radius_results_np(self, dist: np.ndarray, rows: np.ndarray,
                           radius: float, searched: int,
                           n_records: int) -> SearchResults:
        """Assemble one query's radius results from already-fetched arrays."""
        keep = np.flatnonzero(np.isfinite(dist) & (dist <= radius))
        results = [self._mk_result(int(rows[i]), float(dist[i]))
                   for i in keep]
        return SearchResults(results, self._pct(searched, n_records))

    def _search_locked(self, args: SearchArgs):
        """Dispatch one search under the caller's lock.  kNN and radius
        device searches return a finish() CALLABLE (fetch outside the
        lock — see search()); list mode and host scans return the
        SearchResults directly."""
        n_records = len(self.columns)

        # mode (a): list all in ID order (collection.go:633-668)
        if args.k == 0 and args.radius == 0:
            return self._list_mode(args, n_records)

        if args.vector is None:
            raise ValueError("search requires a vector when k or radius is set")
        qvec = np.asarray(args.vector, dtype=np.float64)
        if qvec.shape != (self.dimension_count,):
            raise ValueError("query vector dimension mismatch")
        if n_records == 0:
            return SearchResults([], 0.0)

        if args.radius > 0:
            return self._radius_search(args, qvec, n_records)
        fin = self._knn_many_async(qvec[None, :], args, n_records)
        return lambda: fin()[0]

    def _small(self) -> bool:
        """Small-collection host fast path: no device sync, no RPC — a host
        BLAS scan beats the fixed per-transfer round-trip below ~2M stored
        elements and f64 math matches the reference's scalar loops."""
        return (self._mesh is None and
                self.columns.size * self.dimension_count
                <= HOST_SCAN_MAX_ELEMS)

    def _exact_topk_device(self, queries, dev, valid, kk: int, exact: bool,
                           tie_margin: Optional[int] = None):
        """Exhaustive device top-k over all rows for (Q, D) queries.

        Returns (dist, rows, ok_flags, s_used, nseg).  ok_flags is a
        per-query device array implementing the provable-selection
        contract (ops/pallas_scan.fused_scan_topk docstring): the result
        is PROVABLY the true top-k where ok == 1; otherwise the caller
        re-dispatches with a geometrically escalated tie_margin.  The
        non-segmented fallbacks select over the full surface and return
        ok_flags=None (no escalation needed)."""
        if self._mesh is not None:
            from ..parallel import search as psearch
            # surface-aware default (mirrors sharded_exact_topk's choice —
            # a margin picked for the wrong surface structurally escalates)
            margin = psearch.default_mesh_seg_margin(
                dev.get("ilv") is not None, queries.shape[0], exact) \
                if tie_margin is None else tie_margin
            out = psearch.sharded_exact_topk(
                self._mesh, queries, dev["codes"], dev["norms"], valid,
                dev.get("slab"), dev.get("ilv"),
                bits=self.quantization, metric=self.metric, k=kk,
                exact=exact, seg_margin=margin, with_ties=True,
                kernel_interpret=self._kernel_interpret)
            if len(out) == 2:  # non-fused sharded path: full-surface top-k
                return out[0], out[1], None, 0, 0
            dist, rows, ties = out
            nseg = (self.columns.capacity //
                    self._mesh.shape["data"]) // psearch._SEG
            return dist, rows, ties, min(kk + margin, nseg), nseg
        from ..ops import pallas_scan
        codes_dev = dev.get("codes")
        interp = self._kernel_interpret
        # Fused segment-min scan: streams the codes once and never
        # materializes the f32 (Q, N) distance matrix in HBM
        # (ops/pallas_scan.py).  Falls back to the XLA two-dispatch
        # pipeline for large k (radius escalation) or off-TPU.
        if pallas_scan.fused_k_ok(kk, queries.shape[0]) and \
                pallas_scan.supported():
            for block in (4096, 2048, 1024):
                if self.columns.capacity % block == 0:
                    # f32 surfaces (ilv kernel / exact mode) prove
                    # completeness at a much smaller default margin
                    # (pallas_scan._TIE_MARGIN_F32 note); the SHARED
                    # predicate keeps this in lockstep with the surface
                    # fused_scan_topk actually picks
                    use_ilv = pallas_scan.will_use_ilv(
                        dev.get("ilv") is not None, queries.shape[0],
                        exact, interp)
                    surf_f32 = exact or use_ilv
                    margin = pallas_scan.default_tie_margin(surf_f32) \
                        if tie_margin is None else tie_margin
                    if tie_margin is None and \
                            kk > pallas_scan.MAX_FUSED_K:
                        # large-k (the radius-escalation shape): tie
                        # density at the k-th value scales with k —
                        # start at the 64 rung so the common case is one
                        # dispatch (margin 8 failed 3/8 queries at
                        # k=1024 on the headline corpus)
                        margin = max(margin, 64)
                    nseg = self.columns.capacity // pallas_scan.DEFAULT_SEG
                    if codes_dev is None and not use_ilv:
                        # lean placement meets a codes-needing surface
                        # (exact-mode XLA / Q past the kernel's block):
                        # reconstruct the matmul layout from the slab for
                        # this dispatch (one HBM relayout pass)
                        codes_dev = pallas_scan.codes_from_slab(
                            dev["slab"])
                    dist, rows, ties = pallas_scan.fused_scan_topk(
                        queries, codes_dev, dev["norms"], valid,
                        dev.get("slab"), dev.get("ilv"),
                        bits=self.quantization, metric=self.metric,
                        k=kk, block_n=block, exact=exact,
                        interpret=interp,
                        tie_margin=margin, with_ties=True)
                    return dist, rows, ties, min(kk + margin, nseg), nseg
        if codes_dev is None:
            codes_dev = pallas_scan.codes_from_slab(dev["slab"])
        dists = dist_ops.score_block(
            queries, codes_dev, dev["norms"], valid,
            self.quantization, self.metric, exact=exact)
        d, r = dist_ops.top_k_smallest(dists, kk)
        return d, r, None, 0, 0

    def _ann_rerank(self, queries, dev: dict, valid, cand, k: int):
        """Exact rerank of sketch candidates: per-row gathers from the
        matmul-layout codes when resident, otherwise (lean placement) the
        slab-served variant — same (dist, rows, nscored) contract."""
        from ..ops import pallas_scan
        if "codes" in dev:
            return hamming.rerank_topk(
                queries, dev["codes"], dev["norms"], valid, cand,
                self.quantization, self.metric, k, with_counts=True)
        return pallas_scan.lane_rerank_topk(
            queries, dev["slab"], dev["norms"], valid, cand,
            bits=self.quantization, metric=self.metric, k=k,
            with_counts=True)

    def _leased_finish(self, fin: Callable) -> Callable:
        """Hold a column-store snapshot lease across a deferred result
        assembly (review finding, r4): between the locked dispatch and the
        lock-free fetch, a remove+add pair could recycle a free-list row,
        making finish() pair the NEW document's id/metadata with the OLD
        document's distance — a result matching no snapshot.  The lease
        quarantines rows freed while any fetch is in flight (removes still
        apply immediately; assemblies see old-or-removed, never torn).
        Caller must hold self._lock."""
        self.columns.begin_lease()
        done = [False]

        def finish_leased():
            try:
                return fin()
            finally:
                with self._lock:
                    if not done[0]:
                        done[0] = True
                        self.columns.end_lease()
        return finish_leased

    def _knn_many_async(self, qvecs: np.ndarray, args: SearchArgs,
                        n_records: int, n_real: Optional[int] = None
                        ) -> Callable[[], list[SearchResults]]:
        """kNN for a (Q, D) batch of queries sharing precision/filter,
        split into a DISPATCH phase (runs now, caller holds the lock) and
        a returned finish() that blocks on the device->host fetch with the
        lock RELEASED — result assembly and any escalation re-dispatch
        re-acquire it briefly (search_many_async).

        n_real: number of REAL queries when the batch is bucket-padded
        with copies of qvecs[0] (search_many) — the margin-hint gate's
        structural-failure fraction must be computed over real queries
        only, or a lone flag-tripping query replicated across its pad
        copies reads as a structural failure and poisons the hint
        (ADVICE r3)."""
        precision = args.precision or "medium"
        nq = qvecs.shape[0]
        n_real = nq if n_real is None else n_real
        mask, n_passing = self._filter_mask(args)
        k = min(args.k, n_passing)

        use_index = (precision not in ("exact", "high")
                     and self.index.calibrated
                     and n_records >= MIN_INDEX_SIZE)
        if use_index:
            budget = min(max(self.options.search_budget,
                             4 * max(args.k, 1)), self.columns.capacity)
            # adaptive medium (see ANN_BATCH_CROSSOVER): above the traffic
            # crossover the exhaustive segment-min scan is both faster per
            # query and exact, so a large batch should never pay the
            # index's per-query gathers.  Compares against n_records (a
            # masked scan still streams every row's codes).
            if nq * budget * ANN_BATCH_CROSSOVER >= n_records:
                use_index = False
        if self._small() and not use_index:
            out = self._host_scan_knn(qvecs, k, mask, n_passing, n_records)
            return lambda: out

        queries = jnp.asarray(np.float32(qvecs))
        dev = self._device_state()
        unfiltered = args.filter is None and not args.filter_query
        valid = dev["valid"] if unfiltered else jnp.asarray(mask)

        if use_index:
            searched = min(budget, n_passing)
            if k == 0:
                out = [SearchResults([], self._pct(searched, n_records))
                       for _ in range(nq)]
                return lambda: out
            qcode = jnp.asarray(self.index.encode_np(np.float32(qvecs)))
            if self._mesh is not None:
                from ..parallel import search as psearch
                shards = self._mesh.shape["data"]
                dist, rows, nsc = psearch.sharded_ann_topk(
                    self._mesh, qcode, queries, dev["codes"], dev["norms"],
                    dev["hashes"], valid, bits=self.quantization,
                    metric=self.metric, k=k,
                    local_budget=max(1, budget // shards),
                    words=self.index.words, with_counts=True)
            else:
                _, cand = hamming.hamming_candidates(
                    qcode, dev["hashes"], valid, budget, self.index.words)
                dist, rows, nsc = self._ann_rerank(
                    queries, dev, valid, cand, k)

            def finish_ann() -> list[SearchResults]:
                dist_np, rows_np, cnt = self._fetch_results(dist, rows, nsc)
                with self._lock:  # result assembly reads host columns
                    return self._knn_results_np(dist_np, rows_np, k,
                                                searched, n_records, cnt)

            return self._leased_finish(finish_ann)

        # exhaustive device scan (mode (b), and large-N medium w/o index)
        searched = n_passing
        if k == 0:
            out = [SearchResults([], self._pct(searched, n_records))
                   for _ in range(nq)]
            return lambda: out
        if precision == "exact":
            # exact mode interleaves host f64 reranks with escalation
            # re-dispatches: stays synchronous under the caller's lock
            out = self._exact_knn_f64(qvecs, queries, dev, valid, k,
                                      n_passing, searched, n_records,
                                      n_real=n_real)
            return lambda: out
        tmargin = self._seg_margin_hint
        dist, rows, ties, s_used, nseg = self._exact_topk_device(
            queries, dev, valid, k, False, tie_margin=tmargin)

        if ties is None:
            def finish_plain() -> list[SearchResults]:
                dist_np, rows_np, _ = self._fetch_results(dist, rows)
                with self._lock:
                    return self._knn_results_np(dist_np, rows_np, k,
                                                searched, n_records)

            return self._leased_finish(finish_plain)

        def finish_escalate() -> list[SearchResults]:
            d, r, t = dist, rows, ties
            su, ns, tm = s_used, nseg, tmargin
            first_fail = None
            while True:
                dist_np, rows_np, tie_np = self._fetch_results(d, r, t)
                if first_fail is None:
                    first_fail = 1.0 - float(tie_np[:n_real].mean())
                if su >= ns or int(tie_np.min()) == 1:
                    break
                # provable-selection escalation: some query's tie cluster
                # exceeded the margin (adversarially clustered data) —
                # re-dispatch at the next ladder rung.  Device state is
                # RE-READ under the lock: a donated scatter sync may have
                # replaced the buffers captured at dispatch time (using a
                # donated-away array raises), and batch-boundary
                # consistency allows the retry to see the newer data.
                with self._lock:
                    tm = self._escalate_margin(tm)
                    dev2 = self._device_state()
                    if unfiltered:
                        valid2 = dev2["valid"]
                    else:
                        mask2, _ = self._filter_mask(args)
                        valid2 = jnp.asarray(mask2)
                    d, r, t, su, ns = self._exact_topk_device(
                        queries, dev2, valid2, k, False, tie_margin=tm)
            with self._lock:
                self._note_margin(tm, first_fail, kk=k, n_real=n_real)
                return self._knn_results_np(dist_np, rows_np, k, searched,
                                            n_records)

        return self._leased_finish(finish_escalate)

    # A starting-margin failure is "structural" when at least this
    # fraction of the batch's REAL queries tripped the flag (pads are
    # copies of query 0 and must not count — ADVICE r3): such corpora
    # (concentrated iid high-D — the config-4 pattern) fail on EVERY
    # batch, so remembering the proven rung saves re-climbing the ladder
    # per search.  Below the threshold the failure is an outlier query
    # (measured ~2e-4 of clustered-corpus queries at the tightened
    # default margin): it escalates its own dispatch, but must NOT
    # permanently widen every future search's rerank (hint poisoning —
    # one unlucky query would tax the collection's throughput forever).
    _HINT_FAIL_FRAC = 0.01
    # Small batches can't distinguish an outlier from a structural corpus
    # by fraction alone (1 failing query of 1 is 100%): below this many
    # real queries, require _HINT_STREAK consecutive failing SEARCHES
    # before setting the hint.  A clustered corpus at the measured 2e-4
    # outlier rate hits 3 consecutive lone-query failures with p ~ 1e-11;
    # a structural corpus (config 4 serves single queries) pays the ladder
    # thrice, then every later search starts at the proven rung.
    _HINT_MIN_BATCH = 64
    _HINT_STREAK = 3

    def _note_margin(self, tmargin: Optional[int],
                     fail_frac: float = 1.0, kk: int = 0,
                     n_real: int = 1 << 30) -> None:
        """Record the tie margin a completed dispatch needed so the next
        search starts there instead of re-climbing the escalation ladder
        (monotone max; only ever raises rerank width, never correctness).
        Skipped for non-structural failures (_HINT_FAIL_FRAC over the real
        queries, streak-confirmed below _HINT_MIN_BATCH) and for large-k
        dispatches (radius escalation, kk > MAX_FUSED_K): their tie
        density is a property of k, not the corpus, and must not tax
        every future serving-class search with a widened rerank."""
        from ..ops import pallas_scan
        if kk > pallas_scan.MAX_FUSED_K:
            return
        if fail_frac < self._HINT_FAIL_FRAC:
            self._hint_fail_streak = 0
            return
        if n_real < self._HINT_MIN_BATCH:
            self._hint_fail_streak += 1
            if self._hint_fail_streak < self._HINT_STREAK:
                return
        if tmargin is not None and tmargin > (self._seg_margin_hint or 0):
            self._seg_margin_hint = tmargin

    # Escalation rungs for the provable-selection margin.  Each DISTINCT
    # margin is a distinct static shape — a fresh XLA program whose remote
    # compile costs ~15 s through the axon tunnel (measured; the dispatch
    # itself is ~50 ms).  A data-dependent formula (2*(s_used-k)+16)
    # generated arbitrary per-k values (80, 176, 368, ...), so every
    # corpus/filter that tripped the flag at a new level stalled a live
    # query behind a compile.  A fixed ladder caps the shape set at
    # {default, 64, 512, 8192, full}: 64 is the cheap rung that absorbs
    # one-off tie-cluster overflows past the default margin (+11 ms at
    # the headline shape — r5_margin_sweep) so a rare outlier query costs
    # one modest re-dispatch; 512 covers every measured structural tie
    # cluster (concentrated iid-768d corpora need ~176; the adversarial
    # test corpus ~330) at negligible extra rerank width, 8192 is the
    # safety rung, and beyond that the dispatch clamps to a complete
    # gather.
    _MARGIN_LADDER = (64, 512, 8192)

    def _escalate_margin(self, cur: Optional[int]) -> int:
        have = cur or 0
        for m in self._MARGIN_LADDER:
            if m > have:
                return m
        # past the ladder: a margin larger than any segment count makes
        # the dispatch gather EVERY segment (s_used >= nseg), which is
        # complete by construction and terminates the caller's loop
        return 1 << 30

    # error bound for the f32-HIGHEST device distances vs true f64 values:
    # accumulation error of a D-term f32 dot plus the 64->32-bit code
    # truncation, relative to the distance magnitude.  Deliberately
    # generous — an undersized bound would break the shortlist proof, an
    # oversized one merely escalates more often on near-tie data.
    _F32_EPS_REL = 3e-4

    def _rows_vectors_f64(self, rows: np.ndarray) -> np.ndarray:
        """Exact f64 dequantized vectors for the given rows.  The host
        column store is lossless at every bit width (64-bit stays f64
        host-side; integer codes decode via the reference's f64 formula,
        quantization.go:25-36)."""
        return qz.device_repr_to_float(self.columns.codes[rows],
                                       self.quantization,
                                       self.dimension_count)

    def _exact_knn_f64(self, qvecs, queries, dev, valid, k: int,
                       n_passing: int, searched: int, n_records: int,
                       n_real: Optional[int] = None) -> list[SearchResults]:
        """precision="exact" above the host-scan threshold: the device
        produces an f32-HIGHEST top-(k+margin) shortlist, and the final
        ranking is recomputed on the host in f64 from the stored codes —
        the reference's all-f64 semantics (collection.go:812-832) at every
        scale.  The margin escalates until the f64 k-th best is provably
        separated from the shortlist boundary: any row NOT shortlisted has
        f32 distance >= the boundary, hence f64 distance >= boundary - eps,
        so boundary > d64_k + eps proves no missing winner."""
        nq = qvecs.shape[0]
        n_real = nq if n_real is None else n_real  # pad-aware (ADVICE r3)
        m = max(64, k)
        tmargin = self._seg_margin_hint
        first_fail = None
        while True:
            kk = min(k + m, n_passing)
            dist, rows, ties, s_used, nseg = self._exact_topk_device(
                queries, dev, valid, kk, True, tie_margin=tmargin)
            dist_np, rows_np, tie_np = self._fetch_results(dist, rows, ties)
            if first_fail is None and ties is not None:
                first_fail = 1.0 - float(tie_np[:n_real].mean())
            if ties is not None and s_used < nseg and \
                    int(tie_np.min()) == 0:
                # segment-selection tie overflow: the shortlist itself may
                # be incomplete — widen the segment margin first
                tmargin = self._escalate_margin(tmargin)
                continue
            self._note_margin(tmargin, first_fail
                              if first_fail is not None else 1.0, kk=kk,
                              n_real=n_real)
            out = []
            ok = True
            for qi in range(nq):
                fin = np.isfinite(dist_np[qi])
                cand = rows_np[qi][fin]
                if len(cand) == 0:
                    out.append([])
                    continue
                d64 = dist_ops.distance_np(
                    np.asarray(qvecs[qi], dtype=np.float64)[None, :],
                    self._rows_vectors_f64(cand), self.metric)
                order = np.argsort(d64, kind="stable")[:k]
                if len(cand) == kk and kk < n_passing:
                    boundary = float(dist_np[qi][fin][-1])
                    eps = self._F32_EPS_REL * max(1.0, abs(boundary))
                    if float(d64[order[-1]]) + eps >= boundary:
                        ok = False
                        break
                out.append([self._mk_result(int(cand[i]), float(d64[i]))
                            for i in order])
            if ok or kk >= n_passing:
                break
            m *= 4
        pct = self._pct(searched, n_records)
        return [SearchResults(r, pct) for r in out]

    def _radius_search(self, args: SearchArgs, qvec: np.ndarray,
                       n_records: int):
        """Single-query radius search: the Q=1 case of the batched
        escalation loop.  Returns SearchResults (host path) or a finish()
        callable (device paths — fetch runs without the caller's lock)."""
        out = self._radius_many_async(
            args, qvec[None, :], np.array([float(args.radius)]), n_real=1)
        if callable(out):
            return lambda: out()[0]
        return out[0]

    def _radius_results_f64(self, qvec: np.ndarray, rows_np: np.ndarray,
                            radius: float, searched: int,
                            n_records: int) -> SearchResults:
        """f64 re-filter + re-sort of the device shortlist (exact mode)."""
        if len(rows_np) == 0:
            return SearchResults([], self._pct(searched, n_records))
        d64 = dist_ops.distance_np(
            np.asarray(qvec, dtype=np.float64)[None, :],
            self._rows_vectors_f64(rows_np), self.metric)
        keep = np.flatnonzero(d64 <= radius)
        order = keep[np.argsort(d64[keep], kind="stable")]
        results = [self._mk_result(int(rows_np[i]), float(d64[i]))
                   for i in order]
        return SearchResults(results, self._pct(searched, n_records))

    def _host_scan_knn(self, qvecs: np.ndarray, k: int, mask: np.ndarray,
                       n_passing: int, n_records: int) -> list[SearchResults]:
        """Exhaustive host scan in f64 for a batch of kNN queries."""
        size = self.columns.size
        live = np.flatnonzero(mask[:size])
        pct = self._pct(n_passing, n_records)
        if len(live) == 0 or k == 0:
            return [SearchResults([], pct) for _ in range(len(qvecs))]
        vecs = qz.device_repr_to_float(self.columns.codes[live],
                                       self.quantization,
                                       self.dimension_count)
        out = []
        for qi in range(len(qvecs)):
            d = dist_ops.distance_np(qvecs[qi][None, :], vecs, self.metric)
            part = np.argpartition(d, k - 1)[:k]
            order = part[np.argsort(d[part], kind="stable")]
            out.append(SearchResults(
                [self._mk_result(int(live[i]), float(d[i])) for i in order],
                pct))
        return out

    def _host_scan(self, args: SearchArgs, qvec: np.ndarray,
                   mask: np.ndarray, n_passing: int,
                   n_records: int) -> SearchResults:
        """Exhaustive scan on the host in f64 (small collections only)."""
        size = self.columns.size
        live = np.flatnonzero(mask[:size])
        if len(live) == 0:
            return SearchResults([], self._pct(n_passing, n_records))
        vecs = qz.device_repr_to_float(self.columns.codes[live],
                                       self.quantization,
                                       self.dimension_count)
        d = dist_ops.distance_np(qvec[None, :], vecs, self.metric)
        if args.radius > 0:
            hit = np.flatnonzero(d <= args.radius)
            order = hit[np.argsort(d[hit], kind="stable")]
            results = [self._mk_result(int(live[i]), float(d[i]))
                       for i in order]
            return SearchResults(results, self._pct(n_passing, n_records))
        k = min(args.k, n_passing)
        if k == 0:
            return SearchResults([], self._pct(n_passing, n_records))
        part = np.argpartition(d, k - 1)[:k]
        order = part[np.argsort(d[part], kind="stable")]
        results = [self._mk_result(int(live[i]), float(d[i])) for i in order]
        return SearchResults(results, self._pct(n_passing, n_records))

    # -- result assembly ---------------------------------------------------

    def _pct(self, searched: int, n_records: int) -> float:
        return 0.0 if n_records == 0 else searched / n_records * 100.0

    def _mk_result(self, row: int, d: float) -> SearchResult:
        md = self.columns.metadata[row]
        return SearchResult(int(self.columns.ids[row]),
                            md if md is not None else b"", d)

    @staticmethod
    def _fetch_results(dist, rows, counts=None):
        """Single device->host fetch for (dist, rows[, counts]): the floats
        are bitcast into an int32 payload so one RPC carries everything
        (per-transfer latency dominates small fetches on tunneled backends).
        The packing must ride the INTEGER path: f32 ops flush denormal bit
        patterns (row ids < 2^23 bitcast to denormals) to zero on TPU."""
        import jax
        cols = [jax.lax.bitcast_convert_type(dist.astype(jnp.float32),
                                             jnp.int32),
                rows.astype(jnp.int32)]
        if counts is not None:
            cols.append(counts.astype(jnp.int32)[:, None])
        packed = jnp.concatenate(cols, axis=1)
        arr = np.asarray(packed)
        if counts is not None:
            cnt = arr[:, -1]
            arr = arr[:, :-1]
        else:
            cnt = None
        k = arr.shape[1] // 2
        return arr[:, :k].copy().view(np.float32), arr[:, k:], cnt

    def _knn_results_np(self, dist, rows, k: int, searched: int,
                        n_records: int, cnt=None) -> list[SearchResults]:
        return [SearchResults(
            [self._mk_result(int(r), float(d))
             for d, r in zip(dist[qi][:k], rows[qi][:k]) if np.isfinite(d)],
            self._pct(int(cnt[qi]) if cnt is not None else searched,
                      n_records)) for qi in range(dist.shape[0])]

    def _sorted_doc_ids(self) -> list[int]:
        """Doc ids in lexicographic decimal-string order (the reference's
        IterateSortedRecords quirk, spanfile.go:541-547), cached per mutation
        generation: at 10M rows the O(N log N) string sort costs seconds and
        must not be paid per paginated listing."""
        ver = self.columns.version
        cached = self._sorted_ids_cache
        if cached is None or cached[0] != ver:
            self._list_sort_count += 1
            ids = sorted(((str(i), int(i)) for i in self.columns.doc_ids()),
                         key=lambda p: p[0])
            cached = (ver, [p[1] for p in ids])
            self._sorted_ids_cache = cached
        return cached[1]

    def _list_mode(self, args: SearchArgs, n_records: int) -> SearchResults:
        ordered = self._sorted_doc_ids()
        flt = args.filter
        if flt is None and args.filter_query:
            from .. import build_filter
            flt = build_filter(args.filter_query)

        if flt is None:
            # unfiltered: O(page) slice of the cached order — "considered"
            # counts records visited, exactly what the sequential walk
            # produces (offset skips still visit, collection.go:643-668)
            if args.limit:
                page = ordered[args.offset:args.offset + args.limit]
            else:
                page = ordered[args.offset:]
            # the sequential walk visits offset skips + the page, breaking
            # once the limit fills; otherwise it reaches the end
            if args.limit and len(page) == args.limit:
                considered = args.offset + args.limit
            else:
                considered = len(ordered)
            results = [SearchResult(i, self.columns.get_metadata(i), 0.0)
                       for i in page]
            return SearchResults(results, self._pct(considered, n_records))

        results = []
        skipped = 0
        considered = 0  # filter-passing records visited (pointsSearched,
        #                 collection.go:643-668) — reported as percent_searched
        for doc_id in ordered:
            md = self.columns.get_metadata(doc_id)
            if not flt(doc_id, md):
                continue
            considered += 1
            if skipped < args.offset:
                skipped += 1
                continue
            results.append(SearchResult(doc_id, md, 0.0))
            if args.limit and len(results) >= args.limit:
                break
        return SearchResults(results, self._pct(considered, n_records))

    # -- stats & misc ------------------------------------------------------

    def metadata_json_ok(self, result: SearchResult) -> bool:
        """Memoized JSON-validity check of a result's metadata bytes —
        the REST layer splices valid bytes VERBATIM into the response
        instead of parse+re-serialize per result (the biggest server-side
        term of the serving-knee decomposition, tools_dev/r9b; reference
        analog rest.go:453-461, which re-unmarshals every result).

        The memo is row-indexed; metadata WRITES reset the row's bit
        (ColumnStore), and the bytes-identity check below additionally
        guards the race of a rewrite landing between this validation and
        the memo store — either way the wrong bytes can never be
        memoized as valid."""
        md = result.metadata
        if not md:
            return False
        cols = self.columns
        if not cols.metadata_resident:
            # out-of-core metadata: the memo's bytes-identity guard cannot
            # hold (every read returns fresh bytes from the span log) —
            # validate per result, never memoize
            try:
                json.loads(md)
                return True
            except Exception:
                return False
        row = cols._row_of.get(result.id)  # GIL-atomic dict read
        if row is not None and row < len(cols.meta_ok) and \
                cols.meta_ok[row] and cols.metadata[row] is md:
            return True
        try:
            json.loads(md)
        except Exception:
            return False
        if row is not None and row < len(cols.meta_ok) and \
                cols.metadata[row] is md:
            cols.meta_ok[row] = True
            if cols.metadata[row] is not md:
                # a rewrite raced between the identity check and the memo
                # store: never leave True standing for bytes we didn't
                # validate (the writer's own reset may have run first)
                cols.meta_ok[row] = False
        return True

    def get_document_count(self) -> int:
        return len(self.columns)

    def get_all_ids(self) -> list[int]:
        return sorted(self.columns.doc_ids())

    def iter_export_rows(self, chunk: int = 8192, raw: bool = False):
        """Yield (ids, vectors, metadatas) in ascending-id order for JSON
        export — the bulk span decode + vectorized dequant path (the
        per-record get_document loop exported 2.6k docs/s).  Values are
        identical to get_document's (same storage bytes, same dequant).
        With raw=True, yields the (m, B) uint8 storage rows instead of f64
        vectors (tools/dump.py turns discrete-alphabet codes into
        pre-rendered text).  Falls back to per-record reads for mixed
        logs.

        Out-of-core metadata collections must export at bounded RSS too
        (review finding r5): want_metas=True materializes the whole file
        image plus every metadata bytes — so here the codes ride the
        streamed want_metas=False path (same as the reopen replay,
        collection.py:419) and each chunk's metadata is pread on demand."""
        resident = self.columns.metadata_resident
        bulk = self.spanlog.bulk_rows(want_metas=resident)
        if bulk is None:  # mixed record shapes
            for doc_id in self.get_all_ids():
                try:
                    streams = self.spanlog.read(str(int(doc_id)))
                except KeyError:
                    continue  # removed concurrently
                if raw:
                    row = np.frombuffer(streams[1], dtype=np.uint8)[None]
                else:
                    row = qz.unpack_vector(streams[1], self.dimension_count,
                                           self.quantization)[None]
                yield [int(doc_id)], row, [bytes(streams[0])]
            return
        rec_ids, metas, packed = bulk
        if not rec_ids:
            return
        # uint64: doc ids span the full unsigned range (int64 overflowed
        # on ids >= 2**63 — review finding)
        ids = np.array([int(r) for r in rec_ids], dtype=np.uint64)
        order = np.argsort(ids, kind="stable")
        for s in range(0, len(order), chunk):
            sel = order[s:s + chunk]
            if resident:
                chunk_metas = [metas[i] for i in sel.tolist()]
            else:
                chunk_metas, kept = [], []
                for i in sel.tolist():
                    try:
                        chunk_metas.append(
                            self.spanlog.read_stream0(rec_ids[i]))
                        kept.append(i)
                    except KeyError:
                        continue  # removed concurrently
                if not kept:
                    continue
                sel = np.array(kept, dtype=np.int64)
            rows = packed[sel] if raw else qz.unpack_vectors(
                packed[sel], self.dimension_count, self.quantization)
            yield ids[sel].tolist(), rows, chunk_metas

    def compute_average_distance(self, samples: int = 100) -> float:
        with self._lock:
            return self._compute_average_distance_locked(samples)

    def _compute_average_distance_locked(self, samples: int) -> float:
        ids = self.columns.doc_ids()
        if len(ids) < 2 or samples <= 0:
            return 0.0
        total, count = 0.0, 0
        for _ in range(samples):
            a, b = self._rng.choice(len(ids), size=2, replace=False)
            va = self.columns.get_vector(ids[int(a)])
            vb = self.columns.get_vector(ids[int(b)])
            total += float(dist_ops.distance_np(va, vb, self.metric))
            count += 1
        return total / count if count else 0.0

    def compute_stats(self) -> CollectionStats:
        size, n = self.spanlog.stats()
        return CollectionStats(
            document_count=len(self.columns),
            dimension_count=self.dimension_count,
            quantization=self.quantization,
            distance_method=self.metric,
            storage_size=size,
            average_distance=self.compute_average_distance(100),
        )

    def close(self) -> None:
        with self._lock:
            if not self._closed:
                self.spanlog.close()
                self._dev = None
                self._closed = True
