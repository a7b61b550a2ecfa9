"""Sign-projection Hamming index — the TPU-native ANN structure.

Replaces the reference's forest of random-hyperplane LSH trees
(/root/reference/lshtree.go).  The reference routes a query through 5 binary
trees of hyperplanes with best-first pruning and a probe budget
(lshtree.go:283-351).  A pointer tree is the wrong shape for a TPU, so the
same statistical idea — random hyperplane sign tests — is flattened into two
dense stages:

1. **Sketch scan**: every vector is encoded once into `tables *
   bits_per_table` hyperplane sign bits, packed into uint32 words (the 5
   trees x tree-depth sign tests become 160 independent bits).  A query is
   ranked against ALL N sketches by Hamming distance — a tiny
   (N x words)-uint32 scan, ~26x less HBM traffic than touching the vectors.
2. **Rerank**: the `budget` best sketch rows (the analog of the reference's
   search_k probe budget, lshtree.go:286) are gathered and scored exactly with
   the fused quantized-distance kernel; top-k of that is returned.

PercentSearched = budget / N, mirroring the reference's points-visited metric
(collection.go:700-710).

Euclidean hashing adds data-calibrated offsets (median of projections over a
sample) — the flat analog of the reference's data-dependent split planes
(lshtree.go:201-211), but balanced by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quantize as qz
from ..utils.rng import MyRandom

DEFAULT_TABLES = 5
DEFAULT_BITS_PER_TABLE = 32
# Sketch distances are carried in a uint8 surface on the TPU path
# (ops/pallas_hamming.py) with 255 reserved as the invalid-row marker, so the
# total sketch width must stay below that; it must also pack into whole
# uint32 words.  Enforced at collection creation (ADVICE r1, medium).
MAX_TOTAL_BITS = 254


def check_index_shape(tables: int, bits_per_table: int) -> None:
    """Validate index knobs; raises ValueError with an explanation."""
    if tables < 1 or bits_per_table < 1:
        raise ValueError("index_tables and index_bits_per_table must be >= 1")
    total = tables * bits_per_table
    if total % 32 != 0:
        raise ValueError(
            f"index_tables * index_bits_per_table must be a multiple of 32 "
            f"(got {total})")
    if total > MAX_TOTAL_BITS:
        raise ValueError(
            f"index_tables * index_bits_per_table must be <= "
            f"{MAX_TOTAL_BITS} (got {total}): sketch distances ride a uint8 "
            f"surface with 255 reserved for invalid rows")


def _pack_bits_np(bits: np.ndarray) -> np.ndarray:
    """(N, total_bits) bool -> (N, words) uint32, LSB-first within a word."""
    n, total = bits.shape
    words = total // 32
    shaped = bits.reshape(n, words, 32).astype(np.uint32)
    weights = (np.uint32(1) << np.arange(32, dtype=np.uint32))
    return (shaped * weights[None, None, :]).sum(axis=-1, dtype=np.uint32)


@functools.partial(jax.jit, static_argnames=())
def _encode_device(vectors: jnp.ndarray, planes: jnp.ndarray,
                   offsets: jnp.ndarray) -> jnp.ndarray:
    """(N, D) f32 -> (N, words) uint32 packed sign bits (device).

    HIGHEST precision: sign bits near a hyperplane must not depend on
    whether a vector was sketched host-side (encode_np, full f32) or on
    device — same-collection sketches must be identical across an insert
    session and a reopen-rebuild (derived-index determinism invariant)."""
    proj = jnp.dot(vectors, planes, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    bits = (proj - offsets[None, :]) > 0.0
    n, total = bits.shape
    words = total // 32
    shaped = bits.reshape(n, words, 32).astype(jnp.uint32)
    weights = jnp.left_shift(jnp.uint32(1), jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(shaped * weights[None, None, :], axis=-1, dtype=jnp.uint32)


@functools.partial(jax.jit, static_argnames=("bits", "dims"))
def _encode_codes_jit(codes, planes, offsets, *, bits: int, dims: int):
    """Dequantize + project + pack-bits in ONE fused program so the f32
    dequant view stays a compiler transient, not a materialized array."""
    from ..ops import distance as dist_ops
    if bits in (32, 64):
        vecs = codes.astype(jnp.float32)
    elif bits == 4:
        # packed nibbles: interleave high/low planes back to (N, D)
        scale, offset = qz.affine_constants(4)
        h, l = dist_ops.split_nibbles(codes)
        n = codes.shape[0]
        vecs = jnp.stack([h, l], axis=-1).reshape(n, -1)[:, :dims]
        vecs = vecs.astype(jnp.float32) * scale + offset
    else:
        scale, offset = qz.affine_constants(bits)
        vecs = codes.astype(jnp.float32) * scale + offset
    return _encode_device(vecs, planes, offsets)


def hamming_candidates(qcodes: jnp.ndarray, db_hashes: jnp.ndarray,
                       valid: jnp.ndarray, budget: int, words: int):
    """Top-`budget` rows by Hamming distance of packed sketches.

    Measured head-to-head on v5e at 1M rows (tools_dev/r3_sweep.py): the
    XLA per-word accumulator loop beats the fused Pallas bf16 surface at
    Q=64 (10.2ms vs 13.4ms e2e) and ties it at Q=256 — approx_min_k's
    PartialReduce dominates either way — so XLA is the default and the
    kernel stays available for future profiling
    (_hamming_candidates_pallas)."""
    return _hamming_candidates_xla(qcodes, db_hashes, valid, budget, words)


@functools.partial(jax.jit,
                   static_argnames=("budget", "words", "block_n"))
def _hamming_candidates_pallas(qcodes, db_hashes, valid, budget: int,
                               words: int, block_n: int):
    """Fused bf16 surface -> approx_min_k, no intermediate materialization.

    The kernel emits Hamming distances directly as bf16 with invalid rows
    already pushed to 16384 (exact in bf16), so the selection consumes it
    with NO dtype conversion pass — the uint8 variant forced an (Q, N) f32
    conversion that wrote 4 bytes/entry to HBM before approx_min_k
    (profiled at 7.5 ms per 64q x 1M batch, tools_dev/profile_scan.py)."""
    from ..ops import pallas_hamming
    ham = pallas_hamming.hamming_scores_bf16(qcodes.astype(jnp.uint32),
                                             db_hashes, valid, words=words,
                                             block_n=block_n)
    vals, idx = jax.lax.approx_min_k(ham, budget, recall_target=0.95)
    return vals.astype(jnp.int32), idx


@functools.partial(jax.jit, static_argnames=("budget", "words"))
def _hamming_candidates_xla(qcodes: jnp.ndarray, db_hashes: jnp.ndarray,
                            valid: jnp.ndarray, budget: int, words: int):
    """XLA path: accumulates per word to avoid materializing (Q, N, words)."""
    q = qcodes.astype(jnp.uint32)
    n = db_hashes.shape[0]
    ham = jnp.zeros((q.shape[0], n), dtype=jnp.int32)
    for w in range(words):  # static, small (typically 5)
        x = jnp.bitwise_xor(q[:, w][:, None], db_hashes[None, :, w])
        ham = ham + jax.lax.population_count(x).astype(jnp.int32)
    big = jnp.int32(1 << 30)
    ham = jnp.where(valid[None, :], ham, big)
    # Large-k selection: TPU's hardware-accelerated approximate top-k
    # (PartialReduce) — an exact sort at k in the thousands is orders of
    # magnitude slower to run. The sketch stage is approximate by design,
    # so a 0.95 per-bucket recall target costs nothing measurable.
    if budget > 128:
        vals, idx = jax.lax.approx_min_k(ham.astype(jnp.float32), budget,
                                         recall_target=0.95)
        return vals.astype(jnp.int32), idx
    # indices-only: every production caller discards the values, and a live
    # top_k VALUES output makes the TPU lowering abandon its cheap
    # indices-only form (CLAUDE.md r3 fact; review finding r5).  Probes
    # that want distances can gather them from `ham` with the indices.
    _, idx = jax.lax.top_k(-ham, budget)
    return None, idx


# NOTE (r2, tools_dev/segrerank_probe.py): replacing the per-row candidate
# gather with segment-level selection + contiguous slab gathers (the trick
# that makes precision="high" fast) was measured and REJECTED for the sketch
# path: recall collapses to 0.44-0.73 at equal budget because Hamming
# neighborhoods do not cluster in row order — a winning segment drags
# SEG-1 useless rows along.  seg=16 at 2x budget merely ties row-gather.
# A sketch-sorted physical layout (rows ordered by sketch code so Hamming
# neighborhoods DO cluster in segments) was prototyped in round 3 and
# dropped before integration: it requires a physical-row indirection layer
# in ColumnStore, and the regime it would speed up (small serving batches)
# is transport-bound (~33 ms tunnel RTT) rather than gather-bound.  The
# r3.6 tile-alignment result (pallas_scan.make_lane_slab) cannot rescue
# per-ROW gathers either: a TPU tile spans >= 8 consecutive rows, so
# row-granular gathers are inherently sub-tile — only segment-slab
# layouts reach full DMA bandwidth, which is a structural argument for
# the exhaustive segment-min scan above the ANN crossover (BASELINE.md).


@functools.partial(jax.jit, static_argnames=("bits", "metric", "k",
                                             "with_counts"))
def rerank_topk(queries: jnp.ndarray, codes: jnp.ndarray, norms: jnp.ndarray,
                valid: jnp.ndarray, cand: jnp.ndarray, bits: int, metric: str,
                k: int, with_counts: bool = False):
    """Exact distances on gathered candidates, then top-k.

    queries (Q, D) f32; cand (Q, C) int32 rows into codes/norms.
    Returns (dist (Q, k) f32 ascending, rows (Q, k) int32); with
    with_counts=True appends nscored (Q,) int32 — the number of VALID
    candidates actually scored per query, the honest visited-points figure
    for PercentSearched (reference counts every visited point,
    collection.go:589; ours never visits filtered/invalid rows, so the
    scored-candidate count is the visited count).
    """
    from ..ops import distance as dist_ops
    ccodes = jnp.take(codes, cand, axis=0)        # (Q, C, D|P)
    cnorms = jnp.take(norms, cand, axis=0)        # (Q, C)
    cvalid = jnp.take(valid, cand, axis=0)        # (Q, C)
    if bits in (32, 64):
        # HIGHEST: the default TPU matmul is one bf16 pass on BOTH
        # operands (~2^-9 rel err on the codes) — "exact distances on
        # gathered candidates" must not ride it for wide codes (CLAUDE.md
        # invariant; review finding r5; matches the fused path's rerank)
        dots = jnp.einsum("qd,qcd->qc", queries, ccodes.astype(jnp.float32),
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    elif bits == 4:
        dots = dist_ops.packed4_dots_batched(queries, ccodes)
    else:
        scale, offset = qz.affine_constants(bits)
        if bits == 8:
            # 8-bit integer codes are bf16-exact: the fast dot is sound
            cast = dist_ops.fast_dot_dtype()
            raw = jnp.einsum("qd,qcd->qc", queries.astype(cast),
                             ccodes.astype(cast),
                             preferred_element_type=jnp.float32)
        else:
            # 16-bit codes exceed bf16's 8 significand bits: HIGHEST
            raw = jnp.einsum("qd,qcd->qc", queries,
                             ccodes.astype(jnp.float32),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
        qsum = jnp.sum(queries, axis=-1, keepdims=True)
        dots = scale * raw + offset * qsum
    if metric == "euclidean":
        qn = jnp.sum(queries * queries, axis=-1, keepdims=True)
        dist = jnp.sqrt(jnp.maximum(qn - 2.0 * dots + cnorms, 0.0))
    else:
        qn = jnp.sqrt(jnp.sum(queries * queries, axis=-1, keepdims=True))
        vn = jnp.sqrt(cnorms)
        denom = qn * vn
        cos = jnp.where(denom > 0.0, dots / jnp.where(denom > 0.0, denom, 1.0),
                        1.0)
        dist = jnp.arccos(jnp.clip(cos, -1.0, 1.0)) / jnp.pi
        dist = jnp.where((qn == 0.0) | (vn == 0.0), 1.0, dist)
    dist = jnp.where(cvalid, dist, jnp.inf)
    kk = min(k, dist.shape[1])
    if kk > 128:
        vals, pos = jax.lax.approx_min_k(dist, kk, recall_target=0.95)
        # approx_min_k returns ascending values already
        rows = jnp.take_along_axis(cand, pos, axis=1)
    else:
        neg, pos = jax.lax.top_k(-dist, kk)
        vals, rows = -neg, jnp.take_along_axis(cand, pos, axis=1)
    if with_counts:
        return vals, rows, jnp.sum(cvalid, axis=1).astype(jnp.int32)
    return vals, rows


class SignHashIndex:
    """Host-side wrapper owning the projection planes and calibration state."""

    def __init__(self, dims: int, metric: str, rng: MyRandom,
                 tables: int = DEFAULT_TABLES,
                 bits_per_table: int = DEFAULT_BITS_PER_TABLE):
        check_index_shape(tables, bits_per_table)
        self.dims = dims
        self.metric = metric
        self.tables = tables
        self.bits_per_table = bits_per_table
        self.total_bits = tables * bits_per_table
        self.words = self.total_bits // 32
        planes = rng.standard_normal((dims, self.total_bits))
        planes /= np.linalg.norm(planes, axis=0, keepdims=True)
        self.planes = np.float32(planes)
        self.offsets = np.zeros((self.total_bits,), dtype=np.float32)
        self.calibrated = metric != "euclidean"  # cosine: origin planes, done
        self._rng = rng

    # -- encoding ----------------------------------------------------------

    def encode_np(self, vectors: np.ndarray) -> np.ndarray:
        """Host path for single/few vectors at insert time."""
        v = np.atleast_2d(np.float32(vectors))
        proj = v @ self.planes
        return _pack_bits_np((proj - self.offsets[None, :]) > 0.0)

    def encode_batch(self, vectors_f32: np.ndarray) -> np.ndarray:
        """Device path for bulk (re)encoding; returns host uint32 array."""
        return np.asarray(self.encode_batch_device(vectors_f32))

    def encode_batch_device(self, vectors_f32) -> jnp.ndarray:
        """Bulk encode, result stays on device (device->host transfers can be
        orders of magnitude slower than compute on tunneled TPU setups)."""
        return _encode_device(jnp.asarray(vectors_f32, dtype=jnp.float32),
                              jnp.asarray(self.planes),
                              jnp.asarray(self.offsets))

    # rows per sketch-encode dispatch: bounds the f32 dequant intermediate
    # ((chunk, D) f32) — encoding a 16M-row capacity in one shot materializes
    # a 24GiB transient and OOMs a 16GB chip (seen at config5's 10M scale)
    ENCODE_CHUNK_ROWS = 1 << 20

    def encode_codes_device(self, device_codes, bits: int) -> jnp.ndarray:
        """Encode directly from the HBM-resident quantized codes: dequantize
        on device, project, pack — no float copy of the DB ever leaves HBM.
        Chunked on single-device placements to bound the f32 transient."""
        codes = jnp.asarray(device_codes)
        n = codes.shape[0]
        try:
            single = len(codes.devices()) == 1
        except Exception:
            single = True
        if single and n > self.ENCODE_CHUNK_ROWS:
            step = self.ENCODE_CHUNK_ROWS
            return jnp.concatenate(
                [self._encode_codes_block(codes[s:s + step], bits)
                 for s in range(0, n, step)], axis=0)
        return self._encode_codes_block(codes, bits)

    def _encode_codes_block(self, codes, bits: int) -> jnp.ndarray:
        return _encode_codes_jit(codes, jnp.asarray(self.planes),
                                 jnp.asarray(self.offsets), bits=bits,
                                 dims=self.dims)

    # -- calibration -------------------------------------------------------

    def calibrate(self, sample_vectors: np.ndarray) -> None:
        """Set per-plane offsets to the median projection of a data sample
        (euclidean only): balanced flat analog of lshtree.go's data-dependent
        split planes."""
        if self.metric != "euclidean":
            return
        proj = np.float32(np.atleast_2d(sample_vectors)) @ self.planes
        self.offsets = np.float32(np.median(proj, axis=0))
        self.calibrated = True
