"""Vector quantization codecs.

Behavioral parity with the reference codec (see /root/reference/quantization.go:5-36
and /root/reference/collection.go:713-811), re-designed for TPU execution:

* The reference quantizes one scalar at a time in Go; here quantization is a
  vectorized numpy transform on the host (ingest path) and the *device-resident*
  representation is chosen per bit-width so that the distance kernel can run the
  heavy contraction directly on the quantized codes on the MXU:

  - 4-bit  : codes in [0, 15]    -> device int8  (centered: c - 8)
  - 8-bit  : codes in [0, 255]   -> device int8  (centered: c - 128)
  - 16-bit : codes in [0, 65535] -> device int16 (centered: c - 32768)
  - 32-bit : raw float32
  - 64-bit : raw float64 host-side; float32 on device (TPU has no f64 ALU;
             the exact-precision path reranks on host in f64 when required)

  For the linearly quantized widths, dequantize(c) = scale * c_centered + offset
  with per-width constants (`affine_constants`), so
      dot(q, dequant(c)) = scale * dot(q, c_centered) + offset * sum(q)
  which lets the MXU contract integer codes directly and fix up with two scalars.

* Packing for *storage* (host disk format) matches the reference bit-for-bit:
  4-bit packs two dims per byte, HIGH nibble first (collection.go:727-731);
  8/16/32/64 are big-endian per element (collection.go:732-741).
"""

from __future__ import annotations

import numpy as np

VALID_QUANT_BITS = (4, 8, 16, 32, 64)

# Map value in [-1, 1] to [0, 2^bits - 1]; see quantization.go:12-22.
_MAXINT = {4: 15, 8: 255, 16: 65535}


def _check_bits(bits: int) -> None:
    if bits not in VALID_QUANT_BITS:
        raise ValueError(f"Unsupported quantization level: {bits}")


# ---------------------------------------------------------------------------
# Scalar-semantics codec (host / numpy, vectorized)
# ---------------------------------------------------------------------------

def quantize_np(values: np.ndarray, bits: int) -> np.ndarray:
    """Quantize float64 values -> uint64 codes, matching quantization.go:5-23.

    Rounding is half-away-from-zero (Go math.Round); since the mapped value is
    always >= 0 this is floor(x + 0.5).
    """
    _check_bits(bits)
    values = np.asarray(values, dtype=np.float64)
    if bits == 32:
        return np.float32(values).view(np.uint32).astype(np.uint64)
    if bits == 64:
        return values.view(np.uint64).copy()
    maxint = _MAXINT[bits]
    clamped = np.clip(values, -1.0, 1.0)
    mapped = (clamped + 1.0) / 2.0 * maxint
    return np.floor(mapped + 0.5).astype(np.uint64)


def dequantize_np(codes: np.ndarray, bits: int) -> np.ndarray:
    """Inverse map, matching quantization.go:25-36 (float64 out)."""
    _check_bits(bits)
    codes = np.asarray(codes, dtype=np.uint64)
    if bits == 32:
        return codes.astype(np.uint32).view(np.float32).astype(np.float64)
    if bits == 64:
        return codes.view(np.float64).copy()
    maxint = _MAXINT[bits]
    return (codes.astype(np.float64) / maxint) * 2.0 - 1.0


# ---------------------------------------------------------------------------
# Storage packing (reference-compatible byte layout, collection.go:713-811)
# ---------------------------------------------------------------------------

def vector_byte_size(bits: int, dims: int) -> int:
    """Bytes per stored vector; matches getVectorSize (collection.go:796-811)."""
    _check_bits(bits)
    if bits == 4:
        return (dims + 1) // 2
    return dims * (bits // 8)


def pack_vector(vector: np.ndarray, bits: int) -> bytes:
    """Encode one float64 vector into the storage byte layout."""
    _check_bits(bits)
    vector = np.asarray(vector, dtype=np.float64)
    codes = quantize_np(vector, bits)
    if bits == 4:
        n = codes.shape[0]
        padded = np.zeros(n + (n % 2), dtype=np.uint8)
        padded[:n] = codes.astype(np.uint8)
        # two dims per byte, high nibble first (collection.go:727-731)
        return ((padded[0::2] << 4) | (padded[1::2] & 0x0F)).tobytes()
    if bits == 8:
        return codes.astype(np.uint8).tobytes()
    if bits == 16:
        return codes.astype(np.uint16).astype(">u2").tobytes()
    if bits == 32:
        return codes.astype(np.uint32).astype(">u4").tobytes()
    return codes.astype(">u8").tobytes()


def pack_vectors(vectors: np.ndarray, bits: int) -> np.ndarray:
    """Vectorized pack of (N, D) float64 -> (N, vector_byte_size) uint8."""
    _check_bits(bits)
    vectors = np.atleast_2d(np.asarray(vectors))
    n, dims = vectors.shape
    if n > _CHUNK_ROWS:
        out = np.empty((n, vector_byte_size(bits, dims)), dtype=np.uint8)
        for s in range(0, n, _CHUNK_ROWS):
            out[s:s + _CHUNK_ROWS] = pack_vectors(vectors[s:s + _CHUNK_ROWS],
                                                  bits)
        return out
    vectors = np.asarray(vectors, dtype=np.float64)
    codes = quantize_np(vectors, bits)
    if bits == 4:
        padded = np.zeros((n, dims + (dims % 2)), dtype=np.uint8)
        padded[:, :dims] = codes.astype(np.uint8)
        return (padded[:, 0::2] << 4) | (padded[:, 1::2] & 0x0F)
    if bits == 8:
        return codes.astype(np.uint8)
    if bits == 16:
        return codes.astype(np.uint16).astype(">u2").view(np.uint8).reshape(n, -1)
    if bits == 32:
        return codes.astype(np.uint32).astype(">u4").view(np.uint8).reshape(n, -1)
    return codes.astype(">u8").view(np.uint8).reshape(n, -1)


def unpack_vector(data: bytes, dims: int, bits: int) -> np.ndarray:
    """Decode storage bytes back to float64; matches decodeVector (collection.go:768-794)."""
    _check_bits(bits)
    if bits == 4:
        raw = np.frombuffer(data, dtype=np.uint8, count=(dims + 1) // 2)
        codes = np.empty(dims, dtype=np.uint64)
        codes[0::2] = (raw >> 4)[: (dims + 1) // 2]
        if dims > 1:
            codes[1::2] = (raw & 0x0F)[: dims // 2]
        return dequantize_np(codes, 4)
    if bits == 8:
        codes = np.frombuffer(data, dtype=np.uint8, count=dims).astype(np.uint64)
    elif bits == 16:
        codes = np.frombuffer(data, dtype=">u2", count=dims).astype(np.uint64)
    elif bits == 32:
        codes = np.frombuffer(data, dtype=">u4", count=dims).astype(np.uint64)
    else:
        codes = np.frombuffer(data, dtype=">u8", count=dims).astype(np.uint64)
    return dequantize_np(codes, bits)


def packed_to_host_repr(packed: np.ndarray, dims: int, bits: int,
                        consume: bool = False) -> np.ndarray:
    """Storage bytes (N, vector_byte_size) -> host column codes, directly.

    The packed bytes already ARE the quantized codes (big-endian / nibble
    layout), so the replay path converts with byte-level transforms instead
    of the dequantize->requantize f64 round trip (reopen at 500k x 384 was
    2.3x slower than the initial load because of that round trip).  Output
    is bit-identical to codes_to_host_repr(unpack_vectors(packed)) — the
    reference dequant/quantize pair is the identity on in-range codes;
    pinned by tests/test_quantize.py::test_packed_to_host_repr_parity.

    consume=True lets 4/8-bit transform the input array in place (the
    caller hands over ownership) — at 10M x 384 the fresh copy is a 3.8 GB
    allocation whose first-touch page faults dominate on this host."""
    _check_bits(bits)
    packed = np.atleast_2d(np.asarray(packed, dtype=np.uint8))
    n = packed.shape[0]
    if bits == 4:
        # packed nibbles ARE the device repr
        return packed if consume else packed.copy()
    if bits == 8:
        # unsigned code - 128 == flip the top bit, reread signed
        if consume:
            packed ^= 0x80
            return packed.view(np.int8)
        return (packed ^ 0x80).view(np.int8)
    if bits == 16:
        q = packed.view(">u2").astype(np.uint16)
        return (q ^ 0x8000).view(np.int16)
    if bits == 32:
        return packed.view(">u4").astype(np.uint32).view(np.float32)
    return packed.view(">u8").astype(np.uint64).view(np.float64)


def unpack_vectors(data: np.ndarray, dims: int, bits: int) -> np.ndarray:
    """Vectorized decode of (N, vector_byte_size) uint8 -> (N, D) float64."""
    _check_bits(bits)
    data = np.atleast_2d(np.asarray(data, dtype=np.uint8))
    n = data.shape[0]
    if bits == 4:
        codes = np.empty((n, dims), dtype=np.uint64)
        codes[:, 0::2] = (data >> 4)[:, : (dims + 1) // 2]
        if dims > 1:
            codes[:, 1::2] = (data & 0x0F)[:, : dims // 2]
        return dequantize_np(codes, 4)
    if bits == 8:
        codes = data.astype(np.uint64)
    elif bits == 16:
        codes = data.view(">u2").astype(np.uint64)
    elif bits == 32:
        codes = data.view(">u4").astype(np.uint64)
    else:
        codes = data.view(">u8").astype(np.uint64)
    return dequantize_np(codes, bits)


def quantization_roundtrip(vectors: np.ndarray, bits: int) -> np.ndarray:
    """float64 (N, D) -> quantize -> dequantize, the values the DB 'sees'."""
    return dequantize_np(quantize_np(vectors, bits), bits)


# ---------------------------------------------------------------------------
# Device representation
# ---------------------------------------------------------------------------

def affine_constants(bits: int) -> tuple[float, float]:
    """(scale, offset) such that dequant(value) = scale * centered_code + offset.

    Centered codes subtract half the code range so they fit the signed device
    dtype; the offset absorbs the shift:
        v = (c / maxint) * 2 - 1,  c = c' + half
          = (2/maxint) * c' + (2*half/maxint - 1)
    """
    if bits not in (4, 8, 16):
        raise ValueError("affine constants only apply to 4/8/16-bit quantization")
    maxint = _MAXINT[bits]
    half = (maxint + 1) // 2
    scale = 2.0 / maxint
    offset = 2.0 * half / maxint - 1.0
    return scale, offset


def device_dtype(bits: int):
    # 4-bit codes live PACKED in HBM: two dims per uint8 byte, high nibble
    # first — the same layout as the disk format — and are unpacked in-kernel
    # (ops/distance.packed4_* and the Pallas kernels), halving 4-bit scan
    # traffic vs one-byte-per-dim storage.
    return {4: np.uint8, 8: np.int8, 16: np.int16, 32: np.float32,
            64: np.float32}[bits]


def device_width(bits: int, dims: int) -> int:
    """Columns per row of the device code array."""
    return (dims + 1) // 2 if bits == 4 else dims


def host_dtype(bits: int):
    """Dtype of the HOST-side column store.  Identical to the device dtype
    except 64-bit, which keeps full f64 host-side (the TPU has no f64 ALU,
    so the upload downcasts to f32; precision="exact" reranks against the
    host f64 copy for reference-parity at every scale)."""
    return np.float64 if bits == 64 else device_dtype(bits)


def codes_to_host_repr(vectors: np.ndarray, bits: int) -> np.ndarray:
    """float64 (N, D) -> the host column-store representation (see
    host_dtype); equals codes_to_device_repr except 64-bit stays f64."""
    if bits == 64:
        return np.array(np.atleast_2d(vectors), dtype=np.float64)
    return codes_to_device_repr(vectors, bits)


# Bulk host transforms run chunked: on sandboxed single-core hosts first-touch
# page faults dominate, so reusing a small working set beats one giant pass.
_CHUNK_ROWS = 16384


def codes_to_device_repr(vectors: np.ndarray, bits: int) -> np.ndarray:
    """float64 (N, D) -> the array uploaded to HBM.

    4-bit: packed nibbles, two dims per uint8 byte high-nibble-first —
    identical to the disk layout (collection.go:727-731), so 4-bit HBM
    traffic is the same ~D/2 bytes/row the reference reads from disk.
    8/16-bit: centered int codes.  32/64-bit: f32."""
    _check_bits(bits)
    vectors = np.atleast_2d(np.asarray(vectors))
    if bits in (32, 64):
        # 64-bit keeps f64 exactness on the host; device computes in f32.
        return np.asarray(vectors, dtype=np.float32)
    if bits == 4:
        return pack_vectors(vectors, 4)
    n = vectors.shape[0]
    half = (_MAXINT[bits] + 1) // 2
    out = np.empty(vectors.shape, dtype=device_dtype(bits))
    for s in range(0, n, _CHUNK_ROWS):
        chunk = np.asarray(vectors[s:s + _CHUNK_ROWS], dtype=np.float64)
        codes = quantize_np(chunk, bits)
        out[s:s + _CHUNK_ROWS] = (codes.astype(np.int64) - half).astype(
            device_dtype(bits))
    return out


def device_repr_to_float(device_codes: np.ndarray, bits: int,
                         dims: int | None = None) -> np.ndarray:
    """Decode the device representation back to the dequantized float values.

    `dims` is required for 4-bit (the packed width can't distinguish an odd
    dimension count from the next even one).

    8/16-bit decode reconstructs the unsigned codes and applies the
    REFERENCE dequant formula (codes/maxint*2-1, quantization.go:25-36) —
    the centered-affine form (scale*c'+offset) differs by one f64 ulp for
    some codes, and the host exact paths must be bit-identical to the
    reference's f64 math."""
    _check_bits(bits)
    if bits in (32, 64):
        return np.asarray(device_codes, dtype=np.float64)
    if bits == 4:
        if dims is None:
            raise ValueError("dims is required to decode packed 4-bit codes")
        return unpack_vectors(np.atleast_2d(device_codes), dims, 4)
    half = (_MAXINT[bits] + 1) // 2
    codes = np.asarray(device_codes, dtype=np.int64) + half
    return dequantize_np(codes.astype(np.uint64), bits)
