"""Golden tests for the quantization codec against scalar ports of the
reference formulas (quantization.go:5-36, collection.go:713-811)."""

import math
import struct

import numpy as np
import pytest

from syzgydb_tpu.ops import quantize as qz


def go_quantize(value: float, bits: int) -> int:
    """Literal scalar port of quantization.go:5-23 used as the oracle."""
    if bits == 32:
        return struct.unpack("<I", struct.pack("<f", value))[0]
    if bits == 64:
        return struct.unpack("<Q", struct.pack("<d", value))[0]
    value = max(-1.0, min(1.0, value))
    maxint = (1 << bits) - 1
    q = (value + 1) / 2 * maxint
    # Go math.Round: half away from zero (q >= 0 here)
    return int(math.floor(q + 0.5))


def go_dequantize(code: int, bits: int) -> float:
    if bits == 32:
        return struct.unpack("<f", struct.pack("<I", code))[0]
    if bits == 64:
        return struct.unpack("<d", struct.pack("<Q", code))[0]
    maxint = (1 << bits) - 1
    return (code / maxint) * 2 - 1


@pytest.mark.parametrize("bits", [4, 8, 16, 32, 64])
def test_quantize_matches_scalar_oracle(bits, rng):
    vals = np.concatenate([
        rng.uniform(-1.5, 1.5, size=200),
        np.array([-1.0, 1.0, 0.0, -0.5, 0.5, 1e-9, -1e-9, 2.0, -2.0]),
    ])
    got = qz.quantize_np(vals, bits)
    want = np.array([go_quantize(float(v), bits) for v in vals], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("bits", [4, 8, 16, 32, 64])
def test_dequantize_matches_scalar_oracle(bits, rng):
    vals = rng.uniform(-1.0, 1.0, size=100)
    codes = qz.quantize_np(vals, bits)
    got = qz.dequantize_np(codes, bits)
    want = np.array([go_dequantize(int(c), bits) for c in codes])
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


@pytest.mark.parametrize("bits", [4, 8, 16, 32, 64])
@pytest.mark.parametrize("dims", [1, 2, 3, 7, 128])
def test_pack_unpack_roundtrip(bits, dims, rng):
    vec = rng.uniform(-1, 1, size=dims)
    data = qz.pack_vector(vec, bits)
    assert len(data) == qz.vector_byte_size(bits, dims)
    out = qz.unpack_vector(data, dims, bits)
    want = qz.quantization_roundtrip(vec, bits)
    np.testing.assert_array_equal(out, want)


def test_4bit_nibble_order():
    """Two dims per byte, HIGH nibble first (collection.go:727-731)."""
    # values chosen so codes are distinct: code(v) = round((v+1)/2*15)
    vec = np.array([1.0, -1.0])  # codes 15, 0
    data = qz.pack_vector(vec, 4)
    assert data == bytes([0xF0])
    vec2 = np.array([-1.0, 1.0])  # codes 0, 15
    assert qz.pack_vector(vec2, 4) == bytes([0x0F])


def test_16bit_big_endian():
    vec = np.array([1.0])  # code 65535
    assert qz.pack_vector(vec, 16) == b"\xff\xff"
    vec = np.array([-1.0])  # code 0
    assert qz.pack_vector(vec, 16) == b"\x00\x00"


def test_64bit_lossless():
    vec = np.array([0.12345678901234567, -0.9876543210987654, 3.14159])
    out = qz.unpack_vector(qz.pack_vector(vec, 64), 3, 64)
    np.testing.assert_array_equal(out, vec)


def test_32bit_is_float32_cast():
    vec = np.array([0.1, -0.2, 1.5])
    out = qz.unpack_vector(qz.pack_vector(vec, 32), 3, 32)
    np.testing.assert_array_equal(out, np.float64(np.float32(vec)))


@pytest.mark.parametrize("bits", [4, 8, 16])
def test_device_repr_affine_decode(bits, rng):
    """Centered device codes + affine constants reproduce dequantize exactly."""
    vecs = rng.uniform(-1.2, 1.2, size=(50, 16))
    dev = qz.codes_to_device_repr(vecs, bits)
    assert dev.dtype == qz.device_dtype(bits)
    assert dev.shape[1] == qz.device_width(bits, 16)  # 4-bit: packed
    decoded = qz.device_repr_to_float(dev, bits, 16)
    want = qz.quantization_roundtrip(vecs, bits)
    np.testing.assert_allclose(decoded, want, rtol=0, atol=1e-15)


def test_invalid_bits_rejected():
    with pytest.raises(ValueError):
        qz.quantize_np(np.zeros(3), 12)


@pytest.mark.parametrize("bits", [4, 8, 16, 32, 64])
@pytest.mark.parametrize("dims", [16, 17])  # odd dims: 4-bit pad nibble
def test_ingest_reprs_parity(bits, dims, rng):
    """The fused ingest transform must be BIT-identical to the unfused
    pack_vectors + codes_to_host_repr + db_row_stats calls at every width
    (the norms feed the provable-exactness margins; the packed bytes are
    the golden storage format)."""
    from syzgydb_tpu.ops import distance as dist_ops
    vecs = rng.uniform(-1.3, 1.3, size=(257, dims))  # incl. clamped values
    vecs[0, :] = 0.0
    vecs[1, 0] = 1.0 if bits != 64 else 3.5
    packed, host, norms = dist_ops.ingest_reprs(vecs, bits)
    np.testing.assert_array_equal(packed, qz.pack_vectors(vecs, bits))
    want_host = qz.codes_to_host_repr(vecs, bits)
    assert host.dtype == want_host.dtype
    np.testing.assert_array_equal(host, want_host)
    np.testing.assert_array_equal(
        norms, dist_ops.db_row_stats(want_host, bits, dims))


@pytest.mark.parametrize("bits", [4, 8, 16, 32, 64])
@pytest.mark.parametrize("dims", [16, 17])
def test_packed_to_host_repr_parity(bits, dims, rng):
    """The replay path's direct bytes->codes transform must be bit-identical
    to the old unpack (f64 dequant) -> codes_to_host_repr (requantize)
    round trip."""
    vecs = rng.uniform(-1.3, 1.3, size=(65, dims))
    vecs[0, :] = 0.0
    packed = qz.pack_vectors(vecs, bits)
    got = qz.packed_to_host_repr(packed, dims, bits)
    want = qz.codes_to_host_repr(
        qz.unpack_vectors(packed, dims, bits), bits)
    assert got.dtype == want.dtype and got.shape == want.shape
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("bits", [4, 8])
def test_packed_to_host_repr_consume(bits, rng):
    """consume=True (replay hands over ownership) must give the same codes
    as the copying path."""
    vecs = rng.uniform(-1.2, 1.2, size=(33, 16))
    packed = qz.pack_vectors(vecs, bits)
    want = qz.packed_to_host_repr(packed.copy(), 16, bits)
    got = qz.packed_to_host_repr(packed, 16, bits, consume=True)
    np.testing.assert_array_equal(got, want)
    assert got.base is packed or got is packed  # in place, no fresh copy
