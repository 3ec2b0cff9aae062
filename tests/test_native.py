"""Native C++ host-kernel tests (native/sdr_kernels.cpp via ctypes):
bit-unpacker equivalence against the NumPy reference paths and Viterbi
correctness + speed sanity (the libswiftcnav/volk analog layer)."""

import numpy as np
import pytest

from gnss_sdr_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


def _numpy_unpack_2bit(b):
    b = b.astype(np.uint8)
    out = np.empty((b.size, 4), dtype=np.int8)
    for k in range(4):
        v = (b >> (2 * k)) & 0x3
        out[:, k] = np.where(v >= 2, v.astype(np.int16) - 4, v).astype(np.int8)
    return out.reshape(-1)


def _numpy_unpack_4bit(b):
    b = b.astype(np.uint8)
    out = np.empty((b.size, 2), dtype=np.int8)
    for k in range(2):
        v = (b >> (4 * k)) & 0xF
        out[:, k] = np.where(v >= 8, v.astype(np.int16) - 16, v).astype(np.int8)
    return out.reshape(-1)


def test_unpackers_match_numpy():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, 4096).astype(np.uint8)
    assert np.array_equal(native.unpack_2bit(raw), _numpy_unpack_2bit(raw))
    assert np.array_equal(native.unpack_4bit(raw), _numpy_unpack_4bit(raw))


def test_viterbi_decodes_noisy_stream():
    from gnss_sdr_tpu.telemetry.fec import conv_encode

    rng = np.random.default_rng(1)
    bits = np.concatenate([rng.integers(0, 2, 500), np.zeros(6, np.int64)])
    for invert in (False, True):
        sym = 1.0 - 2.0 * conv_encode(bits, invert_g2=invert).astype(float)
        noisy = sym + rng.normal(scale=0.45, size=len(sym))
        out = native.viterbi27(noisy, invert, 0, 0)
        assert np.array_equal(out, bits.astype(np.uint8))


def test_viterbi_free_boundaries():
    from gnss_sdr_tpu.telemetry.fec import conv_encode

    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 400)
    sym = 1.0 - 2.0 * conv_encode(bits, invert_g2=False).astype(float)
    noisy = sym + rng.normal(scale=0.3, size=len(sym))
    out = native.viterbi27(noisy, False, None, None)
    # free boundaries: interior must match exactly (edges may differ)
    assert np.array_equal(out[32:-32], bits[32:-32].astype(np.uint8))


def test_fec_dispatch_uses_native():
    """telemetry.fec.viterbi_decode routes through the native kernel and
    still decodes the Galileo-convention stream."""
    from gnss_sdr_tpu.telemetry.fec import conv_encode, viterbi_decode

    rng = np.random.default_rng(3)
    bits = np.concatenate([rng.integers(0, 2, 114), np.zeros(6, np.int64)])
    sym = conv_encode(bits, invert_g2=True)
    out = viterbi_decode(sym, invert_g2=True)
    assert np.array_equal(out, bits.astype(np.uint8))
