"""Signal source + sample-format tests.

Mirrors the reference's file-source unit tests
(tests/unit-tests/signal-processing-blocks/sources/ and the unpack_* blocks):
round-trip every sample format, file offset/budget semantics, valve limits.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.io import (
    ArraySignalSource,
    FileMeta,
    FileSignalSource,
    MultichannelFileSignalSource,
    Valve,
    bytes_per_sample,
    decode_samples,
    encode_samples,
    item_format_names,
)


RNG = np.random.default_rng(7)


def _roundtrip(fmt, n=64):
    if fmt.startswith("2bit"):
        q = 0j if fmt.endswith("_real") else 1j * RNG.integers(-2, 2, size=n)
        vals = RNG.integers(-2, 2, size=n) + q
    elif fmt.startswith("4bit"):
        q = 0j if fmt.endswith("_real") else 1j * RNG.integers(-8, 8, size=n)
        vals = RNG.integers(-8, 8, size=n) + q
    elif fmt in ("byte", "short", "float"):
        vals = (RNG.integers(-100, 100, size=n) + 0j).astype(np.complex64)
    elif fmt == "gr_complex":
        vals = (RNG.normal(size=n) + 1j * RNG.normal(size=n)).astype(np.complex64)
    elif fmt == "spir_1bit":
        vals = RNG.choice([-1, 1], size=n) + 1j * RNG.choice([-1, 1], size=n)
    elif fmt == "gss6450_2bit":
        vals = RNG.integers(-2, 2, size=n) + 1j * RNG.integers(-2, 2, size=n)
    elif fmt == "gss6450_4bit":
        vals = RNG.integers(-8, 8, size=n) + 1j * RNG.integers(-8, 8, size=n)
    elif fmt == "ntlab_2bit":
        vals = RNG.choice([-3.0, -1.0, 1.0, 3.0], size=n) + 0j
    else:
        vals = RNG.integers(-100, 100, size=n) + 1j * RNG.integers(-100, 100, size=n)
    vals = vals.astype(np.complex64)
    raw = encode_samples(vals, fmt)
    out = decode_samples(raw, fmt)
    return vals, out


@pytest.mark.parametrize("fmt", item_format_names())
def test_format_roundtrip(fmt):
    vals, out = _roundtrip(fmt)
    assert len(out) >= len(vals)
    np.testing.assert_allclose(out[: len(vals)], vals, atol=1e-5)


@pytest.mark.parametrize("fmt", item_format_names())
def test_bytes_per_sample_consistent(fmt):
    vals, _ = _roundtrip(fmt, n=32)
    raw = encode_samples(vals, fmt)
    assert len(raw) == int(np.ceil(32 * bytes_per_sample(fmt)))


def test_file_source_stream(tmp_path):
    vals = (RNG.integers(-100, 100, size=1000)
            + 1j * RNG.integers(-100, 100, size=1000)).astype(np.complex64)
    p = tmp_path / "cap.dat"
    p.write_bytes(encode_samples(vals, "ibyte"))

    src = FileSignalSource(FileMeta(str(p), format="ibyte", fs=1e6))
    chunks = []
    while not src.exhausted():
        c = src.read(256)
        if not len(c):
            break
        chunks.append(c)
    out = np.concatenate(chunks)
    np.testing.assert_allclose(out, vals, atol=1e-6)
    assert src.samples_read == 1000


def test_file_source_offset_and_budget(tmp_path):
    vals = np.arange(100, dtype=np.float32) + 0j
    p = tmp_path / "cap.dat"
    p.write_bytes(encode_samples(vals.astype(np.complex64), "gr_complex"))
    # skip 10 samples (80 bytes), budget 50 samples
    src = FileSignalSource(
        FileMeta(str(p), format="gr_complex", fs=1e6,
                 offset_bytes=80, total_samples=50)
    )
    out = src.read(1000)
    assert len(out) == 50
    np.testing.assert_allclose(out.real, np.arange(10, 60))
    assert src.exhausted()


def test_file_source_repeat(tmp_path):
    vals = (np.arange(8) + 0j).astype(np.complex64)
    p = tmp_path / "cap.dat"
    p.write_bytes(encode_samples(vals, "gr_complex"))
    src = FileSignalSource(
        FileMeta(str(p), format="gr_complex", fs=1e6,
                 total_samples=20, repeat=True)
    )
    out = src.read(20)
    np.testing.assert_allclose(out.real, np.arange(20) % 8)


def test_multichannel_lockstep(tmp_path):
    a = (np.arange(50) + 0j).astype(np.complex64)
    b = (np.arange(50) * 2 + 0j).astype(np.complex64)
    pa, pb = tmp_path / "a.dat", tmp_path / "b.dat"
    pa.write_bytes(encode_samples(a, "gr_complex"))
    pb.write_bytes(encode_samples(b, "gr_complex"))
    src = MultichannelFileSignalSource(
        [FileMeta(str(pa), "gr_complex", 1e6), FileMeta(str(pb), "gr_complex", 1e6)]
    )
    assert src.get_rf_channels() == 2
    out = src.read(30)
    assert out.shape == (2, 30)
    np.testing.assert_allclose(out[1].real, 2 * out[0].real)


def test_valve_budget():
    v = Valve(total_samples=10)
    a = v.apply(np.ones(7, dtype=np.complex64))
    b = v.apply(np.ones(7, dtype=np.complex64))
    c = v.apply(np.ones(7, dtype=np.complex64))
    assert (len(a), len(b), len(c)) == (7, 3, 0)
    assert v.done


def test_array_source():
    x = (RNG.normal(size=32) + 0j).astype(np.complex64)
    src = ArraySignalSource(x, fs=1e6)
    assert len(src.read(20)) == 20
    assert len(src.read(20)) == 12
    assert src.exhausted()
