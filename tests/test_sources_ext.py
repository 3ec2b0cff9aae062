"""Extended signal sources: SPIR / GSS6450 / NTLab packed formats, LabSat
LS3 files, rtl_tcp client, ZMQ subscriber, ION GSMS metadata captures,
Raw_Array + beamformer, SignalGenerator source.

Reference analogs: unpack_intspir_1bit_samples.cc,
unpack_spir_gss6450_samples.cc, unpack_ntlab_2bit_samples.cc,
labsat23_source.cc, rtl_tcp_signal_source_c.cc, zmq_signal_source.cc,
ion_gsms.cc, beamformer.cc, signal_generator_c.cc.
"""

import socket
import struct
import threading
import time

import numpy as np
import pytest

from gnss_sdr_tpu.config.configuration import InMemoryConfiguration
from gnss_sdr_tpu.io import decode_samples, encode_samples
from gnss_sdr_tpu.receiver.factory import get_signal_conditioner, get_signal_source


# ------------------------------------------------------------ packed formats
def test_spir_1bit_roundtrip():
    rng = np.random.default_rng(0)
    x = (rng.choice([-1, 1], 64) + 1j * rng.choice([-1, 1], 64)).astype(np.complex64)
    assert np.array_equal(decode_samples(encode_samples(x, "spir_1bit"),
                                         "spir_1bit"), x)


@pytest.mark.parametrize("fmt,lo,hi", [("gss6450_2bit", -2, 1),
                                       ("gss6450_4bit", -8, 7)])
def test_gss6450_roundtrip(fmt, lo, hi):
    rng = np.random.default_rng(1)
    x = (rng.integers(lo, hi + 1, 96) + 1j * rng.integers(lo, hi + 1, 96)
         ).astype(np.complex64)
    got = decode_samples(encode_samples(x, fmt), fmt)
    assert np.array_equal(got, x)


def test_gss6450_time_order():
    # first sample in time must come from the HIGH bits of the word
    x = np.array([1 + 1j, -1 - 1j, 1 - 1j, -1 + 1j] * 2, dtype=np.complex64)
    raw = encode_samples(x, "gss6450_2bit")
    w = np.frombuffer(raw, np.uint32)[0]
    # sample 0 I sits at bits 28-29
    i0 = (w >> 28) & 3
    assert i0 == 1  # +1 two's complement in 2 bits


def test_ntlab_2bit_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.choice([-3.0, -1.0, 1.0, 3.0], 64).astype(np.float32)
    got = decode_samples(encode_samples(x, "ntlab_2bit"), "ntlab_2bit")
    assert np.array_equal(got.real, x)
    assert np.all(got.imag == 0)


# ------------------------------------------------------------------- LabSat
def test_labsat_ls3_roundtrip(tmp_path):
    from gnss_sdr_tpu.io import LabsatSignalSource, encode_labsat_file

    rng = np.random.default_rng(3)
    for bits, levels in ((2, [-1, 1]), (4, [-2, -1, 1, 2])):
        x = (rng.choice(levels, 160) + 1j * rng.choice(levels, 160)
             ).astype(np.complex64)
        f = tmp_path / f"cap_{bits}.ls3"
        f.write_bytes(encode_labsat_file(x, bits_per_sample=bits))
        src = LabsatSignalSource(str(f), fs=16.368e6)
        assert src.header["version"] == 3
        got = np.concatenate([src.read(100), src.read(100)])
        if bits == 2:
            # 1-bit I/Q: signs survive
            assert np.array_equal(np.sign(got.real), np.sign(x.real))
            assert np.array_equal(np.sign(got.imag), np.sign(x.imag))
        else:
            assert np.array_equal(got, x)
        src.close()


def test_labsat_rejects_garbage(tmp_path):
    from gnss_sdr_tpu.io import LabsatSignalSource

    f = tmp_path / "bad.ls3"
    f.write_bytes(b"\xff" * 2048)
    with pytest.raises(ValueError):
        LabsatSignalSource(str(f))


# ------------------------------------------------------------------ rtl_tcp
def _fake_rtl_tcp_server(port_holder, stop, samples: np.ndarray):
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port_holder.append(srv.getsockname()[1])
    srv.settimeout(5.0)
    conn, _ = srv.accept()
    conn.sendall(b"RTL0" + struct.pack(">II", 5, 29))
    # drain command messages in the background
    conn.settimeout(0.2)
    u8 = np.empty(2 * samples.size, np.uint8)
    u8[0::2] = np.clip(np.round(samples.real * 128 + 127.4), 0, 255)
    u8[1::2] = np.clip(np.round(samples.imag * 128 + 127.4), 0, 255)
    payload = u8.tobytes()
    sent = 0
    while sent < len(payload) and not stop.is_set():
        try:
            conn.recv(4096)
        except socket.timeout:
            pass
        except OSError:
            break
        try:
            sent += conn.send(payload[sent:sent + 65536])
        except OSError:
            break
    time.sleep(0.2)
    conn.close()
    srv.close()


def test_rtl_tcp_source():
    from gnss_sdr_tpu.io import RtlTcpSignalSource

    rng = np.random.default_rng(4)
    truth = ((rng.integers(0, 256, 4096) - 127.4)
             + 1j * (rng.integers(0, 256, 4096) - 127.4)).astype(np.complex64) / 128.0
    holder, stop = [], threading.Event()
    th = threading.Thread(target=_fake_rtl_tcp_server,
                          args=(holder, stop, truth), daemon=True)
    th.start()
    for _ in range(100):
        if holder:
            break
        time.sleep(0.01)
    src = RtlTcpSignalSource("127.0.0.1", holder[0], fs=2e6,
                             freq_hz=1575420000, gain_db=30.0)
    assert src.tuner_type == 5
    got = src.read(4096)
    assert np.allclose(got, truth, atol=1e-5)
    src.close()
    stop.set()


# ---------------------------------------------------------------------- ZMQ
def test_zmq_source():
    zmq = pytest.importorskip("zmq")
    from gnss_sdr_tpu.io import ZmqSignalSource

    ctx = zmq.Context.instance()
    pub = ctx.socket(zmq.PUB)
    port = pub.bind_to_random_port("tcp://127.0.0.1")
    src = ZmqSignalSource(f"tcp://127.0.0.1:{port}", fmt="gr_complex",
                          fs=4e6, timeout_ms=2000)
    time.sleep(0.3)  # let SUB connect
    rng = np.random.default_rng(5)
    truth = (rng.normal(size=1024) + 1j * rng.normal(size=1024)
             ).astype(np.complex64)
    # send in two messages, split off a partial sample boundary
    raw = truth.tobytes()
    pub.send(raw[:4000])
    pub.send(raw[4000:])
    got = src.read(1024)
    assert np.array_equal(got, truth)
    src.close()
    pub.close(0)


# ------------------------------------------------------------------ ION GSMS
def test_ion_gsms_source(tmp_path):
    from gnss_sdr_tpu.io import IonGsmsSignalSource

    rng = np.random.default_rng(6)
    x = (rng.integers(-128, 128, 512) + 1j * rng.integers(-128, 128, 512)
         ).astype(np.complex64)
    (tmp_path / "cap.bin").write_bytes(encode_samples(x, "ibyte"))
    (tmp_path / "cap.sdrx").write_text("""<?xml version="1.0"?>
<metadata xmlns="http://www.ion.org/XMLSchema/GnssMetadata.xsd">
  <file><url>cap.bin</url><lane>L1</lane></file>
  <lane id="L1">
    <block>
      <chunk sizeword="1" countwords="2">
        <lump><stream id="S1">
          <ratefactor>1</ratefactor>
          <quantization>8</quantization>
          <encoding>INT8</encoding>
          <format>IQ</format>
        </stream></lump>
      </chunk>
    </block>
  </lane>
  <rate>4000000</rate>
</metadata>""")
    src = IonGsmsSignalSource(tmp_path / "cap.sdrx")
    assert src.fs == 4e6
    got = np.concatenate([src.read(300), src.read(300)])
    assert np.array_equal(got, x)


# --------------------------------------------------------------- beamformer
def test_beamformer_gain():
    from gnss_sdr_tpu.conditioner import Beamformer, steering_weights

    n, t = 4, 2048
    rng = np.random.default_rng(7)
    sig = (rng.normal(size=t) + 1j * rng.normal(size=t)).astype(np.complex64)
    w = steering_weights(n, 0.5, 20.0)
    # array response for a plane wave from 20 deg = conj of the weights
    elements = np.stack([sig * np.conj(w[k]) * np.sqrt(n) for k in range(n)])
    noise = (rng.normal(size=(n, t)) + 1j * rng.normal(size=(n, t))
             ).astype(np.complex64)
    bf = Beamformer(w)
    y = bf.process(elements + noise)
    # coherent combining: signal power x N, noise power x 1
    corr = np.vdot(sig, y) / (np.linalg.norm(sig) * np.linalg.norm(y))
    assert abs(corr) > 0.85


def test_factory_array_conditioner():
    cfg = InMemoryConfiguration()
    cfg.set_property("SignalConditioner.implementation",
                     "Array_Signal_Conditioner")
    cfg.set_property("SignalSource.sampling_frequency", "4000000")
    cfg.set_property("InputFilter.implementation", "Beamformer_Filter")
    cfg.set_property("InputFilter.number_of_channels", "4")
    cond = get_signal_conditioner(cfg)
    rng = np.random.default_rng(8)
    x = (rng.normal(size=(4, 1000)) + 1j * rng.normal(size=(4, 1000))
         ).astype(np.complex64)
    y = cond.process(x)
    assert y.shape == (1000,)


# ----------------------------------------------------------- factory strings
def test_factory_new_source_strings(tmp_path):
    from gnss_sdr_tpu.io import FileSignalSource, LabsatSignalSource
    from gnss_sdr_tpu.io import GeneratorSignalSource
    from gnss_sdr_tpu.io import encode_labsat_file

    rng = np.random.default_rng(9)
    x = (rng.choice([-1, 1], 64) + 1j * rng.choice([-1, 1], 64)).astype(np.complex64)

    spir = tmp_path / "spir.dat"
    spir.write_bytes(encode_samples(x, "spir_1bit"))
    cfg = InMemoryConfiguration()
    cfg.set_property("SignalSource.implementation", "Spir_File_Signal_Source")
    cfg.set_property("SignalSource.filename", str(spir))
    src = get_signal_source(cfg)
    assert isinstance(src, FileSignalSource)
    assert np.array_equal(src.read(64), x)

    ls3 = tmp_path / "cap.ls3"
    ls3.write_bytes(encode_labsat_file(x, bits_per_sample=4))
    cfg = InMemoryConfiguration()
    cfg.set_property("SignalSource.implementation", "Labsat_Signal_Source")
    cfg.set_property("SignalSource.filename", str(ls3))
    src = get_signal_source(cfg)
    assert isinstance(src, LabsatSignalSource)

    cfg = InMemoryConfiguration()
    cfg.set_property("SignalSource.implementation", "SignalGenerator")
    cfg.set_property("SignalSource.sampling_frequency", "2046000")
    cfg.set_property("SignalSource.num_satellites", "2")
    cfg.set_property("SignalSource.PRN_0", "7")
    cfg.set_property("SignalSource.PRN_1", "12")
    cfg.set_property("SignalSource.duration_s", "0.01")
    src = get_signal_source(cfg)
    assert isinstance(src, GeneratorSignalSource)
    y = src.read(10000)
    assert len(y) == 10000 and np.std(y.real) > 0.5


# ------------------------------------------------- timestamped file source
def test_timestamped_file_source(tmp_path):
    """File_Timestamp_Signal_Source analog: binary timetag records
    (uint64 item count, int32 week, int32 tow_ms) attach absolute GPS time
    to stream sample indices (gnss_sdr_timestamp.cc:52-64,119-121)."""
    fs = 1000.0
    x = (np.arange(4000) % 7 - 3).astype(np.int16)  # 2000 ishort samples
    data = tmp_path / "cap.dat"
    x.tofile(data)
    # tags at samplecount 0 and samplecount 1000: 1 s apart at fs=1 kHz
    # (the recorded count is in complex samples even for interleaved item
    # types — gnss_sdr_timestamp.cc:114 tags file item count*2 = sample
    # count after pairing)
    ts = tmp_path / "cap.ts"
    with open(ts, "wb") as f:
        f.write(struct.pack("<QiI", 0, 2200, 432_000_000))
        f.write(struct.pack("<QiI", 1000, 2200, 432_001_000))

    cfg = InMemoryConfiguration()
    cfg.set_property("SignalSource.implementation", "File_Timestamp_Signal_Source")
    cfg.set_property("SignalSource.filename", str(data))
    cfg.set_property("SignalSource.timestamp_filename", str(ts))
    cfg.set_property("SignalSource.item_type", "ishort")
    cfg.set_property("SignalSource.sampling_frequency", fs)
    cfg.set_property("SignalSource.timestamp_clock_offset_ms", 18.5)
    src = get_signal_source(cfg)

    chunk = src.read(2000)
    assert len(chunk) == 2000

    t0 = src.timetag_for(0)
    assert (t0.week, t0.tow_ms) == (2200, 432_000_018)
    assert t0.tow_ms_fraction == pytest.approx(0.5)
    # 500 samples after the first tag = +500 ms
    t = src.timetag_for(500)
    assert t.tow_ms == 432_000_518
    # past the second tag: re-anchored, not extrapolated from the first
    t = src.timetag_for(1250)
    assert t.tow_ms == 432_001_018 + 250
    # week rollover arithmetic
    src2 = src
    src2._tags[0].tow_ms = 604_799_990
    src2._tags = src2._tags[:1]
    t = src2.timetag_for(20)
    assert (t.week, t.tow_ms) == (2201, 10)
