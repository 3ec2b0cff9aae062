"""RTCM 3 codec tests (reference rtcm.cc analog): frame/CRC layer,
ephemeris messages 1019/1020, MSM7 observation roundtrip, TCP broadcast."""

import socket

import numpy as np

from gnss_sdr_tpu.outputs.rtcm import (
    MsmObservation,
    RtcmTcpServer,
    decode_1005,
    decode_1019,
    decode_1020,
    decode_msm7,
    deframe,
    encode_1005,
    encode_1019,
    encode_1020,
    encode_msm7,
    frame,
)
from gnss_sdr_tpu.pvt.ephemeris import C_LIGHT

L1_LAMBDA = C_LIGHT / 1575.42e6


def test_frame_roundtrip_and_resync():
    payloads = [b"\x3f\x40hello", b"\x3f\x50world!!"]
    stream = b"\xaa\x55" + frame(payloads[0]) + b"garbage\xd3junk" + frame(
        payloads[1]) + b"\x00"
    got = list(deframe(stream))
    assert [p for _, p in got] == payloads
    # corrupt a CRC: frame must be skipped
    f = bytearray(frame(payloads[0]))
    f[-1] ^= 0xFF
    assert list(deframe(bytes(f))) == []


def test_1005_roundtrip():
    ecef = np.array([4797680.123, 166506.72, 4185447.53])
    d = decode_1005(encode_1005(77, ecef))
    assert d["station_id"] == 77
    assert np.allclose(d["ecef"], ecef, atol=1e-4)


def test_1019_roundtrip():
    from gnss_sdr_tpu.simulate.constellation import make_constellation

    eph = make_constellation(seed=2)[7]
    out = decode_1019(encode_1019(eph))
    assert out.prn == eph.prn
    for f, tol in (
        ("sqrt_a", 2.0 ** -19), ("ecc", 2.0 ** -33), ("m0", 2.0 ** -31 * 4),
        ("omega0", 2.0 ** -31 * 4), ("i0", 2.0 ** -31 * 4),
        ("omega", 2.0 ** -31 * 4), ("delta_n", 2.0 ** -43 * 4),
        ("af0", 2.0 ** -31), ("af1", 2.0 ** -43), ("crs", 2.0 ** -5),
        ("cuc", 2.0 ** -29), ("tgd", 2.0 ** -31), ("toe", 1e-9),
    ):
        assert abs(getattr(out, f) - getattr(eph, f)) <= tol, f


def test_1020_roundtrip():
    from gnss_sdr_tpu.simulate.glonass import make_glonass_constellation

    geph = make_glonass_constellation(week=2290, tb_approx_tow=7500.0)[9]
    out = decode_1020(encode_1020(geph))
    assert out.slot == geph.slot and out.freq_k == geph.freq_k
    assert abs(out.tb_gps_tow - geph.tb_gps_tow) < 1e-6
    assert np.abs(out.pos - geph.pos).max() < 0.25
    assert np.abs(out.vel - geph.vel).max() < 1e-3
    assert abs(out.tau_n - geph.tau_n) < 2.0 ** -30


def test_msm7_roundtrip():
    rng = np.random.default_rng(0)
    obs = []
    for prn in (2, 5, 13, 21, 30):
        pr = 2.1e7 + rng.uniform(0, 3e6)
        obs.append(MsmObservation(
            prn=prn,
            pseudorange_m=pr,
            carrier_phase_cycles=-pr / L1_LAMBDA + rng.integers(-5, 5),
            doppler_hz=rng.uniform(-4000, 4000),
            cn0_dbhz=rng.uniform(35, 50),
            wavelength_m=L1_LAMBDA,
        ))
    payload = encode_msm7("G", 4, 345601.25, obs)
    d = decode_msm7(payload)
    assert d["system"] == "G" and d["station_id"] == 4
    assert d["tow_ms"] == 345601250
    assert [o["prn"] for o in d["obs"]] == [2, 5, 13, 21, 30]
    for o_in, o_out in zip(obs, d["obs"]):
        assert abs(o_out["pseudorange_m"] - o_in.pseudorange_m) < 0.01
        phr_in = -o_in.carrier_phase_cycles * L1_LAMBDA
        assert abs(o_out["phase_range_m"] - phr_in) < 0.001
        assert abs(o_out["cn0_dbhz"] - o_in.cn0_dbhz) < 0.1
        assert abs(-o_out["doppler_mps"]
                   - (-o_in.doppler_hz * L1_LAMBDA)) < 0.51


def test_tcp_server_broadcast():
    srv = RtcmTcpServer(port=0)
    cli = socket.create_connection(("127.0.0.1", srv.port), timeout=2)
    srv.poll_accept()
    f = frame(encode_1005(9, np.array([1.0, 2.0, 3.0])))
    srv.broadcast(f)
    cli.settimeout(2)
    got = cli.recv(4096)
    assert got == f
    msgs = list(deframe(got))
    assert msgs and msgs[0][0] == 1005
    cli.close()
    srv.close()
