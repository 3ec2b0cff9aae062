"""SBAS correction engine: DO-229 payload codecs (MT1/2-5/18/25/26), IGP
band geometry, iono grid interpolation, and SBAS-aided single-point
solving (reference rtklib_sbas.cc decode_sbstype* + sbsioncorr +
sbsfastcorr/sbslongcorr).
"""

import numpy as np
import pytest

from gnss_sdr_tpu.pvt.coords import llh_to_ecef
from gnss_sdr_tpu.pvt.sbas_corr import (
    SbasCorrections,
    decode_mt1,
    decode_mt2_5,
    decode_mt18,
    decode_mt25,
    decode_mt26,
    encode_mt1,
    encode_mt2_5,
    encode_mt18,
    encode_mt25_vel0,
    encode_mt26,
    igp_latlon,
    pierce_point,
)
from gnss_sdr_tpu.pvt.solver import ObsEpoch, solve_pvt
from gnss_sdr_tpu.simulate.constellation import (
    make_constellation,
    truth_measurement,
    visible_sats,
)

RX_LLH = (np.deg2rad(41.275), np.deg2rad(1.9876), 80.0)
TOW = 7200.0 + 120.0


def test_mt1_roundtrip():
    prns = [1, 5, 12, 17, 23, 29, 32]
    m = decode_mt1(encode_mt1(prns, iodp=2))
    assert m["prns"] == prns and m["iodp"] == 2


def test_mt2_roundtrip():
    prc = [1.625, -3.25, 0.0, 12.5, -0.125] + [0.0] * 8
    m = decode_mt2_5(encode_mt2_5(prc, iodf=1, iodp=2), 2)
    assert m["iodf"] == 1 and m["iodp"] == 2 and m["slot0"] == 0
    assert np.allclose(m["prc_m"], prc)


def test_mt25_vel0_roundtrip():
    sats = [
        {"slot": 3, "iode": 17, "dpos_m": np.array([1.0, -2.125, 0.375]),
         "daf0_s": 4.2e-9},
        {"slot": 8, "iode": 4, "dpos_m": np.array([-0.5, 0.0, 3.0]),
         "daf0_s": -1.1e-9},
    ]
    m = decode_mt25(encode_mt25_vel0(sats))
    assert len(m["corrections"]) == 2
    for got, want in zip(m["corrections"], sats):
        assert got["slot"] == want["slot"] and got["iode"] == want["iode"]
        assert np.allclose(got["dpos_m"], want["dpos_m"])
        assert abs(got["daf0_s"] - want["daf0_s"]) < 2.0**-31


def test_igp_band_geometry():
    # band 4 column at lon 0 spans mask bits 101-128 with the X1 pattern
    assert igp_latlon(4, 101) == (-75.0, 0.0)
    assert igp_latlon(4, 128) == (85.0, 0.0)
    # band 9 (north polar): first row lat 60, lons every 5 deg
    assert igp_latlon(9, 1) == (60.0, -180.0)
    assert igp_latlon(9, 37) == (60.0, 0.0)
    assert igp_latlon(0, 999) is None


def test_iono_grid_interpolation():
    sb = SbasCorrections()
    # a 2x2 cell of IGPs around the pierce point at 5-degree spacing
    # (band 5 covers lon 20-55; use lat 40/45, lon 40/45)
    sb.igp_masks[5] = [(40.0, 40.0), (45.0, 40.0), (40.0, 45.0),
                       (45.0, 45.0)]
    m26 = encode_mt26(5, 0, [2.0, 4.0, 2.0, 4.0])
    sb.ingest(26, m26)
    assert len(sb.igp_delay_m) == 4
    # midpoint: vertical delay 3.0 m; zenith view (el=90) has obliquity 1
    d = sb.iono_delay_m(np.deg2rad(42.5), np.deg2rad(42.5), np.pi / 2)
    assert abs(d - 3.0) < 1e-6
    # low elevation scales by the obliquity factor > 1
    d30 = sb.iono_delay_m(np.deg2rad(42.5), np.deg2rad(42.5),
                          np.deg2rad(30.0))
    assert d30 > d * 1.5
    # outside the grid -> None (fall back to Klobuchar)
    assert sb.iono_delay_m(np.deg2rad(10.0), np.deg2rad(10.0),
                           np.pi / 2) is None


def test_pierce_point_geometry():
    lat, lon = pierce_point(np.deg2rad(41.0), np.deg2rad(2.0),
                            0.0, np.pi / 2)
    # zenith: pierce point at the receiver
    assert abs(np.rad2deg(lat) - 41.0) < 1e-6
    # northward low elevation: pierce point north of the receiver
    lat2, _ = pierce_point(np.deg2rad(41.0), np.deg2rad(2.0),
                           0.0, np.deg2rad(20.0))
    assert np.rad2deg(lat2) > 45.0


def test_sbas_aided_solve_removes_range_biases():
    ephs = make_constellation(seed=3)
    rx = llh_to_ecef(*RX_LLH)
    vis = visible_sats(ephs, rx, TOW)[:7]
    rng = np.random.default_rng(9)
    biases = {prn: float(b) for prn, b in
              zip(vis, rng.uniform(-8.0, 8.0, len(vis)))}
    obs = []
    for prn in vis:
        t = truth_measurement(ephs[prn], rx, TOW, rx_clock_bias_s=1e-4)
        obs.append(ObsEpoch(prn=prn,
                            pseudorange_m=t["pseudorange_m"] + biases[prn],
                            doppler_hz=t["doppler_hz"]))

    # SBAS broadcast: MT1 mask + MT2 fast corrections cancelling the biases
    sb = SbasCorrections()
    sb.ingest(1, encode_mt1(sorted(vis)))
    slots = {prn: i for i, prn in enumerate(sorted(vis))}
    prc = [0.0] * 13
    for prn in vis:
        prc[slots[prn]] = -biases[prn]
    sb.ingest(2, encode_mt2_5(prc))

    plain = solve_pvt(obs, ephs, TOW, apply_atmosphere=False,
                      raim_threshold_m=0.0)
    aided = solve_pvt(obs, ephs, TOW, apply_atmosphere=False,
                      raim_threshold_m=0.0, sbas=sb)
    err_plain = np.linalg.norm(plain.pos_ecef - rx)
    err_aided = np.linalg.norm(aided.pos_ecef - rx)
    # corrections cancel up to the 0.125 m PRC quantization
    assert err_aided < 0.3, err_aided
    assert err_plain > 10 * err_aided, (err_plain, err_aided)


def test_sbas_long_term_correction_sign():
    # a pure clock error daf0 shows up as -c*daf0 in the range domain
    sb = SbasCorrections()
    sb.ingest(1, encode_mt1([7]))
    sb.ingest(25, encode_mt25_vel0(
        [{"slot": 1, "iode": 0, "dpos_m": np.zeros(3), "daf0_s": 1e-8}]))
    corr = sb.long_term_range_correction(7, np.array([1.0, 0.0, 0.0]))
    assert abs(corr - (-299792458.0 * 1e-8)) < 0.15
