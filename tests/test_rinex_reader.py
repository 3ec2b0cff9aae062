"""RINEX nav reader + rinex2assist (utils/rinex2assist analog):
writer -> reader roundtrip, ephemeris field fidelity, and warm-start XML
conversion.
"""

import numpy as np

from gnss_sdr_tpu.outputs import RinexNavWriter
from gnss_sdr_tpu.outputs.rinex_reader import read_rinex_nav, rinex2assist
from gnss_sdr_tpu.telemetry.lnav import GpsIonoUtc
from gnss_sdr_tpu.pvt.ephemeris import eph_to_pos_vel_clock
from gnss_sdr_tpu.simulate.constellation import make_constellation


def test_rinex_nav_roundtrip(tmp_path):
    ephs = make_constellation(seed=3)
    prns = sorted(ephs)[:6]
    iono = GpsIonoUtc(alpha0=1.2e-8, alpha1=-7.5e-9, alpha2=6.0e-8,
                      alpha3=-6.0e-8, beta0=94208.0, beta1=-81920.0,
                      beta2=131072.0, beta3=-131072.0, has_iono=True)
    path = tmp_path / "brdc.rnx"
    w = RinexNavWriter(str(path), iono=iono)
    for p in prns:
        w.write_ephemeris(ephs[p])
    w.close()

    got, got_iono = read_rinex_nav(path)
    assert sorted(got) == prns
    assert got_iono is not None
    assert abs(got_iono.alpha[0] - iono.alpha0) < 1e-11
    assert abs(got_iono.beta[1] - iono.beta1) < 1.0
    for p in prns:
        a, b = ephs[p], got[p]
        # orbital position from the round-tripped record matches to the
        # RINEX field precision (12 significant digits)
        t = a.toe + 300.0
        pa, _, ca, _ = eph_to_pos_vel_clock(a, t)
        pb, _, cb, _ = eph_to_pos_vel_clock(b, t)
        assert np.linalg.norm(pa - pb) < 1e-2, p
        assert abs(ca - cb) < 1e-12
        assert b.week == a.week
        assert abs(b.tgd - a.tgd) < 1e-18


def test_rinex2assist(tmp_path):
    from gnss_sdr_tpu.receiver.assistance import load_assistance

    ephs = make_constellation(seed=3)
    path = tmp_path / "brdc.rnx"
    w = RinexNavWriter(str(path))
    for p in sorted(ephs)[:4]:
        w.write_ephemeris(ephs[p])
    w.close()

    xml = tmp_path / "assist.xml"
    n = rinex2assist(path, xml)
    assert n == 4
    data = load_assistance(xml)
    back = data["ephemerides"]
    assert len(back) == 4
    p0 = sorted(ephs)[0]
    assert abs(back[("G", p0)].sqrt_a - ephs[p0].sqrt_a) < 1e-6
