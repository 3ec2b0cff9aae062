"""ANTEX antenna phase-center models (rtklib readpcv/antmodel/satantoff
analogs, rtklib_rtkcmn.cc:2945/:4779, rtklib_preceph.cc:877)."""

import math

import numpy as np
import pytest

from gnss_sdr_tpu.pvt.antex import (
    antmodel,
    antmodel_s,
    parse_antex,
    satantoff,
    sun_position_ecef,
)


def _col(text: str, label: str) -> str:
    return text.ljust(60) + label


MINI_ANTEX = "\n".join([
    _col("     1.4            M", "ANTEX VERSION / SYST"),
    _col("", "END OF HEADER"),
    _col("", "START OF ANTENNA"),
    _col("BLOCK IIR-M         G01                 2006-095A",
         "TYPE / SERIAL NO"),
    _col("     0.0  17.0   1.0", "ZEN1 / ZEN2 / DZEN"),
    _col("   G01", "START OF FREQUENCY"),
    # satellite PCO: body-frame XYZ, mm
    _col("      1.50      2.50   1000.00", "NORTH / EAST / UP"),
    "   NOAZI" + "".join(f"{v:8.2f}" for v in np.linspace(0, 17, 18)),
    _col("   G01", "END OF FREQUENCY"),
    _col("   G02", "START OF FREQUENCY"),
    _col("      1.50      2.50   1200.00", "NORTH / EAST / UP"),
    "   NOAZI" + "".join(f"{v:8.2f}" for v in np.zeros(18)),
    _col("   G02", "END OF FREQUENCY"),
    _col("", "END OF ANTENNA"),
    _col("", "START OF ANTENNA"),
    _col("TRM59800.00     NONE", "TYPE / SERIAL NO"),
    _col("     0.0  90.0   5.0", "ZEN1 / ZEN2 / DZEN"),
    _col("   G01", "START OF FREQUENCY"),
    # receiver PCO: NEU mm (U = 100 mm)
    _col("      0.70     -1.20    100.00", "NORTH / EAST / UP"),
    "   NOAZI" + "".join(f"{v:8.2f}" for v in np.linspace(0, 19, 19)),
    _col("   G01", "END OF FREQUENCY"),
    _col("", "END OF ANTENNA"),
])


def test_parse_antex():
    ants = parse_antex(MINI_ANTEX)
    assert set(ants) == {"G01", "TRM59800.00     NONE"}
    sat = ants["G01"]
    assert sat.pco["G01"] == pytest.approx([0.0015, 0.0025, 1.0])
    assert sat.pco["G02"][2] == pytest.approx(1.2)
    assert sat.dzen == 1.0 and sat.zen2 == 17.0
    rx = ants["TRM59800.00     NONE"]
    assert rx.pco["G01"][2] == pytest.approx(0.1)
    assert len(rx.pcv["G01"]) == 19


def test_antmodel_receiver():
    rx = parse_antex(MINI_ANTEX)["TRM59800.00     NONE"]
    # zenith satellite: e = (0,0,1) -> correction = -U_pco + PCV(0)
    d = antmodel(rx, "G01", az_rad=0.0, el_rad=np.pi / 2)
    assert d == pytest.approx(-0.1 + 0.0, abs=1e-9)
    # 30 deg elevation, az=0: e_NEU = (cos30, 0, sin30); PCV grid is
    # linspace(0,19,19) mm over zen 0..90 (5-deg step) -> zen=60 is
    # grid[12] = 19*12/18 mm
    d30 = antmodel(rx, "G01", az_rad=0.0, el_rad=math.radians(30.0))
    e_up = math.sin(math.radians(30.0))
    e_n = math.cos(math.radians(30.0))
    pcv60 = 19.0 * 12 / 18 * 1e-3
    expect = -(0.0007 * e_n + (-0.0012) * 0.0 + 0.1 * e_up) + pcv60
    assert d30 == pytest.approx(expect, abs=1e-5)  # file prints 0.01 mm


def test_satantoff_points_along_nadir():
    sat = parse_antex(MINI_ANTEX)["G01"]
    pos = np.array([26560e3, 0.0, 0.0])
    off = satantoff(sat, pos, t_gps_s=345600.0, week=2345)
    # body +Z points to Earth center (-x here); the iono-free combination
    # of the 1.0/1.2 m Z-offsets: c1*1.0 + c2*1.2
    lam1, lam2 = 0.19029367, 0.24421021
    gamma = lam2 ** 2 / lam1 ** 2
    c1, c2 = gamma / (gamma - 1.0), -1.0 / (gamma - 1.0)
    z_if = c1 * 1.0 + c2 * 1.2
    assert off[0] == pytest.approx(-z_if, abs=0.02)   # small x/y PCO leak
    assert np.linalg.norm(off) == pytest.approx(abs(z_if), rel=0.05)


def test_antmodel_s_nadir_grid():
    sat = parse_antex(MINI_ANTEX)["G01"]
    # grid value = nadir_deg mm
    assert antmodel_s(sat, math.radians(10.0), "G01") == pytest.approx(
        0.010, abs=1e-6)


def test_sun_position_sane():
    # sun distance ~1 AU; near the March equinox the sun sits close to
    # the equatorial plane
    r = sun_position_ecef(345600.0, week=2350)   # some 2025 epoch
    au = 149597870700.0
    assert np.linalg.norm(r) == pytest.approx(au, rel=0.05)


def test_ppp_accepts_antenna_models():
    from gnss_sdr_tpu.pvt.ppp import PppEngine

    ants = parse_antex(MINI_ANTEX)
    eng = PppEngine(rx_antenna=ants["TRM59800.00     NONE"],
                    sat_antennas={"G01": ants["G01"]}, gps_week=2345)
    assert eng.rx_antenna is not None
    assert "G01" in eng.sat_antennas
