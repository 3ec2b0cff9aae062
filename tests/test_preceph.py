"""SP3 precise ephemeris: file roundtrip, Neville orbit interpolation
accuracy against the broadcast orbit model, and PPP with precise
orbits/clocks (reference rtklib_preceph.cc readsp3/pephpos).
"""

import numpy as np
import pytest

from gnss_sdr_tpu.pvt.ephemeris import eph_to_pos_vel_clock
from gnss_sdr_tpu.pvt.preceph import (
    PreciseEphemeris,
    Sp3Data,
    read_sp3,
    write_sp3,
)
from gnss_sdr_tpu.simulate.constellation import make_constellation


def _sp3_from_broadcast(ephs, prns, t0, dt=300.0, n=12, week=2200,
                        clk_override=None):
    data = Sp3Data(week=week, times=np.array([t0 + dt * i for i in range(n)]))
    for prn in prns:
        p = np.zeros((n, 3))
        c = np.zeros(n)
        for i, t in enumerate(data.times):
            pos, _, clk, _ = eph_to_pos_vel_clock(ephs[prn], t)
            p[i] = pos
            c[i] = clk if clk_override is None else clk_override(prn, t)
        data.pos_m[("G", prn)] = p
        data.clk_s[("G", prn)] = c
    return data


def test_sp3_roundtrip(tmp_path):
    ephs = make_constellation(seed=3)
    prns = sorted(ephs)[:4]
    data = _sp3_from_broadcast(ephs, prns, t0=7200.0)
    f = tmp_path / "orbit.sp3"
    write_sp3(f, data)
    back = read_sp3(f)
    assert back.week == data.week
    assert np.allclose(back.times, data.times)
    for prn in prns:
        assert np.allclose(back.pos_m[("G", prn)], data.pos_m[("G", prn)],
                           atol=1e-3)  # 1 mm (SP3 km with 6 decimals)
        assert np.allclose(back.clk_s[("G", prn)], data.clk_s[("G", prn)],
                           atol=1e-12)


def test_neville_interpolation_accuracy(tmp_path):
    # sample the broadcast orbit every 300 s; the 10-point polynomial must
    # reproduce intermediate positions to well under a millimeter
    ephs = make_constellation(seed=3)
    prn = sorted(ephs)[0]
    data = _sp3_from_broadcast(ephs, [prn], t0=7200.0)
    pe = PreciseEphemeris(data)
    for t in (7650.0, 8130.0, 9001.0):
        got, clk = pe.sat_pos_clock("G", prn, t)
        want, _, want_clk, _ = eph_to_pos_vel_clock(ephs[prn], t)
        assert np.linalg.norm(got - want) < 1e-3, t
        assert abs(clk - want_clk) < 1e-11
    # outside coverage -> None
    assert pe.sat_pos_clock("G", prn, 7200.0 - 1000.0) is None
    assert pe.sat_pos_clock("G", 99, 7650.0) is None


def test_ppp_with_precise_orbits():
    # broadcast ephemerides with deliberate meter-level clock errors; the
    # SP3 carries the TRUE clocks, so precise PPP recovers the position
    # while broadcast-only PPP is biased.
    from dataclasses import replace

    from gnss_sdr_tpu.pvt.coords import llh_to_ecef
    from gnss_sdr_tpu.pvt.ephemeris import C_LIGHT, OMEGA_E
    from gnss_sdr_tpu.pvt.ppp import DualFreqObs, PppEngine
    from gnss_sdr_tpu.simulate.constellation import visible_sats

    ephs = make_constellation(seed=3)
    rx = llh_to_ecef(np.deg2rad(41.275), np.deg2rad(1.9876), 80.0)
    tow = 7350.0
    vis = visible_sats(ephs, rx, tow)[:7]

    sp3 = _sp3_from_broadcast(ephs, vis, t0=7200.0)
    pe = PreciseEphemeris(sp3)

    # corrupt the broadcast clocks AFTER building the SP3 truth
    bad_ephs = {prn: replace(ephs[prn], af0=ephs[prn].af0 + 1.7e-8 * prn)
                for prn in vis}

    f1, f2 = 1575.42e6, 1176.45e6
    l1, l2 = C_LIGHT / f1, C_LIGHT / f2
    eng_prec = PppEngine(mode="static")
    eng_bcast = PppEngine(mode="static")
    sol_p = sol_b = None
    for k in range(40):
        t = tow + k
        obs = []
        for prn in vis:
            # light-time + Sagnac-consistent geometry with TRUE clocks
            tau = 0.075
            for _ in range(3):
                sp, _, dts, _ = eph_to_pos_vel_clock(ephs[prn], t - tau)
                th = OMEGA_E * tau
                rot = np.array([[np.cos(th), np.sin(th), 0.0],
                                [-np.sin(th), np.cos(th), 0.0],
                                [0.0, 0.0, 1.0]])
                sp_r = rot @ sp
                tau = np.linalg.norm(sp_r - rx) / C_LIGHT
            rho = float(np.linalg.norm(sp_r - rx))
            clk = 8.0 - C_LIGHT * dts
            obs.append(DualFreqObs(
                system="G", prn=prn,
                p1_m=rho + clk, p2_m=rho + clk,
                phi1_cycles=(-rho - clk) / l1,
                phi2_cycles=(-rho - clk) / l2,
                f1_hz=f1, f2_hz=f2))
        eph_map = {("G", p): bad_ephs[p] for p in vis}
        sol_p = eng_prec.process_epoch(t, obs, eph_map, x0=rx + 10.0,
                                       precise=pe)
        sol_b = eng_bcast.process_epoch(t, obs, eph_map, x0=rx + 10.0)
    assert sol_p.valid and sol_b.valid
    err_p = np.linalg.norm(sol_p.pos_ecef - rx)
    err_b = np.linalg.norm(sol_b.pos_ecef - rx)
    assert err_p < 0.5, err_p
    assert err_b > 4.0 * err_p, (err_b, err_p)


def test_rinex_clk_reader_and_override(tmp_path):
    """RINEX CLK (AS records) parse + precedence over the SP3 clock
    column (rtklib readrnxc / peph2pos clock source)."""
    from gnss_sdr_tpu.pvt.preceph import read_clk

    # week 2200 starts 2022-03-06 00:00:00 GPS; epochs at tow 7200+30k
    lines = [
        "     3.00           C                   RINEX VERSION / TYPE",
        "ccl v1.0            ref                 PGM / RUN BY / DATE",
        "                                        END OF HEADER",
    ]
    t_base = 7200.0
    biases = {}
    for k in range(9):
        tow = t_base + 30.0 * k
        h, rem = divmod(tow, 3600.0)
        mi, s = divmod(rem, 60.0)
        for prn in (5, 17):
            b = 1.0e-4 + prn * 1e-6 + 2e-9 * k
            biases.setdefault(prn, []).append((tow, b))
            lines.append(
                f"AS G{prn:02d}  2022 03 06 {int(h):02d} {int(mi):02d}"
                f" {s:9.6f}  2    {b:.12E}  1.0E-11")
    p = tmp_path / "test.clk"
    p.write_text("\n".join(lines) + "\n")
    clk = read_clk(p)
    assert set(clk.clk) == {("G", 5), ("G", 17)}
    ct, cb = clk.clk[("G", 5)]
    assert len(ct) == 9 and abs(ct[0] - t_base) < 1e-6
    assert abs(cb[0] - (1.0e-4 + 5e-6)) < 1e-15

    # SP3 with a deliberately WRONG clock column; CLK wins
    ephs = make_constellation(seed=3)
    sp3 = _sp3_from_broadcast(ephs, [5], t0=7200.0, week=2200,
                              clk_override=lambda prn, t: 5e-3)
    pe = PreciseEphemeris(sp3, clk=clk)
    pos, c = pe.sat_pos_clock("G", 5, t_base + 45.0)
    want = 1.0e-4 + 5e-6 + 2e-9 * 1.5          # linear midpoint
    assert abs(c - want) < 1e-12
    # satellite absent from the CLK product falls back to SP3
    sp3b = _sp3_from_broadcast(ephs, [9], t0=7200.0, week=2200,
                               clk_override=lambda prn, t: 5e-3)
    pe2 = PreciseEphemeris(sp3b, clk=clk)
    _, c2 = pe2.sat_pos_clock("G", 9, t_base + 45.0)
    assert abs(c2 - 5e-3) < 1e-12


def test_clk_cross_week_alignment(tmp_path):
    """CLK products starting in a later GPS week than the SP3 must align
    through the week-frame shift, not be silently ignored."""
    from gnss_sdr_tpu.pvt.preceph import read_clk

    ephs = make_constellation(seed=3)
    # SP3 anchored in week 2200 with epochs crossing into week 2201
    # (times beyond 604800 continue the same axis)
    t0 = 604800.0 - 1800.0
    sp3 = _sp3_from_broadcast(ephs, [5], t0=t0, dt=300.0, n=12, week=2200,
                              clk_override=lambda prn, t: 5e-3)
    # CLK file entirely inside week 2201 (its own first-record week)
    lines = ["X".ljust(60) + "END OF HEADER"]
    for k in range(7):
        tow = 600.0 + 300.0 * k                    # week-2201 TOW
        h, rem = divmod(tow, 3600.0)
        mi, s = divmod(rem, 60.0)
        lines.append(
            f"AS G05  2022 03 13 {int(h):02d} {int(mi):02d} {s:9.6f}"
            f"  2    {2.0e-4 + 1e-9 * k:.12E}")
    p = tmp_path / "w.clk"
    p.write_text("\n".join(lines) + "\n")
    clk = read_clk(p)
    assert clk.week == 2201
    pe = PreciseEphemeris(sp3, clk=clk)
    # query at week-2200-frame TOW 604800+750 = week-2201 TOW 750
    _, c = pe.sat_pos_clock("G", 5, 604800.0 + 750.0)
    assert abs(c - (2.0e-4 + 1e-9 * 0.5)) < 1e-12
