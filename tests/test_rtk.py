"""DGPS / RTK engine tests (reference rtklib_rtkpos.cc + rtklib_lambda.cc
analogs): synthetic double-difference geometry with known truth, integer
ambiguities recovered exactly, centimeter-level fixed baselines."""

import numpy as np
import pytest

from gnss_sdr_tpu.pvt.coords import llh_to_ecef
from gnss_sdr_tpu.pvt.ephemeris import C_LIGHT, eph_to_pos_vel_clock
from gnss_sdr_tpu.pvt.lambda_ilr import lambda_fix
from gnss_sdr_tpu.pvt.rtk import DiffObs, RtkEngine
from gnss_sdr_tpu.simulate.constellation import make_constellation, visible_sats

L1_WAVELENGTH = C_LIGHT / 1575.42e6
TOW = 7500.0


@pytest.fixture(scope="module")
def geometry():
    ephs = make_constellation(seed=3, toe=TOW)
    base = llh_to_ecef(np.deg2rad(41.275), np.deg2rad(1.9876), 80.0)
    rover = base + np.array([350.0, -120.0, 60.0])   # ~390 m baseline
    vis = visible_sats(ephs, base, TOW, np.deg2rad(5.0))[:8]
    assert len(vis) >= 6
    rng = np.random.default_rng(11)
    amb = {prn: int(rng.integers(-30, 30)) for prn in vis}
    return ephs, base, rover, vis, amb


def _obs_at(ephs, pos, vis, amb, t, rng, clock_bias_m=0.0,
            code_sigma=0.4, phase_sigma=0.003):
    out = []
    for prn in vis:
        p, _, dts, _ = eph_to_pos_vel_clock(ephs[prn], t)
        rho = float(np.linalg.norm(p - pos))
        pr = rho + clock_bias_m + rng.normal(scale=code_sigma)
        ph = (-rho - clock_bias_m) / L1_WAVELENGTH + amb[prn] + rng.normal(
            scale=phase_sigma / L1_WAVELENGTH)
        out.append(DiffObs(
            system="G", prn=prn, pseudorange_m=pr,
            carrier_phase_cycles=ph, wavelength_m=L1_WAVELENGTH,
            cn0_dbhz=45.0 + prn % 7,
        ))
    return out


def test_lambda_recovers_integers():
    rng = np.random.default_rng(5)
    n = 6
    A = rng.normal(size=(n, n))
    Q = A @ A.T * 2e-4 + np.eye(n) * 1e-4
    truth = rng.integers(-15, 15, n).astype(float)
    a_float = truth + np.linalg.cholesky(Q) @ rng.normal(size=n)
    fix, ratio = lambda_fix(a_float, Q, ratio_threshold=1.5)
    assert fix is not None and np.array_equal(fix, truth.astype(int))


def test_dgps_code_baseline(geometry):
    ephs, base, rover, vis, amb = geometry
    rng = np.random.default_rng(42)
    eng = RtkEngine(base, mode="dgps")
    errs = []
    for k in range(20):
        t = TOW + k
        rov = _obs_at(ephs, rover, vis, amb, t, rng, clock_bias_m=35.0)
        bas = _obs_at(ephs, base, vis, amb, t, rng, clock_bias_m=-20.0)
        eph_map = {("G", p): ephs[p] for p in vis}
        sol = eng.process_epoch(t, rov, bas, eph_map)
        assert sol.valid
        errs.append(np.linalg.norm(sol.pos_ecef - rover))
    # DD code noise ~0.8 m per DD / sqrt(#sats) geometry
    assert np.mean(errs) < 2.5, np.mean(errs)


def test_rtk_float_converges_and_fixes(geometry):
    ephs, base, rover, vis, amb = geometry
    rng = np.random.default_rng(43)
    eng = RtkEngine(base, mode="static", ratio_threshold=2.5)
    eph_map = {("G", p): ephs[p] for p in vis}
    fixed_errs = []
    for k in range(40):
        t = TOW + k
        rov = _obs_at(ephs, rover, vis, amb, t, rng, clock_bias_m=12.0)
        bas = _obs_at(ephs, base, vis, amb, t, rng, clock_bias_m=3.0)
        sol = eng.process_epoch(t, rov, bas, eph_map)
        assert sol.valid
        if sol.fixed:
            fixed_errs.append(np.linalg.norm(sol.pos_ecef - rover))
    assert fixed_errs, "RTK never fixed"
    # fixed solutions: centimeter-level
    assert np.mean(fixed_errs) < 0.05, np.mean(fixed_errs)
    assert abs(sol.baseline_m - np.linalg.norm(rover - base)) < 0.05


def test_rtk_handles_satellite_set_change(geometry):
    ephs, base, rover, vis, amb = geometry
    rng = np.random.default_rng(44)
    eng = RtkEngine(base, mode="static", ratio_threshold=2.5)
    eph_map = {("G", p): ephs[p] for p in vis}
    for k in range(12):
        t = TOW + k
        subset = vis if k < 6 else vis[1:]       # drop one satellite
        rov = _obs_at(ephs, rover, subset, amb, t, rng)
        bas = _obs_at(ephs, base, subset, amb, t, rng)
        sol = eng.process_epoch(t, rov, bas, eph_map)
        assert sol.valid
    assert np.linalg.norm(sol.pos_ecef - rover) < 1.0


def test_ppp_converges_dual_frequency(geometry):
    """Float PPP (rtklib_ppp.cc analog): dual-frequency iono-free EKF
    converges to sub-decimeter on clean broadcast-quality observations."""
    from gnss_sdr_tpu.pvt.ppp import DualFreqObs, PppEngine

    ephs, base, rover, vis, amb = geometry
    f1, f2 = 1575.42e6, 1227.60e6
    l1 = C_LIGHT / f1
    l2 = C_LIGHT / f2
    rng = np.random.default_rng(77)
    n1 = {p: int(rng.integers(-30, 30)) for p in vis}
    n2 = {p: int(rng.integers(-30, 30)) for p in vis}
    eng = PppEngine(mode="static", code_sigma_m=0.5, phase_sigma_m=0.005)
    eph_map = {("G", p): ephs[p] for p in vis}
    sol = None
    for k in range(120):
        t = TOW + k
        obs = []
        for p in vis:
            # light-time + Sagnac-consistent geometry (the engine models
            # transmit-time satellite positions in the reception frame)
            from gnss_sdr_tpu.pvt.ephemeris import OMEGA_E

            tau = 0.075
            for _ in range(3):
                sp, _, dts, _ = eph_to_pos_vel_clock(ephs[p], t - tau)
                th = OMEGA_E * tau
                rot = np.array([[np.cos(th), np.sin(th), 0.0],
                                [-np.sin(th), np.cos(th), 0.0],
                                [0.0, 0.0, 1.0]])
                sp_r = rot @ sp
                tau = np.linalg.norm(sp_r - rover) / C_LIGHT
            sp = sp_r
            rho = float(np.linalg.norm(sp - rover))
            clk = 8.0 - C_LIGHT * dts
            obs.append(DualFreqObs(
                system="G", prn=p,
                p1_m=rho + clk + rng.normal(scale=0.4),
                p2_m=rho + clk + rng.normal(scale=0.4),
                phi1_cycles=(-rho - clk) / l1 + n1[p]
                + rng.normal(scale=0.003 / l1),
                phi2_cycles=(-rho - clk) / l2 + n2[p]
                + rng.normal(scale=0.003 / l2),
                f1_hz=f1, f2_hz=f2,
            ))
        sol = eng.process_epoch(t, obs, eph_map, x0=base)
        assert sol.valid
    err = np.linalg.norm(sol.pos_ecef - rover)
    # float PPP converges slowly (real-world: decimeters after minutes,
    # cm after ~30 min); 0.5 m after 2 simulated minutes is on-curve
    assert err < 0.5, f"PPP error {err:.3f} m"
    assert abs(sol.clock_m - 8.0) < 1.0
