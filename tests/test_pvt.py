"""PVT solver tests.

Mirrors the reference's rtklib_solver_test.cc strategy (solve from canned
obs/eph and check position) with a synthetic constellation as truth.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.pvt.coords import az_el, ecef_to_llh, llh_to_ecef
from gnss_sdr_tpu.pvt.ephemeris import C_LIGHT, eph_to_pos_vel_clock
from gnss_sdr_tpu.pvt.solver import ObsEpoch, PvtSolution, solve_pvt
from gnss_sdr_tpu.simulate.constellation import (
    make_constellation,
    truth_measurement,
    visible_sats,
)

RX_LLH = (np.deg2rad(41.275), np.deg2rad(1.9876), 80.0)   # Castelldefels-ish
TOW = 7200.0 + 120.0


@pytest.fixture(scope="module")
def world():
    ephs = make_constellation(seed=3)
    rx = llh_to_ecef(*RX_LLH)
    vis = visible_sats(ephs, rx, TOW)
    assert len(vis) >= 6, f"constellation geometry bad: {len(vis)} visible"
    return ephs, rx, vis


def test_coords_roundtrip():
    xyz = llh_to_ecef(*RX_LLH)
    lat, lon, h = ecef_to_llh(xyz)
    assert abs(lat - RX_LLH[0]) < 1e-11
    assert abs(lon - RX_LLH[1]) < 1e-11
    assert abs(h - RX_LLH[2]) < 1e-6


def test_eph2pos_orbit_sanity(world):
    ephs, rx, vis = world
    for prn in vis[:4]:
        p, v, clk, _ = eph_to_pos_vel_clock(ephs[prn], TOW)
        r = np.linalg.norm(p)
        assert 26.0e6 < r < 27.2e6, r
        # ECEF-frame speed (earth rotation removes up to ~1.9 km/s)
        assert 2.2e3 < np.linalg.norm(v) < 4.8e3
        assert abs(clk) < 1e-3
        # velocity consistent with numerical derivative
        dt = 0.5
        p2, _, _, _ = eph_to_pos_vel_clock(ephs[prn], TOW + dt)
        v_num = (p2 - p) / dt
        assert np.linalg.norm(v_num - v) < 1.0  # m/s (earth-rot + curvature)


def test_solver_recovers_position(world):
    ephs, rx, vis = world
    bias = 3.2e-4  # 320 us receiver clock bias
    obs = []
    for prn in vis:
        t = truth_measurement(ephs[prn], rx, TOW, rx_clock_bias_s=bias)
        obs.append(ObsEpoch(prn=prn, pseudorange_m=t["pseudorange_m"],
                            doppler_hz=t["doppler_hz"]))
    sol = solve_pvt(obs, ephs, TOW, apply_atmosphere=False)
    assert sol.valid
    err = np.linalg.norm(sol.pos_ecef - rx)
    assert err < 0.01, f"position error {err} m"
    assert abs(sol.clock_bias_s - bias) < 1e-10
    # static receiver: velocity near zero
    assert np.linalg.norm(sol.vel_ecef) < 0.01
    assert sol.num_sats == len(vis)
    assert 0.5 < sol.pdop < 10.0


def test_solver_with_noise_and_init(world):
    ephs, rx, vis = world
    rng = np.random.default_rng(7)
    obs = []
    for prn in vis:
        t = truth_measurement(ephs[prn], rx, TOW, rx_clock_bias_s=-1.5e-4)
        obs.append(ObsEpoch(
            prn=prn,
            pseudorange_m=t["pseudorange_m"] + rng.normal(scale=2.0),
            doppler_hz=t["doppler_hz"] + rng.normal(scale=0.5),
        ))
    sol = solve_pvt(obs, ephs, TOW, apply_atmosphere=False)
    assert sol.valid
    err = np.linalg.norm(sol.pos_ecef - rx)
    assert err < 15.0, f"position error {err} m with 2 m UERE"
    assert np.linalg.norm(sol.vel_ecef) < 1.0


def test_solver_insufficient_sats(world):
    ephs, rx, vis = world
    obs = [
        ObsEpoch(prn=p, pseudorange_m=truth_measurement(
            ephs[p], rx, TOW)["pseudorange_m"])
        for p in vis[:3]
    ]
    sol = solve_pvt(obs, ephs, TOW)
    assert not sol.valid


def test_moving_receiver_velocity(world):
    ephs, rx, vis = world
    v_rx = np.array([15.0, -8.0, 3.0])
    obs = []
    for prn in vis:
        t = truth_measurement(ephs[prn], rx, TOW, rx_vel_ecef=v_rx)
        obs.append(ObsEpoch(prn=prn, pseudorange_m=t["pseudorange_m"],
                            doppler_hz=t["doppler_hz"]))
    sol = solve_pvt(obs, ephs, TOW, apply_atmosphere=False)
    assert sol.valid
    assert np.linalg.norm(sol.vel_ecef - v_rx) < 0.02
