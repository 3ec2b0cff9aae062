"""Dual-constellation system test: GPS L1 C/A + Galileo E1-B in one capture,
one receiver, one combined PVT with inter-system bias estimation.

This is BASELINE.md's headline configuration ("GPS L1 C/A + Galileo E1 fix
from capture files") and exercises SURVEY.md §2.4 P2's channel batching
across heterogeneous signal groups.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.pvt.coords import ecef_to_enu
from gnss_sdr_tpu.receiver.plans import galileo_e1b_plan, gps_l1ca_plan
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.simulate.galileo import GalileoScenario, GalileoScenarioConfig
from gnss_sdr_tpu.simulate.scenario import GpsScenario, ScenarioConfig

FS = 2.6e6


@pytest.fixture(scope="module")
def dual_receiver():
    common = dict(
        fs=FS,
        duration_s=30.0,
        rx_clock_bias_s=1.3e-4,
        min_elevation_deg=15.0,
        max_sats=4,
    )
    gps = GpsScenario(ScenarioConfig(
        tow_start_s=7314.0, cn0_dbhz=46.0, seed=1, **common))
    gal = GalileoScenario(GalileoScenarioConfig(
        tow_start_s=7314.0, cn0_dbhz=46.0, seed=3, noise=False, **common))
    assert len(gps.prns) >= 4 and len(gal.prns) >= 4

    plans = [
        gps_l1ca_plan(fs=FS, num_channels=4),
        galileo_e1b_plan(fs=FS, num_channels=4),
    ]
    rx = Receiver(ReceiverConfig(fs=FS, num_channels=8), plans=plans)
    chunk = int(FS)
    total = gps.total_samples
    fed = 0
    acquired = False
    while fed < total:
        n = min(chunk, total - fed)
        rx.feed(gps.generate(fed, n) + gal.generate(fed, n))
        fed += n
        if not acquired:
            got = rx.acquire()
            acquired = (
                len([k for k in got if k[0] == "G"]) >= 3
                and len([k for k in got if k[0] == "E"]) >= 3
            )
        rx.run()
    return gps, gal, rx


def test_dual_acquisition(dual_receiver):
    gps, gal, rx = dual_receiver
    systems = {k[0] for k in rx.status.acquired}
    assert systems == {"G", "E"}
    for (sysid, prn), (dop, delay) in rx.status.acquired.items():
        scen = gps if sysid == "G" else gal
        if prn not in scen.prns:
            continue
        truth = scen.truth_at(prn, 0.0)
        assert abs(dop - truth["doppler_hz"]) <= 300.0


def test_dual_ephemerides(dual_receiver):
    gps, gal, rx = dual_receiver
    assert len([k for k in rx.ephemerides if k[0] == "G"]) >= 3
    assert len([k for k in rx.ephemerides if k[0] == "E"]) >= 3


def test_dual_fix_uses_both_systems(dual_receiver):
    gps, gal, rx = dual_receiver
    fixes = rx.status.fixes
    assert fixes, "no fixes"
    last = fixes[-1]
    # combined solve engaged the inter-system bias state
    assert last.isb_m, "single-system solve only"
    # GPS and Galileo share the simulated timescale: ISB is small
    assert abs(list(last.isb_m.values())[0]) < 30.0
    assert last.num_sats >= 6

    truth = gps.rx_ecef
    lat = np.deg2rad(gps.cfg.rx_lat_deg)
    lon = np.deg2rad(gps.cfg.rx_lon_deg)
    errs = np.array([
        ecef_to_enu(f.pos_ecef - truth, lat, lon)
        for f in fixes if f.isb_m
    ])
    assert len(errs) >= 3
    err2d = np.hypot(errs[:, 0], errs[:, 1])
    err3d = np.linalg.norm(errs, axis=1)
    assert np.mean(err2d) < 2.0, f"2D {np.mean(err2d):.2f} m"
    assert np.mean(err3d) < 5.0, f"3D {np.mean(err3d):.2f} m"
