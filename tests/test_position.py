"""End-to-end system test: signal synthesis -> full receiver -> position fix.

Mirrors the reference's tests/system-tests/position_test.cc: run the whole
receiver over a simulated capture with known truth and assert the static
accuracy gates (2D < 2 m, 3D < 5 m; position_test_flags.h:39-40), plus TTFF
reporting (ttff.cc analog).
"""

import numpy as np
import pytest

from gnss_sdr_tpu.pvt.coords import ecef_to_enu, llh_to_ecef
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.simulate.scenario import GpsScenario, ScenarioConfig

FS = 2.6e6


@pytest.fixture(scope="module")
def running_receiver():
    scen = GpsScenario(ScenarioConfig(
        fs=FS,
        # start at a subframe-5 boundary (epoch 1219): the receiver syncs
        # during SF5, then SF1/SF2/SF3 complete at t=12/18/24 s
        tow_start_s=7314.0,
        duration_s=32.0,
        cn0_dbhz=46.0,
        rx_clock_bias_s=2.1e-4,
        max_sats=6,
        min_elevation_deg=15.0,
        seed=1,
    ))
    assert len(scen.prns) >= 5, scen.prns

    rx = Receiver(ReceiverConfig(fs=FS, num_channels=6))
    chunk = int(FS)  # 1 s
    total = scen.total_samples
    fed = 0
    acquired = False
    while fed < total:
        n = min(chunk, total - fed)
        rx.feed(scen.generate(fed, n))
        fed += n
        if not acquired:
            got = rx.acquire()
            acquired = len(got) >= 4
        rx.run()
    return scen, rx


def test_acquisition_found_visible_sats(running_receiver):
    scen, rx = running_receiver
    assert len(rx.status.acquired) >= 4
    # acquired Dopplers match geometry truth within one bin
    for (sysid, prn), (dop, delay) in rx.status.acquired.items():
        if prn not in scen.prns:
            continue
        truth = scen.truth_at(prn, 0.0)
        assert abs(dop - truth["doppler_hz"]) <= 250.0, (prn, dop, truth["doppler_hz"])


def test_telemetry_decoded(running_receiver):
    scen, rx = running_receiver
    assert rx.status.subframes >= 8
    assert len(rx.ephemerides) >= 4
    for (sysid, prn), eph in rx.ephemerides.items():
        true_eph = scen.ephs[prn]
        assert abs(eph.sqrt_a - true_eph.sqrt_a) <= 2.0**-19 + 1e-12
        assert abs(eph.toe - true_eph.toe) < 1e-9


def test_position_fix_accuracy(running_receiver):
    scen, rx = running_receiver
    fixes = rx.status.fixes
    assert len(fixes) >= 10, f"only {len(fixes)} fixes"
    truth = scen.rx_ecef
    lat = np.deg2rad(scen.cfg.rx_lat_deg)
    lon = np.deg2rad(scen.cfg.rx_lon_deg)

    # discard the first few fixes (filter/anchor settling)
    errs_enu = np.array([
        ecef_to_enu(f.pos_ecef - truth, lat, lon) for f in fixes[3:]
    ])
    err_2d = np.hypot(errs_enu[:, 0], errs_enu[:, 1])
    err_3d = np.linalg.norm(errs_enu, axis=1)
    # reference static accuracy gates (position_test_flags.h:39-40)
    assert np.mean(err_2d) < 2.0, f"mean 2D error {np.mean(err_2d):.2f} m"
    assert np.mean(err_3d) < 5.0, f"mean 3D error {np.mean(err_3d):.2f} m"
    # DRMS / precision
    assert np.sqrt(np.mean(err_2d**2)) < 3.0

    # static scenario: velocity near zero
    vels = np.array([np.linalg.norm(f.vel_ecef) for f in fixes[3:]])
    assert np.mean(vels) < 0.5, f"mean speed {np.mean(vels):.3f} m/s"


def test_ttff_reported(running_receiver):
    scen, rx = running_receiver
    assert rx.status.ttff_s is not None
    # cold start: needs subframes 1-3 => at least ~18 s, under the capture
    assert 10.0 < rx.status.ttff_s < 32.0
