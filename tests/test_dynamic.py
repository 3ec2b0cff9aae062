"""Dynamic-scenario system test: moving receiver + PVT Kalman smoothing.

Mirrors the reference's dynamic position_test gates
(position_test_flags.h:43-44, position_test.cc:1024-1025):
3D position RMSE < 10 m, 3D velocity RMSE < 5 m/s, with Pvt KF engaged
(Pvt.enable_pvt_kf -> pvt_kf.cc analog in pvt/kf.py)."""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.simulate.scenario import GpsScenario, ScenarioConfig

FS = 2.6e6


@pytest.fixture(scope="module")
def dynamic_receiver():
    scen = GpsScenario(ScenarioConfig(
        fs=FS,
        tow_start_s=7314.0,
        duration_s=32.0,
        cn0_dbhz=46.0,
        rx_clock_bias_s=1.5e-4,
        rx_vel_enu_mps=(12.0, -8.0, 0.0),   # ~14.4 m/s ground vehicle
        max_sats=6,
        min_elevation_deg=15.0,
        seed=1,
    ))
    assert len(scen.prns) >= 5, scen.prns
    rx = Receiver(ReceiverConfig(
        fs=FS, num_channels=6, enable_pvt_kf=True,
        # motion decorrelates slower than the static Hatch window; keep
        # smoothing short enough that filter lag stays sub-meter
        carrier_smoothing_epochs=100,
    ))
    chunk = int(FS)
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


def test_dynamic_position_rmse(dynamic_receiver):
    scen, rx = dynamic_receiver
    fixes = rx.status.fixes
    assert len(fixes) >= 8, f"only {len(fixes)} fixes"
    errs = []
    for f in fixes[3:]:
        t = f.tow_s - scen.cfg.tow_start_s
        truth = scen.rx_ecef_at(t)
        errs.append(np.linalg.norm(f.pos_ecef - truth))
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    # reference dynamic gate: 3D position RMSE < 10 m
    assert rmse < 10.0, f"3D pos RMSE {rmse:.2f} m"


def test_dynamic_velocity_rmse(dynamic_receiver):
    scen, rx = dynamic_receiver
    fixes = rx.status.fixes
    errs = [np.linalg.norm(f.vel_ecef - scen.rx_vel_ecef)
            for f in fixes[3:]]
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    # reference dynamic gate: 3D velocity RMSE < 5 m/s
    assert rmse < 5.0, f"3D vel RMSE {rmse:.2f} m/s"
    # and the KF-smoothed velocity should be far tighter on a constant-
    # velocity trajectory
    assert rmse < 1.0, f"KF velocity RMSE {rmse:.2f} m/s"
