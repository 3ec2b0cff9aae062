"""Receiver-clock feedback: a receiver starting with a large clock bias
must slew its observables clock from the PVT estimate (reference
apply_rx_clock_offset) and keep fixing inside the gates, with the residual
bias collapsing below the correction threshold."""

import numpy as np
import pytest

from gnss_sdr_tpu.pvt.coords import ecef_to_enu
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.simulate.scenario import GpsScenario, ScenarioConfig

FS = 2.6e6


def test_rx_clock_correction_loop():
    scen = GpsScenario(ScenarioConfig(
        fs=FS, tow_start_s=7314.0, duration_s=30.0, cn0_dbhz=46.0,
        rx_clock_bias_s=2.5e-3,       # 2.5 ms: ~750 km of pseudorange
        max_sats=6, min_elevation_deg=15.0, seed=1,
    ))
    # the rx clock initializes itself from the first TOW anchor with a
    # nominal 68.8 ms transit, so the startup bias is the per-satellite
    # transit mismatch (sub-ms); a tight threshold exercises the loop
    rx = Receiver(ReceiverConfig(fs=FS, num_channels=6,
                                 rx_clock_correction_s=2e-4))
    chunk = int(FS)
    acquired = False
    for i in range(30):
        rx.feed(scen.generate(i * chunk, chunk))
        if not acquired:
            acquired = len(rx.acquire()) >= 4
        rx.run()

    fixes = rx.status.fixes
    assert len(fixes) >= 6, f"only {len(fixes)} fixes"
    # the first fix carries the anchor-vs-transit startup bias; after the
    # slew the estimate stays under the correction threshold
    assert abs(fixes[0].clock_bias_s) > 4e-4
    assert all(abs(f.clock_bias_s) < 2.5e-4 for f in fixes[2:])

    truth = scen.rx_ecef
    lat = np.deg2rad(scen.cfg.rx_lat_deg)
    lon = np.deg2rad(scen.cfg.rx_lon_deg)
    errs = np.array([
        ecef_to_enu(f.pos_ecef - truth, lat, lon) for f in fixes[3:]
    ])
    err_3d = np.linalg.norm(errs, axis=1)
    assert np.mean(err_3d) < 5.0, f"mean 3D error {np.mean(err_3d):.2f} m"
