"""Config-driven dual-constellation run: an INI asking for Channels_1C +
Channels_1B must build one SignalPlan per group through the factory and
yield a dual-system fix (the reference gnss_block_factory.cc GetChannels
grouping, driven end-to-end via python -m gnss_sdr_tpu.main's
run_from_config)."""

import numpy as np
import pytest

from gnss_sdr_tpu.config.configuration import FileConfiguration
from gnss_sdr_tpu.io import encode_samples
from gnss_sdr_tpu.main import run_from_config
from gnss_sdr_tpu.pvt.coords import ecef_to_enu
from gnss_sdr_tpu.receiver.factory import UnknownImplementation, get_signal_plans
from gnss_sdr_tpu.simulate.galileo import GalileoScenario, GalileoScenarioConfig
from gnss_sdr_tpu.simulate.scenario import GpsScenario, ScenarioConfig

FS = 2.6e6


def test_signal_plans_from_config():
    from gnss_sdr_tpu.config.configuration import InMemoryConfiguration

    cfg = InMemoryConfiguration({
        "Channels_1C.count": 4,
        "Channels_1B.count": 3,
        "Channels_5X.count": 2,
        "Tracking_1C.pll_bw_hz": 25.0,
        "Acquisition_1B.doppler_max": 4000,
    })
    plans = get_signal_plans(cfg, {"L1": FS, "L5": 10.4e6})
    by_name = {p.name: p for p in plans}
    assert set(by_name) == {"1C", "1B", "5X"}
    assert by_name["1C"].num_channels == 4
    assert by_name["1C"].trk_conf.pll_bw_hz == 25.0
    assert by_name["1B"].acq_conf.doppler_max_hz == 4000
    assert by_name["5X"].band == "L5" and by_name["5X"].fs == 10.4e6
    assert by_name["5X"].trk_conf.track_pilot


def test_unbacked_impl_string_rejected():
    from gnss_sdr_tpu.config.configuration import InMemoryConfiguration

    cfg = InMemoryConfiguration({
        "Channels_1C.count": 2,
        # a string the factory has no engine for must be rejected loudly,
        # not silently mapped to a default (gnss_block_factory.cc errors
        # on unknown implementation names the same way)
        "Tracking_1C.implementation": "GPS_L1_CA_Quantum_Tracking",
    })
    with pytest.raises(UnknownImplementation):
        get_signal_plans(cfg, FS)

    # GPS_L1_CA_KF_Tracking gained a real engine in round 4 and must now
    # be accepted (tracking/gaussian.py KF engine)
    cfg2 = InMemoryConfiguration({
        "Channels_1C.count": 2,
        "Tracking_1C.implementation": "GPS_L1_CA_KF_Tracking",
    })
    plans = get_signal_plans(cfg2, FS)
    assert plans and plans[0].name == "1C"


def test_config_driven_dual_constellation_fix(tmp_path):
    common = dict(
        fs=FS, duration_s=30.0, rx_clock_bias_s=1.1e-4,
        min_elevation_deg=15.0, max_sats=4,
    )
    gps = GpsScenario(ScenarioConfig(
        tow_start_s=7314.0, cn0_dbhz=46.0, seed=1, **common))
    gal = GalileoScenario(GalileoScenarioConfig(
        tow_start_s=7314.0, cn0_dbhz=46.0, seed=3, noise=False, **common))
    assert len(gps.prns) >= 4 and len(gal.prns) >= 4

    n = gps.total_samples
    cap = tmp_path / "dual.dat"
    with cap.open("wb") as f:
        for s in range(0, n, 1 << 20):
            k = min(1 << 20, n - s)
            x = gps.generate(s, k) + gal.generate(s, k)
            f.write(encode_samples(np.round(x * 16), "ishort"))

    conf = tmp_path / "rx.conf"
    conf.write_text(f"""
[GNSS-SDR]
GNSS-SDR.internal_fs_sps={int(FS)}
SignalSource.implementation=File_Signal_Source
SignalSource.filename={cap}
SignalSource.item_type=ishort
SignalSource.sampling_frequency={int(FS)}
SignalConditioner.implementation=Pass_Through
Channels_1C.count=4
Channels_1B.count=4
Acquisition_1C.implementation=GPS_L1_CA_PCPS_Acquisition
Acquisition_1C.max_dwells=2
Tracking_1C.implementation=GPS_L1_CA_DLL_PLL_Tracking
Tracking_1C.enable_fll_pull_in=true
Acquisition_1B.implementation=Galileo_E1_PCPS_Ambiguous_Acquisition
Acquisition_1B.doppler_step=125
Tracking_1B.implementation=Galileo_E1_DLL_PLL_VEML_Tracking
Tracking_1B.enable_fll_pull_in=true
PVT.implementation=RTKLIB_PVT
""")
    status = run_from_config(FileConfiguration(conf))
    systems = {k[0] for k in status.acquired}
    assert systems == {"G", "E"}, status.acquired
    assert len(status.fixes) >= 5, f"only {len(status.fixes)} fixes"
    # last fixes must blend both systems (one ISB state estimated)
    assert status.fixes[-1].isb_m, "no inter-system bias state"
    assert {k[0] for k in status.fixes[-1].used} == {"G", "E"}
    truth = gps.rx_ecef
    lat = np.deg2rad(gps.cfg.rx_lat_deg)
    lon = np.deg2rad(gps.cfg.rx_lon_deg)
    errs = np.array([
        ecef_to_enu(f.pos_ecef - truth, lat, lon) for f in status.fixes[3:]
    ])
    err_3d = np.linalg.norm(errs, axis=1)
    assert np.mean(err_3d) < 5.0, f"mean 3D error {np.mean(err_3d):.2f} m"
