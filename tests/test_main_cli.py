"""INI-driven full-receiver smoke test (ControlThread-over-config analog,
tests/unit-tests/control-plane/control_thread_test.cc): write a simulated
capture to an ibyte file, drive the whole chain from a .conf, verify
acquisition + tracking engage through the factory-built pipeline.
"""

import numpy as np

from gnss_sdr_tpu.config.configuration import FileConfiguration
from gnss_sdr_tpu.io import encode_samples
from gnss_sdr_tpu.main import run_from_config
from gnss_sdr_tpu.simulate.scenario import GpsScenario, ScenarioConfig

FS = 2.6e6


def test_run_from_config_acquires_and_tracks(tmp_path):
    scen = GpsScenario(ScenarioConfig(
        fs=FS, tow_start_s=7314.0, duration_s=3.0, cn0_dbhz=47.0,
        max_sats=5, seed=1,
    ))
    n = int(3.0 * FS)
    chunks = [scen.generate(s, min(1 << 18, n - s))
              for s in range(0, n, 1 << 18)]
    x = np.concatenate(chunks)
    # scale to int8 range: noise sigma ~= 22 counts
    cap = tmp_path / "cap.dat"
    cap.write_bytes(encode_samples(np.round(x * 16), "ibyte"))

    conf = tmp_path / "rx.conf"
    conf.write_text(f"""
[GNSS-SDR]
GNSS-SDR.internal_fs_sps={int(FS)}
SignalSource.implementation=File_Signal_Source
SignalSource.filename={cap}
SignalSource.item_type=ibyte
SignalSource.sampling_frequency={int(FS)}
SignalConditioner.implementation=Signal_Conditioner
DataTypeAdapter.implementation=Ibyte_To_Complex
InputFilter.implementation=Pass_Through
Resampler.implementation=Pass_Through
Channels_1C.count=5
Acquisition_1C.implementation=GPS_L1_CA_PCPS_Acquisition
Acquisition_1C.doppler_max=5000
Acquisition_1C.doppler_step=250
Acquisition_1C.max_dwells=2
Tracking_1C.implementation=GPS_L1_CA_DLL_PLL_Tracking
Tracking_1C.extend_correlation_symbols=20
Tracking_1C.enable_fll_pull_in=true
PVT.implementation=RTKLIB_PVT
""")
    status = run_from_config(FileConfiguration(conf))
    # all 5 simulated satellites acquired with correct PRNs
    assert {prn for (_, prn) in status.acquired} == set(scen.prns)
    for (_, prn), (dop, delay) in status.acquired.items():
        truth = scen.truth_at(prn, 0.0)
        assert abs(dop - truth["doppler_hz"]) < 300.0


def test_cli_flag_overrides():
    """Reference gnss_sdr_flags.cc analog: CLI flags override config
    properties for every configured signal group."""
    import argparse

    from gnss_sdr_tpu.config.configuration import InMemoryConfiguration
    from gnss_sdr_tpu.main import apply_cli_flags

    ns = argparse.Namespace(
        doppler_max=8000, doppler_step=125, pll_bw_hz=25.0, dll_bw_hz=1.5,
        extend_correlation_ms=10, signal_source=None, s="/tmp/cap.dat",
        rinex_version="3.02")
    cfg = InMemoryConfiguration()
    cfg.set_property("Channels_1C.count", "4")
    cfg.set_property("Channels_1B.count", "2")
    apply_cli_flags(cfg, ns)
    assert cfg.property("Acquisition_1C.doppler_max", 0) == 8000
    assert cfg.property("Acquisition_1B.doppler_max", 0) == 8000
    assert cfg.property("Tracking_1C.extend_correlation_symbols", 0) == 10
    assert cfg.property("Tracking_1B.dll_bw_hz", 0.0) == 1.5
    assert cfg.property("SignalSource.filename", "") == "/tmp/cap.dat"
    assert cfg.property("PVT.rinex_version", "") == "3.02"
