"""Batched PCPS acquisition tests.

Mirrors the reference's gps_l1_ca_pcps_acquisition_test.cc strategy
(tests/unit-tests/signal-processing-blocks/acquisition/): feed a synthetic
signal with known delay/Doppler, assert detection and error bounds; assert
no detection for an absent PRN.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.acquisition import AcqConfig, PcpsAcquisition
from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
from gnss_sdr_tpu.constants import gps_l1_ca as G
from gnss_sdr_tpu.simulate import SatelliteSignalParams, generate_baseband

FS = 2.046e6  # 2 samples/chip


def _make_engine(**overrides):
    defaults = dict(
        fs=FS,
        code_length_chips=G.CODE_LENGTH_CHIPS,
        code_rate_cps=G.CODE_RATE_CPS,
        doppler_max_hz=5000.0,
        doppler_step_hz=250.0,
        max_dwells=2,
        pfa=1e-3,
    )
    defaults.update(overrides)
    conf = AcqConfig(**defaults)
    return PcpsAcquisition(conf, gps_l1_ca_code_table(), list(range(1, 33)))


def test_acquisition_detects_known_signal():
    eng = _make_engine()
    conf = eng.conf
    sats = [
        SatelliteSignalParams(prn=7, cn0_dbhz=46.0, doppler_hz=1000.0, delay_chips=300.25),
        SatelliteSignalParams(prn=12, cn0_dbhz=46.0, doppler_hz=-2750.0, delay_chips=911.0),
    ]
    x = generate_baseband(sats, FS, conf.input_samples, seed=1)
    # channels: PRN7, PRN12, PRN20 (absent)
    xb = np.stack([x, x, x])
    res = eng.acquire(xb, np.array([6, 11, 19]))

    assert res.detected[0] and res.detected[1]
    assert not res.detected[2]

    sps_per_chip = FS / G.CODE_RATE_CPS
    assert abs(res.delay_samples[0] - 300.25 * sps_per_chip) <= 1.0
    assert abs(res.doppler_hz[0] - 1000.0) <= conf.doppler_step_hz / 2
    assert abs(res.delay_samples[1] - 911.0 * sps_per_chip) <= 1.0
    assert abs(res.doppler_hz[1] - (-2750.0)) <= conf.doppler_step_hz / 2
    # absent PRN statistic well below the detected ones
    assert res.test_statistic[2] < res.test_statistic[0] / 2


def test_two_step_doppler_zoom():
    # 4 ms coherent integration so 31.25 Hz bins are resolvable (the fine
    # step is only meaningful when the coherent window supports it).
    eng = _make_engine(make_two_steps=True, doppler_step2_hz=31.25,
                       num_doppler_bins_step2=4,
                       coherent_integration_periods=4, max_dwells=1)
    conf = eng.conf
    true_dop = 1130.0  # off the 250 Hz coarse grid
    sats = [SatelliteSignalParams(prn=3, cn0_dbhz=48.0, doppler_hz=true_dop,
                                  delay_chips=512.5)]
    x = generate_baseband(sats, FS, conf.input_samples, seed=2)
    res = eng.acquire(x[None, :], np.array([2]))
    assert res.detected[0]
    assert abs(res.doppler_hz[0] - true_dop) <= conf.doppler_step2_hz


def test_noise_only_false_alarm_rate():
    # With pfa=1e-3 per attempt, 16 noise-only attempts should yield no hits.
    eng = _make_engine(pfa=1e-3, max_dwells=1)
    conf = eng.conf
    rng = np.random.default_rng(3)
    n = 16
    x = (rng.normal(size=(n, conf.input_samples))
         + 1j * rng.normal(size=(n, conf.input_samples))).astype(np.complex64) * np.sqrt(0.5)
    res = eng.acquire(x, np.arange(n, dtype=np.int32))
    assert not res.detected.any(), res.test_statistic


def test_bit_transition_mode():
    # A bit flip in the middle of the coherent window must not kill detection
    # when bit_transition_flag is set (double-length zero-padded-code FFT).
    eng = _make_engine(bit_transition_flag=True, max_dwells=1)
    conf = eng.conf
    bits = np.array([1, -1, 1, -1, 1, -1], dtype=np.float64)
    sats = [SatelliteSignalParams(prn=5, cn0_dbhz=48.0, doppler_hz=500.0,
                                  delay_chips=100.0, nav_bits=bits)]
    x = generate_baseband(sats, FS, conf.input_samples, seed=4)
    res = eng.acquire(x[None, :], np.array([4]))
    assert res.detected[0]
    assert abs(res.delay_samples[0] - 100.0 * FS / G.CODE_RATE_CPS) <= 1.0
