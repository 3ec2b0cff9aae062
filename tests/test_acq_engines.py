"""Acquisition engine variants: fine-Doppler zoom, Tong sequential
detector, QuickSync folding, CCCWSR (E1 CBOC), assisted acquisition.

Reference analogs: pcps_acquisition_fine_doppler_cc.cc,
pcps_tong_acquisition_cc.cc, pcps_quicksync_acquisition_cc.cc,
pcps_cccwsr_acquisition_cc.cc, gps_l1_ca_pcps_assisted_acquisition.cc.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.acquisition import (
    AcqConfig,
    AssistedAcquisition,
    CccwsrAcquisition,
    FineDopplerAcquisition,
    QuickSyncAcquisition,
    TongAcquisition,
)
from gnss_sdr_tpu.codes.galileo_e1 import galileo_e1b_code
from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
from gnss_sdr_tpu.constants import gps_l1_ca as G
from gnss_sdr_tpu.simulate import SatelliteSignalParams, generate_baseband

FS = 2.046e6


def _conf(**overrides):
    defaults = dict(
        fs=FS,
        code_length_chips=G.CODE_LENGTH_CHIPS,
        code_rate_cps=G.CODE_RATE_CPS,
        doppler_max_hz=5000.0,
        doppler_step_hz=250.0,
        max_dwells=1,
        pfa=1e-3,
    )
    defaults.update(overrides)
    return AcqConfig(**defaults)


def test_fine_doppler_iterative_zoom():
    conf = _conf(doppler_step_hz=500.0, coherent_integration_periods=4,
                 num_doppler_bins_step2=4)
    eng = FineDopplerAcquisition(conf, gps_l1_ca_code_table(),
                                 list(range(1, 33)), iterations=4)
    true_dop = 1337.0  # far off the 500 Hz coarse grid
    sats = [SatelliteSignalParams(prn=9, cn0_dbhz=48.0, doppler_hz=true_dop,
                                  delay_chips=222.5)]
    x = generate_baseband(sats, FS, conf.input_samples, seed=11)
    res = eng.acquire(x[None, :], np.array([8]))
    assert res.detected[0]
    # final resolution: 500 / 2^4 = 31.25 Hz
    assert abs(res.doppler_hz[0] - true_dop) <= 500.0 / 2**4
    assert abs(res.delay_samples[0] - 222.5 * FS / G.CODE_RATE_CPS) <= 1.0


def test_tong_declares_on_signal_dismisses_on_noise():
    conf = _conf()
    eng = TongAcquisition(conf, gps_l1_ca_code_table(), list(range(1, 33)),
                          tong_init=1, tong_max=3, max_attempts=10)
    win = eng.inner.conf.input_samples
    sats = [SatelliteSignalParams(prn=4, cn0_dbhz=46.0, doppler_hz=-800.0,
                                  delay_chips=500.0)]
    x_sig = generate_baseband(sats, FS, win * 10, seed=12)
    rng = np.random.default_rng(13)
    x_noise = (rng.normal(size=win * 10) + 1j * rng.normal(size=win * 10)
               ).astype(np.complex64) * np.sqrt(0.5)
    xb = np.stack([x_sig, x_noise])
    res = eng.acquire(xb, np.array([3, 3]))
    assert res.detected[0]
    assert not res.detected[1]
    assert abs(res.doppler_hz[0] - (-800.0)) <= conf.doppler_step_hz / 2
    assert abs(res.delay_samples[0] - 500.0 * FS / G.CODE_RATE_CPS) <= 1.0


def test_quicksync_folding_recovers_full_delay():
    conf = _conf(doppler_step_hz=250.0)
    eng = QuickSyncAcquisition(conf, gps_l1_ca_code_table(),
                               list(range(1, 33)), folding_factor=2)
    # delay in the SECOND half of the code period — requires disambiguation
    true_delay_chips = 700.0
    sats = [SatelliteSignalParams(prn=17, cn0_dbhz=50.0, doppler_hz=1500.0,
                                  delay_chips=true_delay_chips)]
    x = generate_baseband(sats, FS, eng.win, seed=14)
    res = eng.acquire(x[None, :], np.array([16]))
    assert res.detected[0]
    got_chips = res.delay_samples[0] * G.CODE_RATE_CPS / FS
    assert abs(got_chips - true_delay_chips) <= 1.0
    assert got_chips > G.CODE_LENGTH_CHIPS / 2  # really the unfolded lag


def test_quicksync_noise_rejection():
    conf = _conf()
    eng = QuickSyncAcquisition(conf, gps_l1_ca_code_table(),
                               list(range(1, 33)), folding_factor=2)
    rng = np.random.default_rng(15)
    x = (rng.normal(size=(4, eng.win)) + 1j * rng.normal(size=(4, eng.win))
         ).astype(np.complex64) * np.sqrt(0.5)
    res = eng.acquire(x, np.arange(4, dtype=np.int32))
    assert not res.detected.any()


def _e1b_cboc_baseband(prn, fs, n, cn0_dbhz, doppler_hz, delay_chips, seed):
    """E1-B CBOC(6,1,1/11) baseband: subchips at 12x the code rate."""
    from gnss_sdr_tpu.codes.galileo_e1 import cboc_expand
    from gnss_sdr_tpu.constants import galileo_e1 as GAL

    sub = cboc_expand(galileo_e1b_code(prn)).astype(np.float64)  # [4092*12]
    sub_rate = 12.0 * GAL.CODE_RATE_CPS
    t = np.arange(n, dtype=np.float64) / fs
    ph = (t * GAL.CODE_RATE_CPS - delay_chips) * 12.0
    s = sub[np.floor(ph).astype(np.int64) % len(sub)]
    amp = np.sqrt(10.0 ** (cn0_dbhz / 10.0) / fs)
    rng = np.random.default_rng(seed)
    x = amp * s * np.exp(2j * np.pi * doppler_hz * t)
    x += rng.normal(scale=np.sqrt(0.5), size=n) + 1j * rng.normal(
        scale=np.sqrt(0.5), size=n)
    return x.astype(np.complex64)


def test_cccwsr_e1_cboc():
    from gnss_sdr_tpu.constants import galileo_e1 as GAL

    fs = 4.092e6
    conf = AcqConfig(
        fs=fs,
        code_length_chips=GAL.CODE_LENGTH_CHIPS,
        code_rate_cps=GAL.CODE_RATE_CPS,
        doppler_max_hz=4000.0,
        doppler_step_hz=125.0,
        pfa=1e-3,
    )
    prns = list(range(1, 11))
    chips = np.stack([galileo_e1b_code(p) for p in prns])
    eng = CccwsrAcquisition(conf, chips, prns)
    x = _e1b_cboc_baseband(5, fs, eng.win, cn0_dbhz=48.0, doppler_hz=750.0,
                           delay_chips=1000.25, seed=16)
    xb = np.stack([x, x])  # PRN5 present, PRN8 absent
    res = eng.acquire(xb, np.array([4, 7]))
    assert res.detected[0]
    assert not res.detected[1]
    assert abs(res.doppler_hz[0] - 750.0) <= conf.doppler_step_hz
    assert abs(res.delay_samples[0] - 1000.25 * fs / GAL.CODE_RATE_CPS) <= 2.0


def test_assisted_narrow_window():
    conf = _conf(doppler_step_hz=125.0)
    predicted = {p: 0.0 for p in range(1, 33)}
    predicted[21] = 3900.0  # assistance says ~3.9 kHz
    eng = AssistedAcquisition(conf, gps_l1_ca_code_table(),
                              list(range(1, 33)), predicted, window_hz=500.0)
    true_dop = 4100.0  # inside the +-500 Hz assisted window
    sats = [SatelliteSignalParams(prn=21, cn0_dbhz=46.0, doppler_hz=true_dop,
                                  delay_chips=50.0)]
    x = generate_baseband(sats, FS, eng.conf.input_samples, seed=17)
    res = eng.acquire(x[None, :], np.array([20]))
    assert res.detected[0]
    assert abs(res.doppler_hz[0] - true_dop) <= conf.doppler_step_hz
    # the narrow grid is ~9 bins vs 81 for the full search
    assert len(eng.inner.conf.doppler_grid_hz()) < 12


def test_noncoherent_iq_e5a():
    """Noncoherent I+Q combining captures the full QPSK power without
    knowing either component's secondary phase (reference
    galileo_e5a_noncoherent_iq_acquisition_caf_cc)."""
    from gnss_sdr_tpu.acquisition import NoncoherentIQAcquisition
    from gnss_sdr_tpu.codes.galileo_e5a import (
        galileo_e5ai_code,
        galileo_e5aq_code,
    )
    from gnss_sdr_tpu.constants import galileo_e5a as E5A

    fs = 12.0e6
    conf = AcqConfig(
        fs=fs,
        code_length_chips=E5A.CODE_LENGTH_CHIPS,
        code_rate_cps=E5A.CODE_RATE_CPS,
        doppler_max_hz=3000.0,
        doppler_step_hz=250.0,
        pfa=1e-3,
    )
    prns = list(range(1, 9))
    data = np.stack([galileo_e5ai_code(p) for p in prns]).astype(np.float32)
    pilot = np.stack([galileo_e5aq_code(p) for p in prns]).astype(np.float32)
    eng = NoncoherentIQAcquisition(conf, data, pilot, prns)

    sats = [SatelliteSignalParams(prn=4, system="E", signal="5X",
                                  cn0_dbhz=49.0, doppler_hz=-1200.0,
                                  delay_chips=4000.5)]
    x = generate_baseband(sats, fs, eng.win, seed=21)
    xb = np.stack([x, x])  # PRN4 present, PRN7 absent
    res = eng.acquire(xb, np.array([3, 6]))
    assert res.detected[0]
    assert not res.detected[1]
    assert abs(res.doppler_hz[0] - (-1200.0)) <= conf.doppler_step_hz
    assert abs(res.delay_samples[0] - 4000.5 * fs / E5A.CODE_RATE_CPS) <= 2.0
