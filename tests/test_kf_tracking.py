"""Kalman tracking engine (conf.kf — reference kf_tracking.cc /
GPS_L1_CA_KF_Tracking analog): the batched correlator with an error-state
EKF replacing the DLL/PLL loop filters.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
from gnss_sdr_tpu.constants import gps_l1_ca as G
from gnss_sdr_tpu.simulate import SatelliteSignalParams, generate_baseband
from gnss_sdr_tpu.tracking import ChannelPhase, DllPllConf, Tracker

FS = 2.6e6
SPS_PER_CHIP = FS / G.CODE_RATE_CPS


def _kf_conf(**overrides):
    defaults = dict(
        fs=FS,
        code_length_chips=G.CODE_LENGTH_CHIPS,
        code_rate_cps=G.CODE_RATE_CPS,
        carrier_freq_hz=G.FREQ_HZ,
        kf=True,
        enable_fll_pull_in=True,
        pull_in_time_s=0.25,
        extend_correlation_symbols=20,
        max_channels=4,
        steps_per_block=20,
    )
    defaults.update(overrides)
    return DllPllConf(**defaults)


def _run(conf, x, tracker, n_blocks):
    results = []
    for _ in range(n_blocks):
        base, w = tracker.window_request()
        if base + w > len(x):
            break
        results.append(tracker.process(x[base: base + w], base))
    return results


def test_kf_tracking_converges():
    rng = np.random.default_rng(21)
    nav_bits = rng.choice([-1.0, 1.0], size=200)
    true_dop = -1234.0
    delay_chips = 400.0
    sat = SatelliteSignalParams(
        prn=5, cn0_dbhz=46.0, doppler_hz=true_dop,
        delay_chips=delay_chips, nav_bits=nav_bits, carrier_phase_rad=1.1,
    )
    x = generate_baseband([sat], FS, int(FS * 2.2), seed=22)
    conf = _kf_conf()
    tracker = Tracker(conf, gps_l1_ca_code_table())
    tracker.start_channel(
        ch=0, prn=5, code_row=4,
        acq_delay_samples=delay_chips * SPS_PER_CHIP + 0.5,
        acq_doppler_hz=true_dop + 90.0,
        acq_samplestamp=0, current_abs_sample=0,
    )
    results = _run(conf, x, tracker, 100)
    assert len(results) >= 90

    # Doppler estimate converges to truth (code Doppler aside, <3 Hz)
    dops = np.concatenate([r.outputs["carrier_doppler"][:, 0] for r in results[-20:]])
    assert abs(np.mean(dops) - true_dop) < 3.0, np.mean(dops)

    # bit sync + extended integration still work under KF control
    events = [e for r in results for e in r.events]
    assert (0, "bit_sync") in events
    assert tracker.ctl[0].phase == ChannelPhase.NARROW

    # C/N0 estimate in a sane range
    assert 40.0 < tracker.ctl[0].cn0_dbhz < 52.0


def test_kf_tracking_dynamic_doppler_ramp():
    # 8 Hz/s carrier acceleration: the 3-state KF tracks the ramp through
    # its freq-rate state; a plain 2nd-order PLL would trail with bias.
    true_dop, ramp = 500.0, 8.0
    sat = SatelliteSignalParams(
        prn=9, cn0_dbhz=48.0, doppler_hz=true_dop, doppler_rate_hz_s=ramp,
        delay_chips=100.0,
    )
    x = generate_baseband([sat], FS, int(FS * 2.2), seed=23)
    conf = _kf_conf()
    tracker = Tracker(conf, gps_l1_ca_code_table())
    tracker.start_channel(
        ch=0, prn=9, code_row=8,
        acq_delay_samples=100.0 * SPS_PER_CHIP,
        acq_doppler_hz=true_dop - 60.0,
        acq_samplestamp=0, current_abs_sample=0,
    )
    results = _run(conf, x, tracker, 100)
    # at t (block b), true doppler = 500 + 8*t
    last = results[-1]
    t_end = last.abs_sample_end[-1, 0] / FS
    expect = true_dop + ramp * t_end
    got = float(last.outputs["carrier_doppler"][-1, 0])
    assert abs(got - expect) < 5.0, (got, expect)


def test_factory_accepts_kf_tracking_string():
    from gnss_sdr_tpu.config.configuration import InMemoryConfiguration
    from gnss_sdr_tpu.receiver.factory import get_signal_plan

    cfg = InMemoryConfiguration()
    cfg.set_property("Tracking_1C.implementation", "GPS_L1_CA_KF_Tracking")
    plan = get_signal_plan(cfg, "1C", FS, 4)
    assert plan.trk_conf.kf
