"""Closed-loop tracking tests.

Mirrors the reference strategy (gps_l1_ca_dll_pll_tracking_test.cc:241,462;
tracking_pull-in_test.cc): generate a simulated scenario with known truth,
run tracking from acquisition-grade initial errors, and check convergence of
Doppler / code phase, bit synchronization, extended integration, C/N0
estimation, nav-bit recovery, and loss-of-lock detection.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
from gnss_sdr_tpu.constants import gps_l1_ca as G
from gnss_sdr_tpu.simulate import SatelliteSignalParams, generate_baseband
from gnss_sdr_tpu.tracking import ChannelPhase, DllPllConf, Tracker

# Non-commensurate sampling (≈2.54 samples/chip): an *integer* samples/chip
# ratio puts the floor-resampled replica's E-L discriminator in a dead zone
# (code transitions quantize to the same samples over a ±quarter-chip range);
# receivers sample away from integer ratios for exactly this reason.
FS = 2.6e6
SPS_PER_CHIP = FS / G.CODE_RATE_CPS


def _make_conf(**overrides):
    defaults = dict(
        fs=FS,
        code_length_chips=G.CODE_LENGTH_CHIPS,
        code_rate_cps=G.CODE_RATE_CPS,
        carrier_freq_hz=G.FREQ_HZ,
        pll_bw_hz=35.0,
        dll_bw_hz=2.0,
        enable_fll_pull_in=True,
        pull_in_time_s=0.25,
        pll_bw_narrow_hz=7.5,
        dll_bw_narrow_hz=0.75,
        extend_correlation_symbols=20,
        max_channels=4,
        steps_per_block=20,
    )
    defaults.update(overrides)
    return DllPllConf(**defaults)


def _run_tracking(conf, x, tracker, n_blocks):
    results = []
    for _ in range(n_blocks):
        base, w = tracker.window_request()
        if base + w > len(x):
            break
        results.append(tracker.process(x[base : base + w], base))
    return results


@pytest.fixture(scope="module")
def scenario():
    """120-block (2.4 s) single-satellite scenario with nav bits."""
    rng = np.random.default_rng(11)
    nav_bits = rng.choice([-1.0, 1.0], size=200)
    true_dop = 820.0
    delay_chips = 250.0  # on a sample boundary: 500 samples at 2 sps/chip
    sat = SatelliteSignalParams(
        prn=7, cn0_dbhz=47.0, doppler_hz=true_dop,
        delay_chips=delay_chips, nav_bits=nav_bits, carrier_phase_rad=0.7,
    )
    num = int(FS * 2.5)
    x = generate_baseband([sat], FS, num, seed=5)
    return x, sat, nav_bits, true_dop, delay_chips


def test_tracking_converges_and_syncs(scenario):
    x, sat, nav_bits, true_dop, delay_chips = scenario
    conf = _make_conf()
    tracker = Tracker(conf, gps_l1_ca_code_table())
    # acquisition-grade handoff: doppler off by 120 Hz, delay exact in samples
    tracker.start_channel(
        ch=1, prn=7, code_row=6,
        acq_delay_samples=delay_chips * SPS_PER_CHIP,
        acq_doppler_hz=true_dop - 120.0,
        acq_samplestamp=0, current_abs_sample=0,
    )
    results = _run_tracking(conf, x, tracker, 110)
    assert len(results) >= 100

    # bit sync found and extended integration engaged
    events = [e for r in results for e in r.events]
    assert (1, "bit_sync") in events
    assert tracker.ctl[1].phase == ChannelPhase.NARROW

    # doppler converged (steady state = last 20 blocks)
    dops = np.concatenate([r.outputs["carrier_doppler"][:, 1] for r in results])
    assert abs(np.mean(dops[-400:]) - true_dop) < 5.0
    assert np.std(dops[-400:]) < 10.0

    # code tracking: reported code phase matches the signal's true code phase
    # at the end-of-period sample stamps (within 0.1 chips)
    last = results[-1]
    stamps = last.abs_sample_end[:, 1].astype(np.float64)
    code_rate_eff = sat.code_rate() * (1.0 + true_dop / sat.carrier_freq())
    true_phase = (stamps / FS) * code_rate_eff - delay_chips
    true_frac = np.mod(true_phase, G.CODE_LENGTH_CHIPS)
    rep = last.outputs["rem_code_phase"][:, 1]
    err = (rep - true_frac + G.CODE_LENGTH_CHIPS / 2) % G.CODE_LENGTH_CHIPS - (
        G.CODE_LENGTH_CHIPS / 2
    )
    assert np.max(np.abs(err)) < 0.1, err

    # C/N0 estimate in the right ballpark
    assert 41.0 < tracker.ctl[1].cn0_dbhz < 53.0
    # carrier locked
    assert tracker.ctl[1].carrier_lock > 0.8


def test_nav_bits_recovered(scenario):
    x, sat, nav_bits, true_dop, delay_chips = scenario
    conf = _make_conf()
    tracker = Tracker(conf, gps_l1_ca_code_table())
    tracker.start_channel(
        ch=0, prn=7, code_row=6,
        acq_delay_samples=delay_chips * SPS_PER_CHIP,
        acq_doppler_hz=true_dop - 80.0,
        acq_samplestamp=0, current_abs_sample=0,
    )
    results = _run_tracking(conf, x, tracker, 110)

    # collect extended-integration prompts (one per nav bit) with stamps
    sym_vals, sym_stamps = [], []
    for r in results:
        b = r.outputs["boundary"][:, 0]
        n_acc = r.outputs["acc_samples"][:, 0]
        for s_i in np.nonzero(b)[0]:
            if n_acc[s_i] > conf.samples_per_code * (
                conf.extend_correlation_symbols - 0.5
            ):
                sym_vals.append(r.outputs["acc_prompt"][s_i, 0])
                sym_stamps.append(r.abs_sample_end[s_i, 0])
    assert len(sym_vals) >= 55
    sym_vals = np.asarray(sym_vals)
    sym_stamps = np.asarray(sym_stamps, dtype=np.float64)

    # truth: bit active at the transmit-time period covering each symbol
    code_rate_eff = sat.code_rate() * (1.0 + true_dop / sat.carrier_freq())
    # midpoint of the symbol (10 periods back from the end stamp)
    mid_phase = (
        (sym_stamps - 10 * conf.samples_per_code) / FS
    ) * code_rate_eff - delay_chips
    bit_idx = np.floor_divide(
        np.floor_divide(mid_phase.astype(np.int64), G.CODE_LENGTH_CHIPS),
        conf.codes_per_bit,
    ) % len(nav_bits)
    truth = nav_bits[bit_idx]
    got = np.sign(sym_vals.real)
    # coherent sign ambiguity: accept either polarity, require consistency
    agree = np.mean(got == truth)
    assert agree > 0.98 or agree < 0.02, agree


def test_loss_of_lock_detected():
    conf = _make_conf(max_lock_fail_blocks=2, lock_warmup_s=0.2)
    tracker = Tracker(conf, gps_l1_ca_code_table())
    rng = np.random.default_rng(3)
    n = int(FS * 1.0)
    # noise only — channel starts on a phantom acquisition
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64) * np.sqrt(0.5)
    tracker.start_channel(
        ch=2, prn=5, code_row=4,
        acq_delay_samples=100.0, acq_doppler_hz=500.0,
        acq_samplestamp=0, current_abs_sample=0,
    )
    results = _run_tracking(conf, x, tracker, 40)
    events = [e for r in results for e in r.events]
    assert (2, "loss_of_lock") in events
    assert tracker.ctl[2].phase == ChannelPhase.LOST


def test_two_channels_independent(scenario):
    """Two satellites tracked simultaneously in one batch."""
    x, sat, nav_bits, true_dop, delay_chips = scenario
    sat2 = SatelliteSignalParams(
        prn=12, cn0_dbhz=45.0, doppler_hz=-1600.0, delay_chips=700.0,
        carrier_phase_rad=2.1,
    )
    x2 = x + np.asarray(
        generate_baseband([sat2], FS, len(x), noise=False, seed=0)
    )
    conf = _make_conf()
    tracker = Tracker(conf, gps_l1_ca_code_table())
    tracker.start_channel(0, 7, 6, delay_chips * SPS_PER_CHIP,
                          true_dop - 100.0, 0, 0)
    tracker.start_channel(3, 12, 11, 700.0 * SPS_PER_CHIP, -1600.0 + 90.0, 0, 0)
    results = _run_tracking(conf, x2, tracker, 100)
    dops0 = np.concatenate([r.outputs["carrier_doppler"][:, 0] for r in results])
    dops3 = np.concatenate([r.outputs["carrier_doppler"][:, 3] for r in results])
    assert abs(np.mean(dops0[-300:]) - true_dop) < 5.0
    assert abs(np.mean(dops3[-300:]) - (-1600.0)) < 5.0


# ------------------------------------------------------- pilot (GPS L5-like)
def test_pilot_secondary_tracking_l5():
    """GPS L5 pilot tracking: secondary (NH20) sync acquired from prompt
    signs, on-device wipeoff engaged, PLL switches to four-quadrant atan2,
    coherent integration extends past the 10 ms data symbol, and the data
    symbols are recovered on the quadrature axis (reference track_pilot +
    acquire_secondary, dll_pll_veml_tracking.cc:1120-1165)."""
    from gnss_sdr_tpu.codes.gps_l5 import (
        gps_l5i_code_table,
        gps_l5q_code_table,
        nh10_levels,
        nh20_levels,
    )
    from gnss_sdr_tpu.constants import gps_l5 as L5

    FS5 = 12.5e6
    rng = np.random.default_rng(21)
    nav = rng.choice([-1.0, 1.0], size=300)     # 100 sps symbols
    true_dop = 1234.0
    delay_chips = 2500.0
    sat = SatelliteSignalParams(
        prn=3, signal="L5", cn0_dbhz=50.0, doppler_hz=true_dop,
        delay_chips=delay_chips, nav_bits=nav, carrier_phase_rad=0.9,
    )
    x = generate_baseband([sat], FS5, int(FS5 * 1.3), seed=2)

    conf = DllPllConf(
        fs=FS5, code_length_chips=L5.CODE_LENGTH_CHIPS,
        code_rate_cps=L5.CODE_RATE_CPS, carrier_freq_hz=L5.FREQ_HZ,
        early_late_spacing_chips=1.0,
        pll_bw_hz=25.0, dll_bw_hz=2.0,
        pll_bw_narrow_hz=7.5, dll_bw_narrow_hz=0.5,
        enable_fll_pull_in=True, pull_in_time_s=0.15,
        extend_correlation_symbols=20,
        track_pilot=True, sec_len_pilot=20, sec_len_data=10,
        data_on_quadrature=True,
        max_channels=2, steps_per_block=20,
    )
    tracker = Tracker(
        conf, gps_l5q_code_table(),
        data_code_table=gps_l5i_code_table(),
        sec_pilot_table=np.tile(nh20_levels(), (37, 1)),
        sec_data_levels=nh10_levels(),
    )
    sps_chip = FS5 / L5.CODE_RATE_CPS
    tracker.start_channel(
        ch=0, prn=3, code_row=2,
        acq_delay_samples=delay_chips * sps_chip,
        acq_doppler_hz=true_dop - 150.0,
        acq_samplestamp=0, current_abs_sample=0,
    )
    results = _run_tracking(conf, x, tracker, 62)
    events = [e for r in results for e in r.events]
    assert (0, "secondary_sync") in events
    assert tracker.ctl[0].sec_locked
    assert bool(np.asarray(tracker.state.use_atan2)[0])
    assert bool(np.asarray(tracker.state.sec_active)[0])

    # extended coherent integration spans 20 code periods (> 1 data symbol)
    spc = conf.samples_per_code
    long_accs = []
    for r in results[-10:]:
        b = r.outputs["boundary"][:, 0]
        long_accs.extend(r.outputs["acc_samples"][b, 0].tolist())
    assert long_accs and max(long_accs) > 19.5 * spc

    # doppler converged
    dops = np.concatenate(
        [r.outputs["carrier_doppler"][:, 0] for r in results])
    assert abs(np.mean(dops[-300:]) - true_dop) < 3.0

    # data symbols recovered on the quadrature axis, matching truth
    # (graded after the narrow-loop engage transient rings out, ~0.4 s for
    # a 7.5 Hz 3rd-order loop; early symbols are CRC-rejected in a real
    # telemetry chain)
    code_rate_eff = L5.CODE_RATE_CPS * (1.0 + true_dop / L5.FREQ_HZ)
    got, truth = [], []
    for r in results:
        db = r.outputs["data_boundary"][:, 0]
        full = db & (r.outputs["data_count"][:, 0] == conf.sec_len_data)
        for s_i in np.nonzero(full)[0]:
            stamp = float(r.abs_sample_end[s_i, 0])
            if stamp / FS5 < 0.7:
                continue
            v = r.outputs["data_prompt"][s_i, 0]
            mid = (stamp - 5 * spc) / FS5 * code_rate_eff - delay_chips
            period = int(np.floor(mid / L5.CODE_LENGTH_CHIPS))
            truth.append(nav[(period // 10) % len(nav)])
            got.append(np.sign(v.imag))
    assert len(got) > 30
    agree = np.mean(np.asarray(got) == np.asarray(truth))
    assert agree == 1.0 or agree == 0.0, agree


def test_tow_aided_tracking_projection():
    """telemetry_to_trk analog: async TOW projects to the current sample
    (reference dll_pll_veml_tracking.cc:757,1921-1937)."""
    conf = _make_conf()
    tracker = Tracker(conf, gps_l1_ca_code_table())
    rng = np.random.default_rng(4)
    n = int(FS * 0.5)
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(
        np.complex64) * np.sqrt(0.5)
    tracker.start_channel(
        ch=0, prn=7, code_row=6,
        acq_delay_samples=50.0, acq_doppler_hz=0.0,
        acq_samplestamp=0, current_abs_sample=0,
    )
    # decoder reports TOW 7314.0 s at sample stamp 0
    tracker.set_tow_from_telemetry(0, 7314000.0, 2345, 0)
    results = _run_tracking(conf, x, tracker, 3)
    assert results
    ctl = tracker.ctl[0]
    expected = 7314000.0 + tracker.pos_abs[0] * 1000.0 / FS
    assert ctl.tow_from_telemetry_ms == pytest.approx(expected, abs=1e-6)
    assert ctl.wn_from_telemetry == 2345

    # week rollover: TOW near end of week wraps and increments WN
    tracker.set_tow_from_telemetry(0, 604799990.0, 2345, 0)
    _run_tracking(conf, x[int(tracker.pos_abs[0]):], tracker, 0)
    tracker._project_tow(0)
    assert tracker.ctl[0].tow_from_telemetry_ms < 604799990.0
    assert tracker.ctl[0].wn_from_telemetry == 2346


def test_telemetry_fault_forces_loss_of_lock():
    """tlm_event == 1 forces loss-of-lock (reference
    msg_handler_telemetry_to_trk, carrier_lock_fail_counter = 200000)."""
    conf = _make_conf()
    tracker = Tracker(conf, gps_l1_ca_code_table())
    rng = np.random.default_rng(5)
    n = int(FS * 0.3)
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(
        np.complex64) * np.sqrt(0.5)
    tracker.start_channel(
        ch=1, prn=3, code_row=2,
        acq_delay_samples=10.0, acq_doppler_hz=0.0,
        acq_samplestamp=0, current_abs_sample=0,
    )
    tracker.notify_telemetry_fault(1)
    results = _run_tracking(conf, x, tracker, 2)
    events = [e for r in results for e in r.events]
    assert (1, "loss_of_lock") in events
    assert tracker.ctl[1].phase == ChannelPhase.LOST
