"""Full-semantics fused tracking engine (tracking/fused.py) vs the XLA
scan path, inside the live Tracker.

The fused kernel runs the whole K-period DLL/PLL loop in one Mosaic
launch with f32 NCO state; the XLA path carries f64. Over a few tens of
periods the trajectories agree to f32 tolerance; closed-loop feedback
amplifies the residual slowly, so the asserts are tight-but-not-bitwise.

Covers the modes VERDICT r4 flagged as fallback-only: extended coherent
integration (integ_len > 1, boundary-gated loop updates) and
pilot/secondary tracking (dual code tables, secondary wipeoff, atan2
PLL, data-component prompt), plus FLL-assisted pull-in.
Reference analog: dll_pll_veml_tracking.cc states 2-4 (:1898-2260).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
from gnss_sdr_tpu.tracking.conf import DllPllConf
from gnss_sdr_tpu.tracking.tracker import ChannelPhase, Tracker

FS = 2.6e6
C = 2
DOPS = [1200.0, -2500.0]


def _make_signal(tbl, n, nav_bits=False, seed=1):
    rng = np.random.default_rng(seed)
    tt = np.arange(n) / FS
    sig = np.zeros(n, np.complex64)
    for c in range(C):
        cph = (1.023e6 * (1 + DOPS[c] / 1575.42e6)) * tt
        chips = tbl[c][np.floor(cph).astype(np.int64) % 1023]
        signs = 1.0
        if nav_bits:
            bit_idx = np.floor(cph / (1023 * 20)).astype(np.int64)
            signs = np.where((bit_idx * 0x9E3779B9) % 7 < 4, 1.0, -1.0)
        sig += 0.5 * chips * signs * np.exp(
            2j * np.pi * DOPS[c] * tt + 0.3j * c)
    sig = sig + (rng.normal(size=n) + 1j * rng.normal(size=n)) * 0.05
    return sig.astype(np.complex64)


def _conf(fused, **kw):
    return DllPllConf(
        fs=FS, code_length_chips=1023, code_rate_cps=1.023e6,
        carrier_freq_hz=1575.42e6, max_channels=C, steps_per_block=30,
        pallas_correlator=False, fused_tracker=fused, **kw)


def _pair(sig, blocks=2, trk_mut=None, **kw):
    """Run the same stream through both engines; return per-engine results."""
    tbl = gps_l1_ca_code_table()[:C].astype(np.float32)
    out = {}
    for fused in (False, True):
        conf = _conf(fused, **kw)
        trk = Tracker(conf, tbl)
        for ch in range(C):
            trk.start_channel(ch, prn=ch + 1, code_row=ch,
                              acq_delay_samples=0.0,
                              acq_doppler_hz=DOPS[ch] + 30.0,
                              acq_samplestamp=0, current_abs_sample=0)
        if trk_mut is not None:
            trk_mut(trk)
        results = [trk.process(sig, 0) for _ in range(blocks)]
        out[fused] = (results, trk)
    return out


def _assert_match(a, b, prompt_tol=5e-3, dop_tol=0.1):
    np.testing.assert_array_equal(a.outputs["n_samples"], b.outputs["n_samples"])
    np.testing.assert_array_equal(a.outputs["pos_end"], b.outputs["pos_end"])
    np.testing.assert_array_equal(a.outputs["boundary"], b.outputs["boundary"])
    assert np.abs(a.outputs["carrier_doppler"]
                  - b.outputs["carrier_doppler"]).max() < dop_tol
    pa, pb = a.outputs["prompt"], b.outputs["prompt"]
    assert np.median(np.abs(pa - pb) / (np.abs(pa) + 1e-9)) < prompt_tol
    assert np.abs(a.outputs["carrier_phase"]
                  - b.outputs["carrier_phase"]).max() < 1e-3
    assert np.abs(a.outputs["rem_code_phase"]
                  - b.outputs["rem_code_phase"]).max() < 1e-3


def test_fused_matches_xla_wide():
    """WIDE phase, 1-period integration, order-3 PLL / order-2 DLL."""
    tbl = gps_l1_ca_code_table()[:C].astype(np.float32)
    sig = _make_signal(tbl, 200_000)
    out = _pair(sig, blocks=2)
    _assert_match(out[False][0][1], out[True][0][1])


def test_fused_matches_xla_fll_pull_in():
    """FLL-assisted pull-in: the frequency discriminator feeds the PLL
    integrator at boundaries while fll_active."""
    tbl = gps_l1_ca_code_table()[:C].astype(np.float32)
    sig = _make_signal(tbl, 200_000)
    out = _pair(sig, blocks=2, enable_fll_pull_in=True)
    for fused in (False, True):
        assert bool(np.asarray(out[fused][1].state.fll_active).all())
    _assert_match(out[False][0][1], out[True][0][1])


def test_fused_matches_xla_extended():
    """NARROW phase with 20-period coherent integration: accumulators
    carry across periods, loop updates fire on boundaries only."""
    tbl = gps_l1_ca_code_table()[:C].astype(np.float32)
    sig = _make_signal(tbl, 300_000, nav_bits=False)

    def engage(trk):
        s = trk.state
        trk.state = s._replace(
            narrow=s.narrow.at[:].set(True),
            integ_len=s.integ_len.at[:].set(20),
        )

    out = _pair(sig, blocks=3, trk_mut=engage,
                extend_correlation_symbols=20)
    a, b = out[False][0][2], out[True][0][2]
    _assert_match(a, b)
    np.testing.assert_array_equal(
        a.outputs["acc_samples"], b.outputs["acc_samples"])
    ba = a.outputs["boundary"]
    assert ba.sum() > 0                       # some boundaries in block 3
    pa = a.outputs["acc_prompt"][ba]
    pb = b.outputs["acc_prompt"][ba]
    assert np.median(np.abs(pa - pb) / (np.abs(pa) + 1e-9)) < 5e-3


def test_fused_matches_xla_pilot_secondary():
    """Pilot tracking: taps on the pilot code, data prompt on the data
    code, secondary wipeoff on both, atan2 PLL, 5-period integration."""
    sp, sdl = 25, 4
    rng = np.random.default_rng(7)
    sec_p_tbl = np.where(
        rng.integers(0, 2, size=(C, sp)) > 0, 1.0, -1.0).astype(np.float32)
    sec_d = np.where(
        rng.integers(0, 2, size=sdl) > 0, 1.0, -1.0).astype(np.float32)
    tbl = gps_l1_ca_code_table()[:C].astype(np.float32)
    dtbl = gps_l1_ca_code_table()[C:2 * C].astype(np.float32)

    # composite pilot+data signal with both secondaries
    n = 300_000
    tt = np.arange(n) / FS
    sig = np.zeros(n, np.complex64)
    for c in range(C):
        cph = (1.023e6 * (1 + DOPS[c] / 1575.42e6)) * tt
        ci = np.floor(cph).astype(np.int64)
        per = ci // 1023
        pil = tbl[c][ci % 1023] * sec_p_tbl[c][per % sp]
        dat = dtbl[c][ci % 1023] * sec_d[per % sdl]
        sig += 0.35 * (pil + dat) * np.exp(
            2j * np.pi * DOPS[c] * tt + 0.3j * c)
    rngn = np.random.default_rng(1)
    sig = (sig + (rngn.normal(size=n) + 1j * rngn.normal(size=n)) * 0.05
           ).astype(np.complex64)

    out = {}
    for fused in (False, True):
        conf = _conf(fused, track_pilot=True, sec_len_pilot=sp,
                     sec_len_data=sdl, extend_correlation_symbols=5)
        trk = Tracker(conf, tbl, data_code_table=dtbl,
                      sec_pilot_table=sec_p_tbl, sec_data_levels=sec_d)
        for ch in range(C):
            trk.start_channel(ch, prn=ch + 1, code_row=ch,
                              acq_delay_samples=0.0,
                              acq_doppler_hz=DOPS[ch] + 30.0,
                              acq_samplestamp=0, current_abs_sample=0)
        trk.process(sig, 0)                    # settle one block
        # engage the secondary as the host FSM would (phase known = 0
        # here: signal starts at period 0 = secondary chip 0)
        for ch in range(C):
            trk._engage_secondary(ch, p0=0, k0=0, polarity=1.0)
        r = [trk.process(sig, 0) for _ in range(2)]
        out[fused] = (r, trk)
        assert bool(np.asarray(trk.state.sec_active).all())
    a, b = out[False][0][1], out[True][0][1]
    _assert_match(a, b)
    np.testing.assert_array_equal(
        a.outputs["data_boundary"], b.outputs["data_boundary"])
    np.testing.assert_array_equal(
        a.outputs["data_count"], b.outputs["data_count"])
    da = a.outputs["data_prompt"][a.outputs["data_boundary"]]
    db = b.outputs["data_prompt"][b.outputs["data_boundary"]]
    assert np.median(np.abs(da - db) / (np.abs(da) + 1e-9)) < 5e-3
    # secondary-phase counters advanced identically
    np.testing.assert_array_equal(np.asarray(out[False][1].state.sec_idx),
                                  np.asarray(out[True][1].state.sec_idx))


def test_fused_matches_xla_fdma():
    """FDMA (GLONASS): per-channel MHz slot offsets enter the kernel as
    mod-2pi-reduced rad/sample steps; the XLA reference path carries the
    wipeoff phase in f64. Trajectories must agree to f32 tolerance."""
    from gnss_sdr_tpu.codes.glonass_ca import glonass_ca_code

    fs = 8.0e6
    code = np.tile(glonass_ca_code().astype(np.float32), (C, 1))
    offs = [562.5e3, -1125.0e3]
    n = 300_000
    tt = np.arange(n) / fs
    sig = np.zeros(n, np.complex64)
    for c in range(C):
        cph = (0.511e6 * (1 + DOPS[c] / 1.602e9)) * tt
        chips = code[c][np.floor(cph).astype(np.int64) % 511]
        sig += 0.5 * chips * np.exp(
            2j * np.pi * (DOPS[c] + offs[c]) * tt + 0.3j * c)
    rng = np.random.default_rng(5)
    sig = (sig + (rng.normal(size=n) + 1j * rng.normal(size=n)) * 0.05
           ).astype(np.complex64)

    out = {}
    for fused in (False, True):
        conf = DllPllConf(
            fs=fs, code_length_chips=511, code_rate_cps=0.511e6,
            carrier_freq_hz=1.602e9, max_channels=C, steps_per_block=15,
            fdma=True, pallas_correlator=False, fused_tracker=fused)
        trk = Tracker(conf, code)
        for ch in range(C):
            trk.start_channel(ch, prn=ch + 1, code_row=ch,
                              acq_delay_samples=0.0,
                              acq_doppler_hz=DOPS[ch] + 20.0,
                              acq_samplestamp=0, current_abs_sample=0,
                              carrier_offset_hz=offs[ch])
        r = [trk.process(sig, 0) for _ in range(2)]
        out[fused] = r
    a, b = out[False][1], out[True][1]
    np.testing.assert_array_equal(a.outputs["n_samples"],
                                  b.outputs["n_samples"])
    assert np.abs(a.outputs["carrier_doppler"]
                  - b.outputs["carrier_doppler"]).max() < 0.5
    pa, pb = a.outputs["prompt"], b.outputs["prompt"]
    assert np.median(np.abs(pa - pb) / (np.abs(pa) + 1e-9)) < 2e-2
    # accumulated phase includes the slot offset in both engines
    assert np.abs(a.outputs["carrier_phase"]
                  - b.outputs["carrier_phase"]).max() < 0.1


def test_fused_disabled_channels_hold_state():
    """Disabled channels must not advance position or loop state."""
    tbl = gps_l1_ca_code_table()[:C].astype(np.float32)
    sig = _make_signal(tbl, 200_000)
    conf = _conf(True)
    trk = Tracker(conf, tbl)
    trk.start_channel(0, prn=1, code_row=0, acq_delay_samples=0.0,
                      acq_doppler_hz=DOPS[0], acq_samplestamp=0,
                      current_abs_sample=0)
    st_before = {k: np.asarray(v) for k, v in
                 trk.state._asdict().items()}
    trk.process(sig, 0)
    st_after = trk.state
    # channel 1 never started: every leaf row 1 unchanged
    for name in ("pos", "rem_code_phase", "code_freq", "carrier_phase",
                 "carrier_doppler", "integ_count", "acc_samples",
                 "sec_idx"):
        assert np.asarray(getattr(st_after, name))[1] == pytest.approx(
            st_before[name][1]), name
    assert np.asarray(st_after.pos)[0] > 0
