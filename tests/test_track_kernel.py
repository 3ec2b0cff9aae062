"""Fused multi-period tracking kernel (ops/track_kernel.py) vs the XLA
track_block reference path.

The fused kernel runs the whole DLL/PLL loop on-chip in f32; the XLA path
carries f64 NCO state. Closed tracking loops amplify fp differences
chaotically, so equivalence is asserted as: bit-level agreement on the
first period (identical correlation math), then trajectory-level
agreement (both stay locked on the same signal: doppler within a few Hz,
period lengths within 1 sample) over a 50-period run.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
from gnss_sdr_tpu.ops.track_kernel import (
    fused_scalars_from_state,
    make_fused_tracker,
    pack_code_table_ext,
)
from gnss_sdr_tpu.ops.correlator import pack_code_table
from gnss_sdr_tpu.tracking.conf import DllPllConf
from gnss_sdr_tpu.tracking.dll_pll import (
    init_state,
    tap_offsets_chips,
    track_block,
)
from gnss_sdr_tpu.utils.cplx import dev_combine, host_to_ri

FS = 2.6e6
C = 4
K = 50
DOPS = [1200.0, -2500.0, 400.0, 3100.0]
PHS0 = [100.2, 301.7, 55.9, 770.3]
REMS = [0.21, 0.52, 0.83, 0.37]


@pytest.fixture(scope="module")
def setup():
    conf = DllPllConf(
        fs=FS, code_length_chips=1023, code_rate_cps=1.023e6,
        carrier_freq_hz=1575.42e6, max_channels=C, steps_per_block=K,
        pallas_correlator=False,
    )
    codes_tbl = gps_l1_ca_code_table()[:C].astype(np.float32)
    rng = np.random.default_rng(1)
    n_win = conf.window_samples
    tt = np.arange(n_win) / FS
    sig = np.zeros(n_win, np.complex64)
    for c in range(C):
        code = codes_tbl[c]
        cph = (1.023e6 * (1 + DOPS[c] / 1575.42e6)) * tt \
            - PHS0[c] * 0.3934615384
        chips = code[np.floor(cph).astype(np.int64) % 1023]
        sig += 0.5 * chips * np.exp(2j * np.pi * DOPS[c] * tt + 0.3j * c)
    sig = (sig + (rng.normal(size=n_win)
                  + 1j * rng.normal(size=n_win)) * 0.05).astype(np.complex64)

    s0 = jax.jit(lambda: init_state(conf))()
    s0 = s0._replace(
        enabled=jnp.ones((C,), bool),
        rem_code_phase=jnp.asarray(np.array(REMS)).astype(
            s0.rem_code_phase.dtype),
        carrier_doppler=jnp.asarray(np.array(DOPS, np.float32) + 20.0),
        pos=jnp.asarray(np.round(PHS0)).astype(s0.pos.dtype),
    )
    # XLA reference trajectory
    new_state, outs = jax.jit(
        lambda st, w, c: track_block(conf, st, dev_combine(w), c)
    )(s0, jnp.asarray(host_to_ri(sig)), jnp.asarray(codes_tbl))
    return conf, codes_tbl, sig, s0, outs


def _run_fused(conf, codes_tbl, sig, s0, replica):
    fused = make_fused_tracker(
        K, conf.max_step_samples, 1023, conf.num_taps,
        np.asarray(tap_offsets_chips(conf)), fs=FS,
        code_rate_cps=1.023e6, carrier_freq_hz=1575.42e6,
        pll_bw_hz=conf.pll_bw_hz, dll_bw_hz=conf.dll_bw_hz,
        pll_order=conf.pll_filter_order, dll_order=conf.dll_filter_order,
        interp_code=conf.interp_code, replica=replica, interpret=True,
    )
    n_win = len(sig)
    npadw = ((n_win + 127) // 128) * 128
    wr = np.zeros(npadw, np.float32)
    wi = np.zeros(npadw, np.float32)
    wr[:n_win] = sig.real
    wi[:n_win] = sig.imag
    pack = pack_code_table_ext if replica == "window2" else pack_code_table
    return np.asarray(fused(
        jnp.asarray(wr.reshape(-1, 128)), jnp.asarray(wi.reshape(-1, 128)),
        jnp.asarray(pack(codes_tbl)),
        jnp.asarray(np.asarray(fused_scalars_from_state(s0, conf),
                               np.float32)),
    ))


@pytest.mark.parametrize("replica", ["qloop", "window2"])
def test_fused_matches_track_block(setup, replica):
    conf, codes_tbl, sig, s0, outs = setup
    out = _run_fused(conf, codes_tbl, sig, s0, replica)

    prompt_x = np.asarray(outs.prompt)            # [K, C]
    taps_x = np.asarray(outs.taps)                # [K, C, T]
    dop_x = np.asarray(outs.carrier_doppler)
    n_x = np.asarray(outs.n_samples)

    p_f = out[:, :, 2] + 1j * out[:, :, 3]        # prompt = tap 1 of 3
    dop_f = out[:, :, 11]
    n_f = out[:, :, 10]

    for c in range(C):
        # period 0: identical correlation math, f32-exact agreement
        for t in range(3):
            ref = taps_x[0, c, t]
            got = out[c, 0, 2 * t] + 1j * out[c, 0, 2 * t + 1]
            assert abs(got - ref) < 1e-3 * (abs(ref) + 1.0)
        # trajectory: same lock (f32 vs f64 loops diverge chaotically but
        # must track the same signal)
        assert abs(dop_x[-1, c] - dop_f[c, -1]) < 3.0
        assert np.abs(n_x[:, c] - n_f[c]).max() <= 2
        rel = np.abs(prompt_x[:, c] - p_f[c]) / (np.abs(prompt_x[:, c]) + 1e-9)
        assert np.median(rel) < 0.2


def test_launch_boundary_state_continuity(setup):
    """Two back-to-back launches (state re-packed from the last output row,
    nonzero loop-filter integrators at the seam) must reproduce one long
    launch bit-for-bit: the scalar-block layout round-trips every carry
    (guards the ADVICE r4 init-misalignment bug that fed the enabled flag
    into dll_i1)."""
    conf, codes_tbl, sig, s0, _ = setup
    n_win = len(sig)
    npadw = ((n_win + 127) // 128) * 128
    wr = np.zeros(npadw, np.float32)
    wi = np.zeros(npadw, np.float32)
    wr[:n_win] = sig.real
    wi[:n_win] = sig.imag
    wr = jnp.asarray(wr.reshape(-1, 128))
    wi = jnp.asarray(wi.reshape(-1, 128))
    codes_q = jnp.asarray(pack_code_table(codes_tbl))

    def mk(k):
        return make_fused_tracker(
            k, conf.max_step_samples, 1023, conf.num_taps,
            np.asarray(tap_offsets_chips(conf)), fs=FS,
            code_rate_cps=1.023e6, carrier_freq_hz=1575.42e6,
            pll_bw_hz=conf.pll_bw_hz, dll_bw_hz=conf.dll_bw_hz,
            pll_order=conf.pll_filter_order, dll_order=conf.dll_filter_order,
            interp_code=conf.interp_code, replica="qloop", interpret=True,
        )

    scal = np.array(fused_scalars_from_state(s0, conf), np.float32)
    # nonzero integrators at the seam so any slot swap shows up
    scal[:, 5] = [10.0, -20.0, 5.0, 40.0]    # pll_i1
    scal[:, 6] = [3.0, -1.5, 2.0, -4.0]      # dll_i1

    long = np.asarray(mk(2 * K)(wr, wi, codes_q, jnp.asarray(scal)))

    half = mk(K)
    a = np.asarray(half(wr, wi, codes_q, jnp.asarray(scal)))
    last = a[:, -1, :]
    scal2 = np.stack([
        last[:, 17], last[:, 13], last[:, 12], last[:, 14], last[:, 11],
        last[:, 15], last[:, 16], scal[:, 7], last[:, 18], last[:, 19],
    ], axis=1).astype(np.float32)
    b = np.asarray(half(wr, wi, codes_q, jnp.asarray(scal2)))

    two = np.concatenate([a, b], axis=1)
    np.testing.assert_allclose(two, long, rtol=1e-6, atol=1e-4)


def test_no_one_sample_period_glitch():
    """Period-length selection at integer crossings: when the true period
    length sits a hair above an integer sample count, an epsilon-guarded
    ceil picks one sample too few, the remnant wraps to ~L chips, and the
    next 'period' is one sample long — permanently slipping bit
    alignment (r5 regression: lost ~40% of LNAV subframes). The
    round+correct formulation must keep rem in [0, step) and n within
    one sample of nominal."""
    conf = DllPllConf(
        fs=FS, code_length_chips=1023, code_rate_cps=1.023e6,
        carrier_freq_hz=1575.42e6, max_channels=1, steps_per_block=10,
        pallas_correlator=False,
    )
    fused = make_fused_tracker(
        10, conf.max_step_samples, 1023, conf.num_taps,
        np.asarray(tap_offsets_chips(conf)), fs=FS,
        code_rate_cps=1.023e6, carrier_freq_hz=1575.42e6,
        pll_bw_hz=conf.pll_bw_hz, dll_bw_hz=conf.dll_bw_hz,
        pll_order=conf.pll_filter_order, dll_order=conf.dll_filter_order,
        interp_code=conf.interp_code, replica="qloop", interpret=True,
    )
    n_win = conf.window_samples
    npadw = ((n_win + 127) // 128 + 4) * 128
    wr = jnp.zeros((npadw // 128, 128), jnp.float32)
    codes_q = jnp.asarray(pack_code_table(
        gps_l1_ca_code_table()[:1].astype(np.float32)))
    # rem=0, dcode=-0.01 Hz: true n_f = 2600 + ~2.5e-5 — just above the
    # integer, inside the old epsilon-ceil's failure window
    scal = np.zeros((1, 10), np.float32)
    scal[0, 2] = -0.01
    scal[0, 7] = 1.0
    out = np.asarray(fused(wr, wr, codes_q, jnp.asarray(scal)))
    n = out[0, :, 10]
    rem = out[0, :, 13]
    assert np.all((n >= 2600) & (n <= 2601)), n
    assert np.all((rem >= 0.0) & (rem < 1.0)), rem


def test_window2_equals_qloop(setup):
    """The O(1)-in-code-length replica must reproduce the q-loop replica
    bit-for-bit (same gather results, same fp op order downstream)."""
    conf, codes_tbl, sig, s0, _ = setup
    a = _run_fused(conf, codes_tbl, sig, s0, "qloop")
    b = _run_fused(conf, codes_tbl, sig, s0, "window2")
    np.testing.assert_allclose(a[:, :, :8], b[:, :, :8], rtol=1e-6, atol=1e-3)
    np.testing.assert_allclose(a[:, :, 10], b[:, :, 10], atol=0)   # n exact
