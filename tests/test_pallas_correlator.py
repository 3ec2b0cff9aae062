"""Pallas fused correlator (ops/correlator.py): interpret-mode equivalence
against the XLA correlation math, and the track_block pallas path against
the XLA path. On CPU the kernel runs through the Pallas interpreter, so
these tests exercise the exact code the TPU compiles.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnss_sdr_tpu.ops.correlator import make_correlator, pack_code_table


def test_kernel_matches_reference_math():
    rng = np.random.default_rng(0)
    C, N, L, T = 4, 2544, 1023, 3
    offs = np.array([-0.25, 0.0, 0.25], np.float32)
    codes = rng.choice([-1.0, 1.0], (C, L)).astype(np.float32)
    corr_fn = make_correlator(N, L, T, offs, interpret=True)
    NPAD = corr_fn.npad
    x = (rng.normal(size=(C, NPAD))
         + 1j * rng.normal(size=(C, NPAD))).astype(np.complex64)
    rem = rng.uniform(0, 1023, C).astype(np.float32)
    step = np.full(C, 0.39346, np.float32)
    phase0 = rng.uniform(0, 6.28, C).astype(np.float32)
    ph_step = rng.uniform(-0.01, 0.01, C).astype(np.float32)
    n_valid = np.full(C, 2542, np.float32)
    sc = np.zeros((C, 8), np.float32)
    sc[:, 0], sc[:, 1], sc[:, 2], sc[:, 3], sc[:, 4] = (
        rem, step, phase0, ph_step, n_valid)
    cq = jnp.asarray(pack_code_table(codes))
    out = np.asarray(corr_fn(jnp.asarray(x.real), jnp.asarray(x.imag),
                             cq, cq, jnp.asarray(sc)))

    k = np.arange(NPAD, dtype=np.float32)
    mask = (k[None, :] < n_valid[:, None]).astype(np.float32)
    ph = phase0[:, None] + ph_step[:, None] * k[None, :]
    xw = x * (np.cos(ph) - 1j * np.sin(ph)) * mask
    cph = rem[:, None] + step[:, None] * k[None, :]
    for t in range(T):
        tap = cph + offs[t]
        fl = np.floor(tap)
        idx = fl.astype(np.int64) % L
        c0 = np.take_along_axis(codes, idx, 1)
        cm = np.take_along_axis(codes, (idx - 1) % L, 1)
        cp = np.take_along_axis(codes, (idx + 1) % L, 1)
        frac = tap - fl
        ri = np.clip(frac / step[:, None] + 0.5, 0, 1)
        ro = np.clip((frac - 1) / step[:, None] + 0.5, 0, 1)
        ref = np.sum(xw * (cm + (c0 - cm) * ri + (cp - c0) * ro), axis=1)
        got = out[:, 0, 2 * t] + 1j * out[:, 0, 2 * t + 1]
        err = np.abs(got - ref) / np.maximum(np.abs(ref), 1.0)
        assert err.max() < 2e-3, (t, err.max())


def test_track_block_pallas_path_matches_xla():
    from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
    from gnss_sdr_tpu.constants import gps_l1_ca as G
    from gnss_sdr_tpu.simulate import SatelliteSignalParams, generate_baseband
    from gnss_sdr_tpu.tracking import DllPllConf, Tracker

    FS = 2.6e6
    sat = SatelliteSignalParams(prn=7, cn0_dbhz=47.0, doppler_hz=820.0,
                                delay_chips=250.0)
    x = generate_baseband([sat], FS, int(FS * 0.15), seed=5)
    outs = {}
    for pallas in (False, True):
        conf = DllPllConf(
            fs=FS, code_length_chips=G.CODE_LENGTH_CHIPS,
            code_rate_cps=G.CODE_RATE_CPS, carrier_freq_hz=G.FREQ_HZ,
            max_channels=2, steps_per_block=10,
            pallas_correlator=pallas)
        tr = Tracker(conf, gps_l1_ca_code_table())
        tr.start_channel(ch=0, prn=7, code_row=6,
                         acq_delay_samples=250.0 * FS / G.CODE_RATE_CPS,
                         acq_doppler_hz=700.0,
                         acq_samplestamp=0, current_abs_sample=0)
        dops, prompts = [], []
        for _ in range(10):
            base, w = tr.window_request()
            if base + w > len(x):
                break
            r = tr.process(x[base:base + w], base)
            dops.append(r.outputs["carrier_doppler"][:, 0])
            prompts.append(r.outputs["prompt"][:, 0])
        outs[pallas] = (np.concatenate(dops), np.concatenate(prompts))
    d_x, p_x = outs[False]
    d_p, p_p = outs[True]
    # trajectories agree to float32 correlation tolerance
    assert np.max(np.abs(d_x - d_p)) < 0.05, np.max(np.abs(d_x - d_p))
    rel = (np.abs(p_x - p_p) / np.maximum(np.abs(p_x), 1.0)).max()
    assert rel < 1e-2, rel
