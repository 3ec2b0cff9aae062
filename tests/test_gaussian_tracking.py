"""Gaussian carrier tracking: cubature/unscented transforms and the
batched CKF/UKF phase/frequency tracker on prompt I/Q streams
(reference nonlinear_tracking.cc + gps_l1_ca_gaussian_tracking_cc).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gnss_sdr_tpu.tracking.gaussian import (
    GaussianCarrierTracker,
    cubature_points,
    gauss_update,
    unscented_points,
)


def test_cubature_points_moments():
    mean = jnp.array([[1.0, -2.0, 0.5]])
    cov = jnp.array([np.diag([0.04, 0.01, 0.09])])
    pts, w = cubature_points(mean, cov)
    assert pts.shape == (1, 6, 3)
    m = np.einsum("k,ckn->cn", w, pts)
    assert np.allclose(m, mean, atol=1e-6)
    d = pts - m[:, None, :]
    c = np.einsum("k,ckn,ckm->cnm", w, d, d)
    assert np.allclose(c, cov, atol=1e-6)


def test_unscented_points_moments():
    mean = jnp.array([[0.3, 1.7]])
    cov = jnp.array([[[0.25, 0.1], [0.1, 0.5]]])
    pts, (wm, wc) = unscented_points(mean, cov)
    assert pts.shape == (1, 5, 2)
    m = np.einsum("k,ckn->cn", wm, pts)
    assert np.allclose(m, mean, atol=1e-6)


def test_gauss_update_linear_case_matches_kalman():
    # with a linear h, the cubature update reduces to the Kalman update
    mean = jnp.array([[2.0, -1.0]])
    cov = jnp.array([[[1.0, 0.2], [0.2, 0.5]]])
    H = np.array([[1.0, 0.0]])
    R = jnp.array([[0.1]], jnp.float32)
    z = jnp.array([[2.7]])
    pts, w = cubature_points(mean, cov)
    mu, P = gauss_update(pts, w, w, z, lambda p: p[..., :1], R)
    # classic KF
    Pn = np.array(cov[0])
    S = H @ Pn @ H.T + 0.1
    K = Pn @ H.T / S
    mu_kf = np.array(mean[0]) + (K * (2.7 - 2.0)).ravel()
    P_kf = Pn - K @ H @ Pn
    assert np.allclose(mu[0], mu_kf, atol=1e-5)
    assert np.allclose(P[0], P_kf, atol=1e-5)


@pytest.mark.parametrize("kind", ["cubature", "unscented"])
def test_carrier_tracker_follows_phase_ramp(kind):
    # 2 channels: constant freq offset + accelerating phase, BPSK data
    # flips, noisy prompts
    rng = np.random.default_rng(5)
    T, C = 600, 2
    t = np.arange(T)
    om = np.array([0.03, -0.02])          # rad/period
    al = np.array([0.0, 5e-5])
    phi = om[None, :] * t[:, None] + 0.5 * al[None, :] * (t[:, None] ** 2)
    bits = np.sign(rng.normal(size=(T, C)))
    amp = 8.0
    prompts = (amp * bits * np.exp(1j * phi)
               + (rng.normal(size=(T, C)) + 1j * rng.normal(size=(T, C)))
               * 0.7)
    trk = GaussianCarrierTracker(C, kind=kind, meas_std=1.0,
                                 q_omega=1e-6, q_alpha=1e-8)
    # acquisition-grade handoff: omega known to ~0.01 rad/period
    x0 = np.zeros((C, 3))
    x0[:, 1] = om + 0.01
    P0 = np.tile(np.diag([1.0, 1e-3, 1e-6]), (C, 1, 1))
    xs = trk.run(prompts, x0=x0, P0=P0)
    om_end = xs[-1, :, 1]
    om_true_end = om + al * T
    err = np.abs(om_end - om_true_end)
    assert np.all(err < 5e-3), (om_end, om_true_end)
    # phase tracks modulo pi (Costas bit-sign ambiguity)
    dphi = (xs[-1, :, 0] - phi[-1]) % np.pi
    dphi = np.minimum(dphi, np.pi - dphi)
    assert np.all(dphi < 0.2), dphi


def test_gaussian_loop_closer_pulls_in_frequency():
    """The block-cadence CKF loop closer (the live-receiver integration of
    GPS_L1_CA_Gaussian_Tracking) pulls a Doppler handoff error in while the
    internal PLL is near-dead — only the filter's commands move the NCO."""
    from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
    from gnss_sdr_tpu.constants import gps_l1_ca as G
    from gnss_sdr_tpu.simulate import SatelliteSignalParams, generate_baseband
    from gnss_sdr_tpu.tracking import DllPllConf, Tracker
    from gnss_sdr_tpu.tracking.gaussian import GaussianLoopCloser

    fs = 2.6e6
    sps = fs / G.CODE_RATE_CPS
    true_dop = 820.0
    sat = SatelliteSignalParams(prn=7, cn0_dbhz=48.0, doppler_hz=true_dop,
                                delay_chips=80.0)
    x = generate_baseband([sat], fs, int(fs * 1.2), seed=11)

    conf = DllPllConf(
        fs=fs, code_length_chips=G.CODE_LENGTH_CHIPS,
        code_rate_cps=G.CODE_RATE_CPS, carrier_freq_hz=G.FREQ_HZ,
        pll_bw_hz=1e-4, dll_bw_hz=1e-5, enable_fll_pull_in=False,
        pll_bw_narrow_hz=1e-4, dll_bw_narrow_hz=1e-5,
        max_channels=2, steps_per_block=20,
    )
    tracker = Tracker(conf, gps_l1_ca_code_table())
    tracker.start_channel(ch=0, prn=7, code_row=6,
                          acq_delay_samples=80.0 * sps,
                          acq_doppler_hz=true_dop - 5.0,
                          acq_samplestamp=0, current_abs_sample=0)
    closer = GaussianLoopCloser(2, conf.code_period_s, s_transient=0,
                                meas_std=1.0)

    dops = []
    while True:
        base, w = tracker.window_request()
        if base + w > len(x):
            break
        r = tracker.process(x[base:base + w], base)
        closer.after_block(tracker, r)
        dops.append(float(r.outputs["carrier_doppler"][-1, 0]))

    # the filter pulled the 5 Hz handoff error in (steady-state mean;
    # individual block commands jitter ~1-2 Hz around the truth)
    steady = float(np.mean(dops[-10:]))
    assert abs(steady - true_dop) < 2.0, steady
    # and it was really the filter: the dead internal loops alone would
    # have left the initial offset
    assert abs(dops[0] - steady) > 2.0
