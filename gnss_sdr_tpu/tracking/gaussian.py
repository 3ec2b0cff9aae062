"""Gaussian (nonlinear Bayesian) carrier tracking: batched cubature /
unscented Kalman filtering on prompt correlator outputs.

Reference analogs:
- src/algorithms/tracking/libs/nonlinear_tracking.{h,cc} — reusable
  CubatureFilter / UnscentedFilter classes (cubature point sets, sigma
  points, predict/update on arbitrary f/h);
- src/algorithms/tracking/gnuradio_blocks/gps_l1_ca_gaussian_tracking_cc
  + libs/bayesian_estimation.cc (GPS_L1_CA_Gaussian_Tracking) — a carrier
  loop whose phase/Doppler estimate comes from a Bayesian nonlinear
  filter on the prompt I/Q (measurement model z = A[cos phi, sin phi])
  with adaptively estimated measurement covariance, instead of a
  discriminator + loop filter.

Here both transforms are batched over channels (leading axis C) as pure
JAX functions; `GaussianCarrierTracker` runs the whole prompt sequence
through a `lax.scan` — one jitted program per (C, T) shape.

State per channel: x = [phi (rad), omega (rad/period), omega_dot].
Measurement per period: prompt [I, Q]; data-bit sign invariance is
handled by flipping the predicted measurement to the half-plane of the
observation (Costas-equivalent).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------- point sets
def cubature_points(mean: jnp.ndarray, cov: jnp.ndarray):
    """Third-degree spherical-radial cubature points (batched).

    mean: [C, n], cov: [C, n, n] -> points [C, 2n, n], weights [2n]
    (nonlinear_tracking.cc CubatureFilter point generation).
    """
    n = mean.shape[-1]
    s = jnp.linalg.cholesky(cov)                     # [C, n, n]
    unit = jnp.concatenate([jnp.eye(n), -jnp.eye(n)]) * jnp.sqrt(n)  # [2n, n]
    pts = mean[:, None, :] + jnp.einsum("cij,kj->cki", s, unit)
    w = jnp.full((2 * n,), 1.0 / (2 * n))
    return pts, w


def unscented_points(mean: jnp.ndarray, cov: jnp.ndarray,
                     alpha: float = 1e-2, beta: float = 2.0,
                     kappa: float = 0.0):
    """Scaled unscented sigma points (batched).

    mean: [C, n], cov: [C, n, n] -> points [C, 2n+1, n],
    (mean weights [2n+1], cov weights [2n+1])
    (nonlinear_tracking.cc UnscentedFilter).
    """
    n = mean.shape[-1]
    lam = alpha * alpha * (n + kappa) - n
    s = jnp.linalg.cholesky((n + lam) * cov)
    pts = jnp.concatenate([
        mean[:, None, :],
        mean[:, None, :] + jnp.swapaxes(s, -1, -2),
        mean[:, None, :] - jnp.swapaxes(s, -1, -2),
    ], axis=1)
    wm = jnp.concatenate([
        jnp.array([lam / (n + lam)]),
        jnp.full((2 * n,), 1.0 / (2 * (n + lam)))])
    wc = wm.at[0].add(1.0 - alpha * alpha + beta)
    return pts, (wm, wc)


def gauss_update(pts, wm, wc, z, h_fn, R):
    """Generic Gaussian measurement update from propagated points.

    pts: [C, K, n] sigma/cubature points; z: [C, m] measurements;
    h_fn: [C, K, n] -> [C, K, m]; R: [m, m]. Returns (mean, cov) posterior.
    """
    zs = h_fn(pts)                                   # [C, K, m]
    z_pred = jnp.einsum("k,ckm->cm", wm, zs)
    dz = zs - z_pred[:, None, :]
    dx = pts - jnp.einsum("k,ckn->cn", wm, pts)[:, None, :]
    S = jnp.einsum("k,ckm,ckl->cml", wc, dz, dz) + R
    Pxz = jnp.einsum("k,ckn,ckm->cnm", wc, dx, dz)
    K = jnp.linalg.solve(S.swapaxes(-1, -2), Pxz.swapaxes(-1, -2))
    K = K.swapaxes(-1, -2)                           # [C, n, m]
    mean = jnp.einsum("k,ckn->cn", wm, pts) + jnp.einsum(
        "cnm,cm->cn", K, z - z_pred)
    cov = (jnp.einsum("k,ckn,ckl->cnl", wc, dx, dx)
           - jnp.einsum("cnm,cml,ckl->cnk", K, S, K))
    return mean, cov


class GaussianCarrierTracker:
    """Batched CKF/UKF carrier phase/frequency tracker on prompt I/Q
    (gps_l1_ca_gaussian_tracking_cc analog)."""

    def __init__(self, num_channels: int, t_int_s: float = 1e-3,
                 kind: str = "cubature",
                 meas_std: float = 0.1,
                 q_phase: float = 1e-6, q_omega: float = 1e-4,
                 q_alpha: float = 1e-6) -> None:
        if kind not in ("cubature", "unscented"):
            raise ValueError(kind)
        self.kind = kind
        self.C = num_channels
        self.T = t_int_s
        self.R = np.eye(2) * meas_std**2
        self.Q = np.diag([q_phase, q_omega, q_alpha])
        self._jit = jax.jit(partial(self._run))

    def _run(self, x0, P0, prompts, amps, R):
        """x0: [C,3], P0: [C,3,3], prompts: [T,C,2], amps: [T,C],
        R: [2,2] or [C,2,2] measurement covariance."""
        F = jnp.array([[1.0, 1.0, 0.5],
                       [0.0, 1.0, 1.0],
                       [0.0, 0.0, 1.0]])                # per-period units
        Q = jnp.asarray(self.Q)

        def h_make(amp):
            def h(pts):                                 # [C,K,3] -> [C,K,2]
                phi = pts[..., 0]
                return amp[:, None, None] * jnp.stack(
                    [jnp.cos(phi), jnp.sin(phi)], axis=-1)
            return h

        def step(carry, inp):
            x, P = carry
            z, amp = inp
            # predict
            x = jnp.einsum("ij,cj->ci", F, x)
            P = jnp.einsum("ij,cjk,lk->cil", F, P, F) + Q
            # bit-sign invariance (Costas): flip z into the predicted
            # half-plane
            pred = jnp.stack([jnp.cos(x[:, 0]), jnp.sin(x[:, 0])], -1)
            sgn = jnp.sign(jnp.sum(pred * z, axis=-1, keepdims=True))
            zz = z * jnp.where(sgn == 0.0, 1.0, sgn)
            if self.kind == "cubature":
                pts, w = cubature_points(x, P)
                wm = wc = w
            else:
                pts, (wm, wc) = unscented_points(x, P)
            x, P = gauss_update(pts, wm, wc, zz, h_make(amp), R)
            # keep covariance symmetric (numerical)
            P = 0.5 * (P + P.swapaxes(-1, -2))
            return (x, P), x

        (xf, Pf), xs = jax.lax.scan(step, (x0, P0), (prompts, amps))
        return xf, Pf, xs

    def _R_arg(self, R):
        return jnp.asarray(self.R if R is None else R)

    def run(self, prompts: np.ndarray, x0: np.ndarray | None = None,
            P0: np.ndarray | None = None, R: np.ndarray | None = None):
        """prompts: [T, C] complex prompt stream (one per integration
        period). Returns per-step states [T, C, 3]
        ([phi rad, omega rad/period, alpha rad/period^2])."""
        prompts = np.asarray(prompts)
        T, C = prompts.shape
        z = np.stack([prompts.real, prompts.imag], -1).astype(np.float64)
        amp = np.abs(prompts).astype(np.float64)
        # smooth amplitude estimate (bayesian_estimation.cc adaptively
        # estimates the measurement scale)
        k = min(20, T)
        kern = np.ones(k) / k
        amp_s = np.apply_along_axis(
            lambda a: np.convolve(a, kern, mode="same"), 0, amp)
        if x0 is None:
            x0 = np.zeros((C, 3))
        if P0 is None:
            P0 = np.tile(np.diag([1.0, 0.5, 1e-4]), (C, 1, 1))
        _, _, xs = self._jit(jnp.asarray(x0), jnp.asarray(P0),
                             jnp.asarray(z), jnp.asarray(amp_s),
                             self._R_arg(R))
        return np.asarray(xs)

    def run_carry(self, prompts: np.ndarray, x0: np.ndarray,
                  P0: np.ndarray, R: np.ndarray | None = None):
        """Like run(), but returns (xs, x_final, P_final) so the filter
        state carries across tracking blocks."""
        prompts = np.asarray(prompts)
        T, _ = prompts.shape
        z = np.stack([prompts.real, prompts.imag], -1).astype(np.float64)
        amp = np.abs(prompts).astype(np.float64)
        k = min(20, T)
        kern = np.ones(k) / k
        amp_s = np.apply_along_axis(
            lambda a: np.convolve(a, kern, mode="same"), 0, amp)
        xf, Pf, xs = self._jit(jnp.asarray(x0), jnp.asarray(P0),
                               jnp.asarray(z), jnp.asarray(amp_s),
                               self._R_arg(R))
        return np.asarray(xs), np.asarray(xf), np.asarray(Pf)


class GaussianLoopCloser:
    """Closes the carrier loop at tracking-block cadence with the CKF/UKF
    (the live-receiver integration of GPS_L1_CA_Gaussian_Tracking,
    reference gps_l1_ca_gaussian_tracking_cc.cc: after `s_transient`
    periods the Bayesian filter owns the carrier estimate).

    The batched tracker runs with a near-dead internal PLL; after every
    block the filter consumes the block's per-period prompts (post-wipeoff
    residuals), and its frequency estimate is written to the device NCO —
    the same eager per-channel state writes the host FSM uses. Once a
    frequency command lands, the residual frequency restarts near zero, so
    the filter's omega state is re-zeroed after each command.
    """

    def __init__(self, num_channels: int, code_period_s: float,
                 kind: str = "cubature", meas_std: float = 0.5,
                 s_transient: int = 0, gain: float = 0.3,
                 max_cmd_hz: float = 2.0) -> None:
        self.trk = GaussianCarrierTracker(
            num_channels, t_int_s=code_period_s, kind=kind,
            meas_std=meas_std)
        self.C = num_channels
        self.Tp = code_period_s
        self.s_transient = int(s_transient)
        self.gain = float(gain)
        self.max_cmd_hz = float(max_cmd_hz)
        self._seen = np.zeros(num_channels, np.int64)
        self._om_hist = [[] for _ in range(num_channels)]
        self.x = np.zeros((num_channels, 3))
        self.P = np.tile(np.diag([1.0, 0.5, 1e-4]), (num_channels, 1, 1))

    def after_block(self, tracker, result) -> None:
        out = result.outputs
        prompts = np.asarray(out["prompt"])            # [S, C]
        S = prompts.shape[0]
        act = [ch for ch in tracker.active_channels()]
        if not act:
            return
        # fresh channels: seed phi/omega from this block's prompts (the
        # CKF's Costas half-plane flip cannot disambiguate the rotation
        # direction from a cold zero-omega prior). The squared-product
        # removes the BPSK sign: angle((p[k+1] conj(p[k]))^2)/2.
        fresh = [ch for ch in act if self._seen[ch] == 0]
        for ch in fresh:
            p = prompts[:, ch]
            if len(p) >= 3:
                d = (p[1:] * np.conj(p[:-1])) ** 2
                self.x[ch, 0] = float(np.angle(p[-1]))
                self.x[ch, 1] = 0.5 * float(np.angle(np.sum(d)))
                self.x[ch, 2] = 0.0
                self.P[ch] = np.diag([1.0, 1e-3, 1e-6])
            self._seen[ch] = S
        run_chs = [ch for ch in act if ch not in fresh]
        if run_chs:
            # adaptive measurement covariance (reference
            # bayesian_estimation.cc): per-channel noise variance from the
            # block's amplitude jitter (|p| fluctuation ~ per-quadrature
            # noise at tracking SNR)
            amp = np.abs(prompts)
            s2 = np.maximum(np.var(amp, axis=0), 1e-6)      # [C]
            R = (np.eye(2)[None, :, :]
                 * s2[:, None, None]).astype(np.float64)    # [C,2,2]
            _, xf, Pf = self.trk.run_carry(prompts, self.x, self.P, R=R)
            xf = np.array(xf)                          # writable host copy
            Pf = np.array(Pf)
            # Costas bit-sign invariance aliases omega by multiples of
            # pi rad/period; fold the estimate into the unambiguous
            # (-pi/2, pi/2] band (the filter can silently converge to
            # the pi-alias of a small residual)
            xf[:, 1] = np.mod(xf[:, 1] + np.pi / 2, np.pi) - np.pi / 2
            state = tracker.state
            ctl = getattr(tracker, "ctl", None)
            for ch in run_chs:
                self._seen[ch] += S
                self.x[ch], self.P[ch] = xf[ch], Pf[ch]
                if self._seen[ch] <= self.s_transient:
                    continue
                # The filter COMMANDS the NCO only where it owns the loop:
                # channels whose configured PLL is dead (<1 mHz — the
                # external-closure configuration). Against a live PLL the
                # block-cadence commands fight the per-period loop (two
                # controllers, one plant), so there the filter observes
                # only — its state remains available for monitoring/dump.
                conf = tracker.conf
                narrow = ctl is not None and int(ctl[ch].phase) == 2
                eff_bw = (getattr(conf, "pll_bw_narrow_hz", 0.0) if narrow
                          else getattr(conf, "pll_bw_hz", 0.0))
                if eff_bw > 1e-3:
                    continue
                # persistence-gated commanding: a genuine residual offset
                # (dead/weak loop, handoff error) produces consistent-sign
                # omega estimates block after block, while noise flips
                # sign. Command the running mean only once 3 consecutive
                # blocks agree in sign.
                h = self._om_hist[ch]
                h.append(float(xf[ch, 1]))
                if len(h) > 3:
                    del h[0]
                if len(h) < 3 or not (all(v > 0 for v in h)
                                      or all(v < 0 for v in h)):
                    continue
                xf[ch, 1] = float(np.mean(h))
                h.clear()
                # omega is rad/period of residual carrier after wipeoff.
                # The command must land in the PLL's first integrator:
                # pll_state[:,0] carries the absolute Doppler and rewrites
                # carrier_doppler at every integration boundary
                # (loop_filter_step order>=2; loop_filter_set_state).
                corr = np.float32(np.clip(
                    self.gain * xf[ch, 1] / (2.0 * np.pi * self.Tp),
                    -self.max_cmd_hz, self.max_cmd_hz))
                state = state._replace(
                    carrier_doppler=state.carrier_doppler.at[ch].add(corr),
                    pll_state=state.pll_state.at[ch, 0].add(corr))
                self.x[ch, 1] = 0.0
            tracker.state = state

    def reset_channel(self, ch: int) -> None:
        self._seen[ch] = 0
        self._om_hist[ch].clear()
        self.x[ch] = 0.0
        self.P[ch] = np.diag([1.0, 0.5, 1e-4])
