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

    def _run(self, x0, P0, prompts, amps):
        """x0: [C,3], P0: [C,3,3], prompts: [T,C,2], amps: [T,C]."""
        F = jnp.array([[1.0, 1.0, 0.5],
                       [0.0, 1.0, 1.0],
                       [0.0, 0.0, 1.0]])                # per-period units
        Q = jnp.asarray(self.Q)
        R = jnp.asarray(self.R)

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

    def run(self, prompts: np.ndarray, x0: np.ndarray | None = None,
            P0: np.ndarray | None = None):
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
                             jnp.asarray(z), jnp.asarray(amp_s))
        return np.asarray(xs)
